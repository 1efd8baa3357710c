"""Probe 25: decompose the strip-stencil SpMV cost (heat M=1024).

probe24 (strips): stencil_xla 0.084 ms, stencil_pallas 0.095 ms vs the
~21 µs the ~2n traffic should cost.  Variants measured here:
  a) pure const pallas kernel (no strips)        — kernel efficiency
  b) pure const XLA roll chain (no strips)       — x re-read behaviour
  c) strips via chained dynamic_update_slice     — the shipped epilogue
  d) strips via pad-and-add fusion               — single fused pass
  e) strips only (DUS epilogue on precomputed y) — epilogue cost isolated
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import (
        stencil_spmv_pallas,
    )
    from structurepreservingiterativesolvers_tpu.ops.sparse import _shift
    from structurepreservingiterativesolvers_tpu.ops.stencil import (
        _apply_strips,
        _shift_small,
        _window,
    )

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    s = heat.linforms(M=1024, N=100)
    S, b = s.A, s.b
    n = b.shape[0]
    nnz = s.A_csr.nnz
    C = S.grid_c
    R = n // C
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), b.dtype)

    def const_pallas(v):
        return stencil_spmv_pallas(S, v)

    def const_xla(v):
        y = jnp.zeros(n, v.dtype)
        for d, off in enumerate(S.offsets):
            y = y + S.const[d] * _shift(v, off, S.wrap)
        return y

    def strips_pad(v, y):
        dt = y.dtype
        top = bot = None
        for d, off in enumerate(S.offsets):
            tt = S.top_vals[d].astype(dt) * _window(v, off, C)
            bb = S.bot_vals[d].astype(dt) * _window(v, n - C + off, C)
            top = tt if top is None else top + tt
            bot = bb if bot is None else bot + bb
        X = v.reshape(R, C)
        lcorr = rcorr = None
        for d, off in enumerate(S.offsets):
            for base, vals, which in ((0, S.left_vals, "l"),
                                      (C - 1, S.right_vals, "r")):
                q, rem = divmod(base + off, C)
                col = lax.slice(X, (0, rem), (R, rem + 1))[:, 0]
                term = vals[d].astype(dt) * _shift_small(col, q)
                if which == "l":
                    lcorr = term if lcorr is None else lcorr + term
                else:
                    rcorr = term if rcorr is None else rcorr + term
        corr = (
            jnp.pad(top[None, :], ((0, R - 1), (0, 0)))
            + jnp.pad(bot[None, :], ((R - 1, 0), (0, 0)))
            + jnp.pad(lcorr[:, None], ((0, 0), (0, C - 1)))
            + jnp.pad(rcorr[:, None], ((0, 0), (C - 1, 0)))
        )
        return (y.reshape(R, C) + corr).reshape(n)

    variants = {
        "const_pallas": lambda v: const_pallas(v),
        "const_xla": lambda v: const_xla(v),
        "full_dus_pallas": lambda v: _apply_strips(S, v, const_pallas(v)),
        "full_dus_xla": lambda v: _apply_strips(S, v, const_xla(v)),
        "full_pad_pallas": lambda v: strips_pad(v, const_pallas(v)),
        "full_pad_xla": lambda v: strips_pad(v, const_xla(v)),
        "strips_only_dus": lambda v: _apply_strips(S, v, v),
        "strips_only_pad": lambda v: strips_pad(v, v),
    }

    # parity of the pad variant
    y_ref = jax.jit(lambda v: S.dia @ v)(x)
    for nm in ("full_dus_pallas", "full_pad_pallas", "full_pad_xla"):
        y = jax.jit(variants[nm])(x)
        err = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
        print(f"parity {nm}: {err:.2e}", flush=True)

    def chained(fn, reps=1000, outer=5):
        @jax.jit
        def chain(v):
            return lax.fori_loop(0, reps, lambda i, w: fn(w / (i + 1.0)), v)

        chain(x).block_until_ready()
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            chain(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / reps

    for nm, fn in variants.items():
        t = chained(fn)
        print(f"{nm}: {t*1e3:.4f} ms  ({nnz/t/1e9:.1f} GNNZ/s eff; "
              f"2n-traffic {2*n*4/t/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
