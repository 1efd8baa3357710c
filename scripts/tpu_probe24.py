"""Probe 24: constant-stencil SpMV vs explicit DIA on the real chip.

The stencil kernel reads no matrix data (traffic ~2n vs nnz+2n), the claimed
>3x bandwidth win for the 7-diagonal heat operator — the reference hot loop
(reference solvers.py:95,191,370).  Chained in-program timing, 1000 reps
(the ~30 ms dispatch RPC floor dominates at 100 reps; see CLAUDE.md).
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops.stencil import Stencil, as_dia

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    for M in (1024,):
        s = heat.linforms(M=M, N=100)
        S, b = s.A, s.b
        assert isinstance(S, Stencil), type(S)
        A = as_dia(S)
        nnz = s.A_csr.nnz
        n = b.shape[0]
        ncorr = S.corr_elements
        print(f"\nM={M} n={n} nnz={nnz} grid_c={S.grid_c} corr_el={ncorr} offsets={S.offsets}",
              flush=True)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(n), b.dtype)

        ops = {
            "dia_xla": dataclasses.replace(A, engine="xla"),
            "dia_pallas": dataclasses.replace(A, engine="pallas"),
            "stencil_xla": dataclasses.replace(S, engine="xla"),
            "stencil_pallas": dataclasses.replace(S, engine="pallas"),
        }

        # parity on device
        y_ref = jax.jit(lambda A_, v: A_ @ v)(ops["dia_xla"], x)
        scale = float(jnp.max(jnp.abs(y_ref)))
        for name, A_op in ops.items():
            y = jax.jit(lambda A_, v: A_ @ v)(A_op, x)
            err = float(jnp.max(jnp.abs(y - y_ref))) / scale
            print(f"  parity {name}: rel err {err:.2e}", flush=True)

        def chained(A_op, reps=1000, outer=5):
            @jax.jit
            def chain(v):
                return lax.fori_loop(
                    0, reps, lambda i, w: A_op @ (w / (i + 1.0)), v)

            chain(x).block_until_ready()
            ts = []
            for _ in range(outer):
                t0 = time.perf_counter()
                chain(x).block_until_ready()
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts)) / reps

        for name, A_op in ops.items():
            t = chained(A_op)
            tr_dia = (nnz + 2 * n) * 4
            tr_st = (2 * n + ncorr) * 4
            tr = tr_st if name.startswith("stencil") else tr_dia
            print(f"  {name}: {t*1e3:.4f} ms  {nnz/t/1e9:.1f} GNNZ/s eff  "
                  f"{tr/t/1e9:.0f} GB/s own-traffic "
                  f"({tr/t/819e9*100:.0f}% peak)", flush=True)

    # stencil kernel block-rows sweep at M=1024 (strip correction included)
    from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import (
        stencil_spmv_pallas,
    )
    from structurepreservingiterativesolvers_tpu.ops.stencil import _apply_strips

    s = heat.linforms(M=1024, N=100)
    S, b = s.A, s.b
    n = b.shape[0]
    nnz = s.A_csr.nnz
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), b.dtype)
    for br in (16384, 32768, 65536, 131072, 262144):
        def mk(reps, br=br):
            @jax.jit
            def chain(v):
                def body(i, w):
                    w = w / (i + 1.0)
                    y = stencil_spmv_pallas(S, w, block_rows=br)
                    return _apply_strips(S, w, y)
                return lax.fori_loop(0, reps, body, v)
            return chain

        c = mk(1000)
        c(x).block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            c(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) / 1000
        print(f"stencil br={br}: {t*1e3:.4f} ms  {nnz/t/1e9:.1f} GNNZ/s eff",
              flush=True)


if __name__ == "__main__":
    main()
