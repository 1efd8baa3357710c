"""Probe 27: catch-up decomposition and T2 alternatives (heat M=256, k=30).

The remaining CGMRES-over-GMRES overhead after probe26's KKT cuts is the
constraint catch-up (~3.3 ms at gate entry).  Variants:

  catchup_now      — shipped dd path (with the pre-combined Emat)
  t2_map_c{1,3,5}  — the T2 lax.map with c rows per iteration (traffic/c)
  t2_f64_mxu       — T2 = ½(Z @ U.hiᵀ + Z @ U.loᵀ) as emulated-f64 MXU
                     matmuls, with accuracy vs the dd result
  u_spmm_only      — the dd SpMM U = M@Z alone (the other half)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
        catchup_buffers,
        init_buffers,
    )
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops import dd as _dd

    s = heat.linforms(M=256, N=100)
    cons = tuple(s.constraints())
    energy = cons[1]
    M = energy.M
    dt = s.b.dtype
    k = 30
    n = s.b.shape[0]
    x0c = jnp.zeros_like(s.b)
    rng = np.random.default_rng(1)
    Z = jnp.asarray(rng.standard_normal((k, n)), dt)
    cdtype = jnp.dtype("float64")

    def chained(fn, x, reps=20, outer=3):
        @jax.jit
        def chain(v):
            def body(i, acc):
                out = fn(acc * (1.0 + 1e-12 * i))
                leaf = jax.tree_util.tree_leaves(out)[0]
                return acc * (1.0 + 0.0 * jnp.ravel(leaf)[0].astype(v.dtype))
            return lax.fori_loop(0, reps, body, v)

        chain(x).block_until_ready()
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            chain(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / reps

    # --- shipped catch-up (both constraints) -------------------------------
    def full_catchup(Zv):
        bufs = tuple(
            init_buffers(c, x0c, k, cdtype, x0_zero=True, dd_value=True)
            for c in cons
        )
        return tuple(
            catchup_buffers(c, bf, Zv, x0c, x0_zero=True, dd_reduce=True)
            for c, bf in zip(cons, bufs)
        )

    t = chained(full_catchup, Z)
    print(f"catchup (both cons, Emat): {t*1e3:.2f} ms", flush=True)

    # --- U SpMM alone -------------------------------------------------------
    from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
        _dd_matvec,
    )

    def u_only(Zv):
        return jax.vmap(
            lambda h, l: _dd_matvec(M, _dd.DD(h, l))
        )(Zv, jnp.zeros_like(Zv))

    t_u = chained(u_only, Z)
    print(f"U = M@Z dd SpMM alone:     {t_u*1e3:.2f} ms", flush=True)

    U = jax.jit(u_only)(Z)

    # --- T2 via chunked map -------------------------------------------------
    def t2_chunked(c):
        kp = ((k + c - 1) // c) * c
        def f(Zv):
            Zp = jnp.pad(Zv, ((0, kp - k), (0, 0)))
            Zc = Zp.reshape(kp // c, c, n)
            rows = lax.map(
                lambda zc: _dd.dd_sum(
                    _dd.mul_f32(
                        _dd.DD(U.hi[None], U.lo[None]), zc[:, None, :]
                    ),
                    axis=-1,
                ),
                Zc,
            )  # (kp/c, c, k) dd
            return _dd.to_f64(rows).reshape(kp, k)[:k]
        return f

    T2_ref = None
    for c in (1, 3, 5):
        f = t2_chunked(c)
        if T2_ref is None:
            T2_ref = jax.jit(f)(Z)
        t_c = chained(f, Z)
        print(f"T2 map chunk={c}:           {t_c*1e3:.2f} ms", flush=True)

    # --- T2 via emulated-f64 MXU matmul ------------------------------------
    def t2_f64(Zv):
        Z64 = Zv.astype(jnp.float64)
        return Z64 @ U.hi.astype(jnp.float64).T \
            + Z64 @ U.lo.astype(jnp.float64).T

    T2_mxu = jax.jit(t2_f64)(Z)
    err = float(jnp.max(jnp.abs(T2_mxu - T2_ref))
                / jnp.max(jnp.abs(T2_ref)))
    t_m = chained(t2_f64, Z)
    print(f"T2 f64 MXU matmul:          {t_m*1e3:.2f} ms   rel err vs dd "
          f"{err:.2e}", flush=True)

    # single f64 matmul cost (is XLA:TPU f64 dot MXU-lowered at all?)
    def one_mm(Zv):
        return Zv.astype(jnp.float64) @ U.hi.astype(jnp.float64).T

    t_1 = chained(one_mm, Z)
    print(f"one (k,n)@(n,k) f64 matmul: {t_1*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
