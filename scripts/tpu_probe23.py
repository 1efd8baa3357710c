"""Probe 23: decompose the remaining ~9 ms endgame cost (heat M=256, cheb8,
k=30, chained timing).  Pieces: all-f32 core (no dd/f64), f64 GJ inverse
alone, dd catch-up alone."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chained(make_chain, x, reps, outer=3):
    c = make_chain(reps)
    c(x).block_until_ready()
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        c(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    from structurepreservingiterativesolvers_tpu import precond
    from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
        catchup_buffers,
        init_buffers,
    )
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers.cgmres import _build_core
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar
    from structurepreservingiterativesolvers_tpu.solvers.kkt import gj_inverse

    s = heat.linforms(M=256, N=100)
    cons = tuple(s.constraints())
    pre = precond.chebyshev(s.A, degree=8)
    dt = s.b.dtype
    k = 30
    tol_d, contol_d, ctol_d = (dscalar(1e-6, dt), dscalar(10.0, dt),
                               dscalar(1e-12, dt))

    def cg_chain(mixed):
        core = _build_core(k, len(cons), None, False, False, mixed,
                           ("q",) * len(cons), "cgs2", True, "while")

        def make(reps):
            @jax.jit
            def chain(b):
                def body(i, acc):
                    out = core(s.A, b * (1.0 + 1e-12 * acc[0]), None, cons,
                               tol_d, contol_d, ctol_d, pre)
                    return out.x + 0.0 * (out.deviation + out.res[0])
                return lax.fori_loop(0, reps, body, jnp.zeros_like(b))
            return chain
        return make

    t_mixed = chained(cg_chain(True), s.b, 20)
    print(f"cgmres mixed: {t_mixed*1e3:.2f} ms", flush=True)
    t_f32 = chained(cg_chain(False), s.b, 20)
    print(f"cgmres all-f32: {t_f32*1e3:.2f} ms", flush=True)

    # f64 GJ inverse of a (k+m)-sized system, chained
    km = k + len(cons)
    K0 = jnp.asarray(np.random.default_rng(0).standard_normal((km, km)),
                     jnp.float64) + 10.0 * jnp.eye(km, dtype=jnp.float64)

    def gj_make(reps):
        @jax.jit
        def chain(K):
            def body(i, acc):
                Ki = gj_inverse(K + acc[0, 0] * 1e-14)
                return Ki
            return lax.fori_loop(0, reps, body, K)
        return chain

    t_gj = chained(gj_make, K0, 20)
    print(f"gj_inverse f64 {km}x{km}: {t_gj*1e3:.2f} ms", flush=True)

    K32 = K0.astype(jnp.float32)
    t_gj32 = chained(gj_make, K32, 20)
    print(f"gj_inverse f32 {km}x{km}: {t_gj32*1e3:.2f} ms", flush=True)

    # dd catch-up (the constraint-reduction build at gate entry)
    x0c = jnp.zeros_like(s.b)
    Z = jnp.asarray(np.random.default_rng(1).standard_normal((k, s.b.shape[0])),
                    dt)

    def cu_make(reps):
        @jax.jit
        def chain(Z):
            def body(i, acc):
                bufs = tuple(
                    init_buffers(c, x0c, k, jnp.dtype("float64"),
                                 x0_zero=True, dd_value=True)
                    for c in cons
                )
                out = tuple(
                    catchup_buffers(c, bf, acc, x0c, x0_zero=True,
                                    dd_reduce=True)
                    for c, bf in zip(cons, bufs)
                )
                leaf = out[-1].T2[0, 0].astype(dt)
                return acc * (1.0 + 0.0 * leaf)
            return lax.fori_loop(0, reps, body, Z)
        return chain

    t_cu = chained(cu_make, Z, 10)
    print(f"dd catchup: {t_cu*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
