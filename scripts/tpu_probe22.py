"""Probe 22: endgame decomposition after the modified-Newton KKT rework.

Chained in-program timing (probe15-18 discipline: thread ALL outputs into
the dependency chain or XLA DCEs the work) at heat M=256, cheb8, k=30 —
the VERDICT r1 target config (cgmres core was 19.5 ms vs gmres 11.9 ms;
round-2 goal: cgmres ≤ ~15 ms, ideally ≤1.3× gmres).
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

    from structurepreservingiterativesolvers_tpu import precond
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers.cgmres import _build_core
    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core as _g_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    s = heat.linforms(M=256, N=100)
    cons = tuple(s.constraints())
    pre = precond.chebyshev(s.A, degree=8)
    dt = s.b.dtype
    k = 30
    tol_d, contol_d, ctol_d = (dscalar(1e-6, dt), dscalar(10.0, dt),
                               dscalar(1e-12, dt))

    core = _build_core(k, len(cons), None, False, False, dt == jnp.float32,
                       ("q",) * len(cons), "cgs2", True, "while")

    def chained_cg(reps=20, outer=3):
        @jax.jit
        def chain(b):
            def body(i, acc):
                out = core(s.A, b * (1.0 + 1e-12 * acc[0]), None, cons,
                           tol_d, contol_d, ctol_d, pre)
                # thread steps+deviation too, so nothing is DCE'd
                return out.x + 0.0 * (out.deviation + out.res[0])
            return lax.fori_loop(0, reps, body, jnp.zeros_like(b))

        chain(s.b).block_until_ready()
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            chain(s.b).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / reps

    t_cg = chained_cg()
    print(f"cgmres core: {t_cg*1e3:.2f} ms", flush=True)

    gcore = _g_core(k, None, False, True, "cgs2", "while")

    def chained_g(reps=20, outer=3):
        @jax.jit
        def chain(b):
            def body(i, acc):
                out = gcore(s.A, b * (1.0 + 1e-12 * acc[0]), None, tol_d, pre)
                return out.x + 0.0 * out.res[0]
            return lax.fori_loop(0, reps, body, jnp.zeros_like(b))

        chain(s.b).block_until_ready()
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            chain(s.b).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / reps

    t_g = chained_g()
    print(f"gmres core:  {t_g*1e3:.2f} ms   ratio {t_cg/t_g:.2f}", flush=True)

    # sanity: quality unchanged
    out = jax.jit(lambda: core(s.A, s.b, None, cons, tol_d, contol_d, ctol_d,
                               pre))()
    print("steps", int(out.steps), "ncon", int(out.constrained_steps),
          "safety", int(out.safety), "dev", float(out.deviation),
          "kkt_iters", int(out.kkt_iters), flush=True)


if __name__ == "__main__":
    main()
