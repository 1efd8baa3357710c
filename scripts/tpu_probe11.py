"""Decompose cgmres wall time after the hostio fix: device core vs wrapper.

Preconditioned heat solve (the designed operating regime — TimedSolve pairs
heat with AMG/Chebyshev) so the solve converges and the constrained endgame
runs only near termination, plus the unpreconditioned k-exhausting case.
"""
import sys, time
sys.path.insert(0, ".")


def main():
    import warnings
    warnings.filterwarnings("ignore")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from structurepreservingiterativesolvers_tpu import precond
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import cgmres
    from structurepreservingiterativesolvers_tpu.solvers.cgmres import _build_core
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    cons = tuple(s.constraints())
    pre = precond.chebyshev(A, degree=8)
    k = 30
    dt = b.dtype

    def med(fn, reps=7):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    mixed = dt == jnp.float32
    core = _build_core(k, len(cons), None, False, False, mixed,
                       ("q",) * len(cons), "cgs2", True, "while")
    tol, contol, ctol = dscalar(1e-7, dt), dscalar(10.0, dt), dscalar(1e-12, dt)

    rows = [
        ("core pre (block x)",
         lambda: core(A, b, None, cons, tol, contol, ctol, pre)
         .x.block_until_ready()),
        ("core nopre (block x)",
         lambda: core(A, b, None, cons, tol, contol, ctol, None)
         .x.block_until_ready()),
        ("wrapper pre",
         lambda: cgmres(A, b, k=k, tol=1e-7, constraints=cons, pre=pre)[0]
         .block_until_ready()),
        ("wrapper nopre",
         lambda: cgmres(A, b, k=k, tol=1e-7, constraints=cons)[0]
         .block_until_ready()),
    ]
    for label, fn in rows:
        print(f"{label:24s} {med(fn)*1e3:9.2f} ms", flush=True)
    _, info = cgmres(A, b, k=k, tol=1e-7, constraints=cons, pre=pre)
    print(f"pre: steps={info['steps']} ncon={info['constrained_steps']} "
          f"safety={info['safety']} dev={info['deviation']:.2e}", flush=True)


if __name__ == "__main__":
    main()
