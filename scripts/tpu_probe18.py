"""Bisect the remaining cgmres endgame cost (chained timing, heat M=256).

After λ0 + batched LS + x0-zero skip + two-phase loop: core 27.9 ms vs
gmres 11.9 ms.  Known endgame pieces: in-core KKT ~5 ms + catchup 2.5 ms.
Bisect the remaining ~9 ms across: constraint count, M presence (SpMM),
and endgame dtype (mixed f64 vs f32).
"""
import sys, time
sys.path.insert(0, ".")


def main():
    import warnings
    warnings.filterwarnings("ignore")
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu import precond
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers.cgmres import _build_core
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    cons = tuple(s.constraints())  # (mass [M=None], energy [MatComb])
    pre = precond.chebyshev(A, degree=8)
    k = 30
    dt = b.dtype

    def chained(core, consx, reps=5, reps_outer=3):
        tol, contol, ctol = (dscalar(1e-7, dt), dscalar(10.0, dt),
                             dscalar(1e-12, dt))

        @jax.jit
        def chain(b2):
            def body(i, acc):
                out = core(A, b2 * (1.0 + 1e-12 * acc[0]), None, consx,
                           tol, contol, ctol, pre)
                return out.x.astype(b2.dtype)
            return lax.fori_loop(0, reps, body, jnp.zeros_like(b2))

        f = lambda: chain(b).block_until_ready()
        f()
        ts = []
        for _ in range(reps_outer):
            t0 = time.perf_counter(); f(); ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / reps

    mixed = dt == jnp.float32
    variants = [
        ("both cons, mixed", cons, mixed),
        ("mass only (M=None)", (cons[0],), mixed),
        ("energy only (SpMM)", (cons[1],), mixed),
        ("both cons, f32 end", cons, False),
    ]
    for label, cx, mx in variants:
        core = _build_core(k, len(cx), None, False, False, mx,
                           ("q",) * len(cx), "cgs2", True, "while")
        t = chained(core, cx)
        print(f"{label:24s} {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
