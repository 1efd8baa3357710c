"""Post-rewrite KKT timing, window-robust.

Chained solve_dense (100 dependent solves in ONE program) gives per-solve
device time free of the ~35 ms RPC floor that polluted probe12's standalone
number.  gmres core in the same window is the dispatch-floor yardstick.
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
    from structurepreservingiterativesolvers_tpu.solvers.cgmres import (
        _build_core as cg_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core as g_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar
    from structurepreservingiterativesolvers_tpu.solvers.kkt import solve_dense

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

    rng = np.random.default_rng(0)
    n = k + 3
    K = jnp.asarray(rng.standard_normal((n, n)) + 10 * np.eye(n))
    rhs0 = jnp.asarray(rng.standard_normal(n))
    REPS = 100

    @jax.jit
    def chain(K, rhs):
        return lax.fori_loop(
            0, REPS, lambda i, acc: solve_dense(K, rhs + 1e-12 * acc), rhs * 0
        )

    t = med(lambda: chain(K, rhs0).block_until_ready())
    print(f"solve_dense chained x{REPS}: {t*1e3:9.2f} ms total, "
          f"{t/REPS*1e6:8.1f} us/solve", flush=True)

    gc = g_core(k, None, False, True, "cgs2", "while")
    tol50 = dscalar(1e-50, dt)
    t = med(lambda: gc(A, b, None, tol50, None).x.block_until_ready())
    print(f"gmres core (yardstick)     {t*1e3:9.2f} ms", flush=True)

    core = cg_core(k, len(cons), None, False, False, dt == jnp.float32,
                   ("q",) * len(cons), "cgs2", True, "while")
    tol, contol, ctol = dscalar(1e-7, dt), dscalar(10.0, dt), dscalar(1e-12, dt)
    t = med(lambda: core(A, b, None, cons, tol, contol, ctol, pre)
            .x.block_until_ready())
    print(f"cgmres core pre            {t*1e3:9.2f} ms  (was 71.8)", flush=True)
    t = med(lambda: core(A, b, None, cons, tol, contol, ctol, None)
            .x.block_until_ready())
    print(f"cgmres core nopre          {t*1e3:9.2f} ms  (was 288.8)", flush=True)
    out = jax.device_get(core(A, b, None, cons, tol, contol, ctol, pre))
    print(f"pre: steps={int(out.steps)} ncon={int(out.constrained_steps)} "
          f"kkt_iters={int(out.kkt_iters)} dev={float(out.deviation):.2e} "
          f"safety={int(out.safety)}", flush=True)
    out = jax.device_get(core(A, b, None, cons, tol, contol, ctol, None))
    print(f"nopre: steps={int(out.steps)} ncon={int(out.constrained_steps)} "
          f"kkt_iters={int(out.kkt_iters)} dev={float(out.deviation):.2e}",
          flush=True)



# appended: wrapper-level timings in the same window (invoked via main2)
def main2():
    import warnings
    warnings.filterwarnings("ignore")
    import numpy as np
    import time
    from structurepreservingiterativesolvers_tpu import precond
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import cgmres, gmres

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    cons = tuple(s.constraints())
    pre = precond.chebyshev(A, degree=8)
    k = 30

    def med(fn, reps=7):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t = med(lambda: gmres(A, b, k=k, tol=1e-7, pre=pre)[0].block_until_ready())
    print(f"gmres wrapper pre        {t*1e3:9.2f} ms", flush=True)
    t = med(lambda: cgmres(A, b, k=k, tol=1e-7, constraints=cons, pre=pre)[0]
            .block_until_ready())
    print(f"cgmres wrapper pre       {t*1e3:9.2f} ms", flush=True)
    t = med(lambda: cgmres(A, b, k=k, tol=1e-7, constraints=cons, pre=pre,
                           true_residual=False)[0].block_until_ready())
    print(f"cgmres wrapper pre fast  {t*1e3:9.2f} ms", flush=True)


# appended: chained-core timings — repeated identical dispatches of one
# program are cached/elided somewhere in the tunnel stack (0.08 ms for a
# full 30-iteration cgmres core is physically impossible), so the only
# honest per-solve number chains REPS *dependent* solves inside ONE program.
def main3():
    import warnings
    warnings.filterwarnings("ignore")
    import numpy as np
    import time
    import jax
    import jax.numpy as jnp
    from jax import lax
    from structurepreservingiterativesolvers_tpu import precond
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers.cgmres import (
        _build_core as cg_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core as g_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    cons = tuple(s.constraints())
    pre = precond.chebyshev(A, degree=8)
    k = 30
    dt = b.dtype

    def med(fn, reps=5):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    REPS = 10
    gc = g_core(k, None, False, True, "cgs2", "while")
    tol50 = dscalar(1e-50, dt)

    @jax.jit
    def chain_g(b):
        def body(i, acc):
            return gc(A, b + 1e-10 * acc, None, tol50, None).x
        return lax.fori_loop(0, REPS, body, b * 0)

    t = med(lambda: chain_g(b).block_until_ready())
    print(f"gmres core chained x{REPS}:  {t*1e3:9.2f} ms total, "
          f"{t/REPS*1e3:8.3f} ms/solve", flush=True)

    core = cg_core(k, len(cons), None, False, False, dt == jnp.float32,
                   ("q",) * len(cons), "cgs2", True, "while")
    tol, contol, ctol = dscalar(1e-7, dt), dscalar(10.0, dt), dscalar(1e-12, dt)

    @jax.jit
    def chain_c(b):
        def body(i, acc):
            return core(A, b + 1e-10 * acc, None, cons, tol, contol, ctol,
                        pre).x
        return lax.fori_loop(0, REPS, body, b * 0)

    t = med(lambda: chain_c(b).block_until_ready())
    print(f"cgmres core chained x{REPS}: {t*1e3:9.2f} ms total, "
          f"{t/REPS*1e3:8.3f} ms/solve (pre)", flush=True)


if __name__ == "__main__":
    main()
    main2()
    main3()
