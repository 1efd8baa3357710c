"""Time the KKT endgame pieces on TPU: solve_dense, constrained_lsq, iters.

probe11 showed cgmres core with ONE constrained step costs ~72 ms device-side
while the pure Arnoldi loop is <0.1 ms — the endgame dominates.
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
    from structurepreservingiterativesolvers_tpu.solvers.kkt import (
        constrained_lsq, solve_dense,
    )

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

    # representative small dense solve
    rng = np.random.default_rng(0)
    n = k + 3
    K = jnp.asarray(rng.standard_normal((n, n)) + 10 * np.eye(n))
    rhs = jnp.asarray(rng.standard_normal(n))
    sd = jax.jit(solve_dense)
    t = med(lambda: sd(K, rhs).block_until_ready())
    print(f"solve_dense ({n}x{n})    {t*1e3:9.2f} ms", flush=True)

    # full constrained_lsq with real buffers, warm vs cold start
    from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
        catchup_buffers, init_buffers,
    )
    from structurepreservingiterativesolvers_tpu.solvers.arnoldi import (
        arnoldi_step, init_state, lsq_coeffs,
    )

    dt = b.dtype
    x0 = jnp.zeros_like(b)

    @jax.jit
    def build(A, b, x0):
        r0 = b - A @ x0
        beta = jnp.linalg.norm(r0)
        st = init_state(r0, beta, k)
        st = jax.lax.fori_loop(
            0, k, lambda j, st: arnoldi_step(A, lambda v: v, st, j)[0], st)
        y = lsq_coeffs(st, jnp.int32(k - 1))
        bufs = tuple(
            catchup_buffers(c, init_buffers(c, x0, k, dt), st.Z, x0)
            for c in cons
        )
        return st.H, beta, bufs, y

    H, beta, bufs, ywarm = jax.block_until_ready(build(A, b, x0))
    active = jnp.ones(k, bool)
    cmask = jnp.ones(len(cons), dt)

    cl = jax.jit(lambda H, beta, bufs, y: constrained_lsq(
        H, beta, bufs, y, active, cmask, kkt_tol=1e-13))
    out = jax.block_until_ready(cl(H, beta, bufs, ywarm))
    print(f"constrained_lsq warm: iters={int(out.iters)} "
          f"dev={float(out.deviation):.2e} kkt={float(out.kkt_norm):.2e}",
          flush=True)
    t = med(lambda: cl(H, beta, bufs, ywarm).y.block_until_ready())
    print(f"constrained_lsq warm   {t*1e3:9.2f} ms", flush=True)
    ycold = jnp.zeros(k, dt)
    out = jax.block_until_ready(cl(H, beta, bufs, ycold))
    print(f"constrained_lsq cold: iters={int(out.iters)}", flush=True)
    t = med(lambda: cl(H, beta, bufs, ycold).y.block_until_ready())
    print(f"constrained_lsq cold   {t*1e3:9.2f} ms", flush=True)

    _, info = cgmres(A, b, k=k, tol=1e-7, constraints=cons, pre=pre)
    print(f"cgmres pre: steps={info['steps']} ncon={info['constrained_steps']} "
          f"kkt_iters={info['kkt_iters']}", flush=True)


if __name__ == "__main__":
    main()
