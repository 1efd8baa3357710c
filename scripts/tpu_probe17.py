"""Re-measure the KKT endgame after the λ0 estimate + batched line search
(chained in-program timing; compare against probe15's numbers:
cgmres core 31.6 ms, constrained_lsq warm 12.6 ms, endgame 19.7 ms)."""
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
    from structurepreservingiterativesolvers_tpu.solvers.kkt import constrained_lsq
    from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
        catchup_buffers, init_buffers,
    )
    from structurepreservingiterativesolvers_tpu.solvers.arnoldi import (
        arnoldi_step, init_state, lsq_coeffs,
    )

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    cons = tuple(s.constraints())
    pre = precond.chebyshev(A, degree=8)
    k = 30
    dt = b.dtype

    def chained(make_chain, reps_inner, reps_outer=3):
        chain = make_chain(reps_inner)
        chain()
        ts = []
        for _ in range(reps_outer):
            t0 = time.perf_counter(); chain(); ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / reps_inner

    mixed = dt == jnp.float32
    core = _build_core(k, len(cons), None, False, False, mixed,
                       ("q",) * len(cons), "cgs2", True, "while")
    tol, contol, ctol = dscalar(1e-7, dt), dscalar(10.0, dt), dscalar(1e-12, dt)

    def make_core_chain(reps):
        @jax.jit
        def chain(b2):
            def body(i, acc):
                out = core(A, b2 * (1.0 + 1e-12 * acc[0]), None, cons,
                           tol, contol, ctol, pre)
                return out.x.astype(b2.dtype)
            return lax.fori_loop(0, reps, body, jnp.zeros_like(b2))
        return lambda: chain(b).block_until_ready()

    t_cg = chained(make_core_chain, 5)
    print(f"cgmres core (chained)   {t_cg*1e3:9.2f} ms  (was 31.6)", flush=True)

    x0 = jnp.zeros_like(b)
    cdtype = jnp.float64 if mixed else dt

    @jax.jit
    def build(A, b, x0):
        r0 = b - A @ x0
        beta = jnp.linalg.norm(r0)
        st = init_state(r0, beta, k)
        st = lax.fori_loop(
            0, k, lambda j, st: arnoldi_step(A, lambda v: v, st, j)[0], st)
        y = lsq_coeffs(st, jnp.int32(k - 1))
        bufs = tuple(
            catchup_buffers(c, init_buffers(c, x0, k, cdtype), st.Z, x0)
            for c in cons
        )
        return st.H, beta, bufs, y

    H, beta, bufs, ywarm = jax.block_until_ready(build(A, b, x0))
    active = jnp.ones(k, bool)
    cmask = jnp.ones(len(cons), cdtype)

    def make_cl_chain(reps):
        @jax.jit
        def chain(y):
            def body(i, yy):
                out = constrained_lsq(H.astype(cdtype), beta.astype(cdtype),
                                      bufs, yy, active, cmask, kkt_tol=1e-13)
                return out.y * (1.0 + 1e-14 * i)
            return lax.fori_loop(0, reps, body, y)
        return lambda: chain(ywarm.astype(cdtype)).block_until_ready()

    t_cl = chained(make_cl_chain, 10)
    out = jax.block_until_ready(jax.jit(
        lambda y: constrained_lsq(H.astype(cdtype), beta.astype(cdtype), bufs,
                                  y, active, cmask, kkt_tol=1e-13)
    )(ywarm.astype(cdtype)))
    print(f"constrained_lsq warm    {t_cl*1e3:9.2f} ms  (was 12.6) "
          f"iters={int(out.iters)} kkt={float(out.kkt_norm):.2e} "
          f"dev={float(out.deviation):.2e}", flush=True)


if __name__ == "__main__":
    main()
