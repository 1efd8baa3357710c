"""Chained in-program decomposition of the constrained endgame on TPU.

probe12's repeated-dispatch medians (~26 ms for solve_dense, constrained_lsq
warm AND cold alike) are indistinguishable from the ~25-30 ms per-dispatch RPC
floor (probe13).  This probe re-measures every endgame piece with dependent
in-program chains (the bench.py methodology) so device time is isolated:

  a) full cgmres core vs gmres-equivalent (endgame total)
  b) solve_dense f64 (current) vs native f32 jnp.linalg.solve + f64 refinement
  c) constrained_lsq (whole KKT Newton)
  d) catchup_buffers in f64 (current mixed path) vs f32
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
    from structurepreservingiterativesolvers_tpu.solvers.kkt import (
        constrained_lsq, solve_dense,
    )
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

    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core as _g_core,
    )

    mixed = dt == jnp.float32
    core = _build_core(k, len(cons), None, False, False, mixed,
                       ("q",) * len(cons), "cgs2", True, "while")
    gcore = _g_core(k, None, False, True, "cgs2", "while")
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

    def make_gmres_chain(reps):
        @jax.jit
        def chain(b2):
            def body(i, acc):
                out = gcore(A, b2 * (1.0 + 1e-12 * acc[0]), None, tol, pre)
                return out.x.astype(b2.dtype)
            return lax.fori_loop(0, reps, body, jnp.zeros_like(b2))
        return lambda: chain(b).block_until_ready()

    t_cg = chained(make_core_chain, 5)
    t_g = chained(make_gmres_chain, 5)
    print(f"cgmres core (chained)   {t_cg*1e3:9.2f} ms", flush=True)
    print(f"gmres-equiv core        {t_g*1e3:9.2f} ms", flush=True)
    print(f"endgame total           {(t_cg-t_g)*1e3:9.2f} ms", flush=True)

    # --- build real KKT inputs once -------------------------------------
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
        return st.H, beta, bufs, y, st.Z

    H, beta, bufs, ywarm, Z = jax.block_until_ready(build(A, b, x0))
    active = jnp.ones(k, bool)
    cmask = jnp.ones(len(cons), cdtype)
    m = len(cons)
    n = k + m
    rng = np.random.default_rng(0)
    K0 = jnp.asarray(rng.standard_normal((n, n)) + 10 * np.eye(n), cdtype)
    rhs0 = jnp.asarray(rng.standard_normal(n), cdtype)

    # b) solve_dense f64 chained
    def make_sd_chain(reps):
        @jax.jit
        def chain(rhs):
            def body(i, r):
                return solve_dense(K0, r / (1.0 + jnp.abs(r[0])))
            return lax.fori_loop(0, reps, body, rhs)
        return lambda: chain(rhs0).block_until_ready()

    t_sd = chained(make_sd_chain, 20)
    print(f"solve_dense f64 (33)    {t_sd*1e3:9.2f} ms", flush=True)

    # native f32 LU + two f64 refinement steps
    def solve_refined(K, rhs):
        K32 = K.astype(jnp.float32)
        lu, piv = jax.scipy.linalg.lu_factor(K32)
        x = jax.scipy.linalg.lu_solve((lu, piv), rhs.astype(jnp.float32))
        x = x.astype(K.dtype)
        for _ in range(2):
            r = rhs - K @ x
            d = jax.scipy.linalg.lu_solve((lu, piv), r.astype(jnp.float32))
            x = x + d.astype(K.dtype)
        return x

    def make_sr_chain(reps):
        @jax.jit
        def chain(rhs):
            def body(i, r):
                return solve_refined(K0, r / (1.0 + jnp.abs(r[0])))
            return lax.fori_loop(0, reps, body, rhs)
        return lambda: chain(rhs0).block_until_ready()

    t_sr = chained(make_sr_chain, 20)
    print(f"solve f32+refine (33)   {t_sr*1e3:9.2f} ms", flush=True)
    # accuracy check
    xs = jax.jit(solve_dense)(K0, rhs0)
    xr = jax.jit(solve_refined)(K0, rhs0)
    xs64 = np.linalg.solve(np.asarray(K0, np.float64), np.asarray(rhs0, np.float64))
    print(f"  gj err {np.max(np.abs(np.asarray(xs)-xs64)):.2e}  "
          f"refined err {np.max(np.abs(np.asarray(xr)-xs64)):.2e}", flush=True)

    # c) constrained_lsq chained
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
    print(f"constrained_lsq warm    {t_cl*1e3:9.2f} ms", flush=True)

    # d) catchup_buffers f64 vs f32 chained
    def make_cu_chain(cdt):
        def mk(reps):
            b0 = tuple(init_buffers(c, x0, k, cdt) for c in cons)

            @jax.jit
            def chain(Zx):
                def body(i, Zc):
                    bufs = tuple(
                        catchup_buffers(c, bf, Zc, x0)
                        for c, bf in zip(cons, b0)
                    )
                    return Zc * (1.0 + 1e-12 * bufs[0].t0.astype(Zc.dtype))
                return lax.fori_loop(0, reps, body, Zx)
            return lambda: chain(Z).block_until_ready()
        return mk

    t_cu64 = chained(make_cu_chain(jnp.float64), 10)
    t_cu32 = chained(make_cu_chain(jnp.float32), 10)
    print(f"catchup f64 (2 cons)    {t_cu64*1e3:9.2f} ms", flush=True)
    print(f"catchup f32 (2 cons)    {t_cu32*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
