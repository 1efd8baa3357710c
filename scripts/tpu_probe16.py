"""Chained timing of small-dense-solve variants for the KKT system (TPU).

probe15: solve_dense f64 = 1.44 ms and is the bulk of each Newton iteration
(constrained_lsq ≈ iters × 1.8 ms).  Candidates:
  a) Gauss-Jordan f64 (current)
  b) Gauss-Jordan f32
  c) jax.scipy lu_factor+lu_solve f32
  d) f32 factor + double-f32 (dd) residual refinement to f64 accuracy
  e) jnp.linalg.solve f32
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

    from structurepreservingiterativesolvers_tpu.solvers.kkt import solve_dense
    from structurepreservingiterativesolvers_tpu.ops import dd

    n = 33
    rng = np.random.default_rng(0)
    K64 = jnp.asarray(rng.standard_normal((n, n)) + 10 * np.eye(n), jnp.float64)
    rhs64 = jnp.asarray(rng.standard_normal(n), jnp.float64)
    xtrue = np.linalg.solve(np.asarray(K64), np.asarray(rhs64))

    def chained(solver, dtype, reps=30, reps_outer=3):
        K = K64.astype(dtype)
        r0 = rhs64.astype(dtype)

        @jax.jit
        def chain(rhs):
            def body(i, r):
                return solver(K, r / (1.0 + jnp.abs(r[0])))
            return lax.fori_loop(0, reps, body, rhs)

        chain(r0).block_until_ready()
        ts = []
        for _ in range(reps_outer):
            t0 = time.perf_counter()
            chain(r0).block_until_ready()
            ts.append(time.perf_counter() - t0)
        # accuracy on the unscaled system
        x = jax.jit(solver)(K, r0)
        err = float(np.max(np.abs(np.asarray(x, np.float64) - xtrue)))
        return float(np.median(ts)) / reps, err

    def lu32(K, rhs):
        lu, piv = jax.scipy.linalg.lu_factor(K.astype(jnp.float32))
        return jax.scipy.linalg.lu_solve((lu, piv), rhs.astype(jnp.float32)).astype(K.dtype)

    def solve32(K, rhs):
        return jnp.linalg.solve(K.astype(jnp.float32), rhs.astype(jnp.float32)).astype(K.dtype)

    def lu_dd_refine(K, rhs):
        """f32 LU + dd-residual refinement: f64-grade x without f64 array ops
        beyond the final conversion."""
        Kdd = dd.from_f64_jnp(K)
        rdd = dd.from_f64_jnp(rhs)
        lu, piv = jax.scipy.linalg.lu_factor(K.astype(jnp.float32))
        x32 = jax.scipy.linalg.lu_solve((lu, piv), rhs.astype(jnp.float32))
        xdd = dd.from_f32(x32)
        for _ in range(2):
            # r = rhs - K x in dd: broadcast mul over rows, pairwise dd sum
            prod = dd.mul(dd.DD(Kdd.hi, Kdd.lo),
                          dd.DD(xdd.hi[None, :], xdd.lo[None, :]))
            Kx = dd.dd_sum(prod, axis=-1)
            r = dd.sub(rdd, Kx)
            d = jax.scipy.linalg.lu_solve((lu, piv), r.hi)
            xdd = dd.add(xdd, dd.from_f32(d))
        return dd.to_f64(xdd).astype(K.dtype)

    def gj_dd_refine(K, rhs):
        """f32 Gauss-Jordan + dd refinement (no LAPACK custom call)."""
        Kdd = dd.from_f64_jnp(K)
        rdd = dd.from_f64_jnp(rhs)
        K32 = K.astype(jnp.float32)
        x32 = solve_dense(K32, rhs.astype(jnp.float32))
        xdd = dd.from_f32(x32)
        for _ in range(2):
            prod = dd.mul(dd.DD(Kdd.hi, Kdd.lo),
                          dd.DD(xdd.hi[None, :], xdd.lo[None, :]))
            Kx = dd.dd_sum(prod, axis=-1)
            r = dd.sub(rdd, Kx)
            d = solve_dense(K32, r.hi)
            xdd = dd.add(xdd, dd.from_f32(d))
        return dd.to_f64(xdd).astype(K.dtype)

    rows = [
        ("gj f64 (current)", solve_dense, jnp.float64),
        ("gj f32", solve_dense, jnp.float32),
        ("lu_factor f32", lu32, jnp.float64),
        ("linalg.solve f32", solve32, jnp.float64),
        ("lu f32 + dd refine", lu_dd_refine, jnp.float64),
        ("gj f32 + dd refine", gj_dd_refine, jnp.float64),
    ]
    for label, fn, dt in rows:
        t, err = chained(fn, dt)
        print(f"{label:22s} {t*1e3:8.3f} ms   err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
