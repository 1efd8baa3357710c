"""Same-window isolation: arnoldi loop via fori vs while (identical body)."""

import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import gmres
    from structurepreservingiterativesolvers_tpu.solvers.arnoldi import (
        arnoldi_step,
        init_state,
        lsq_coeffs,
        lsq_residual_estimate,
    )

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    k = 30

    def med(fn, reps=7):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def ident(v):
        return v

    @jax.jit
    def arnoldi_fori(A, b):
        st = init_state(b, jnp.linalg.norm(b), k)
        st = lax.fori_loop(0, k, lambda j, st: arnoldi_step(A, ident, st, j)[0], st)
        return st.g[k]

    @jax.jit
    def arnoldi_while(A, b):
        st = init_state(b, jnp.linalg.norm(b), k)

        def cond(c):
            st, j, done = c
            return (j < k) & ~done

        def body(c):
            st, j, done = c
            st, hlast = arnoldi_step(A, ident, st, j)
            return st, j + 1, hlast < -1.0

        st, j, _ = lax.while_loop(cond, body, (st, jnp.int32(0), jnp.bool_(False)))
        return st.g[k]

    @jax.jit
    def arnoldi_while_lsq(A, b):
        st = init_state(b, jnp.linalg.norm(b), k)

        def cond(c):
            st, j, done = c
            return (j < k) & ~done

        def body(c):
            st, j, done = c
            st, hlast = arnoldi_step(A, ident, st, j)
            r = lsq_residual_estimate(st, j)
            return st, j + 1, r < -1.0

        st, j, _ = lax.while_loop(cond, body, (st, jnp.int32(0), jnp.bool_(False)))
        return st.g[k]

    for label, fn in [
        ("arnoldi fori", lambda: arnoldi_fori(A, b).block_until_ready()),
        ("arnoldi while", lambda: arnoldi_while(A, b).block_until_ready()),
        ("arnoldi while+est", lambda: arnoldi_while_lsq(A, b).block_until_ready()),
        ("gmres full(while)", lambda: gmres(A, b, k=k, tol=1e-50)[0].block_until_ready()),
        ("gmres full(fori)", lambda: gmres(A, b, k=k, tol=1e-50, loop="fori")[0].block_until_ready()),
        ("gmres est(fori)", lambda: gmres(A, b, k=k, tol=1e-50, loop="fori", true_residual=False)[0].block_until_ready()),
    ]:
        print(f"{label:20s} {med(fn)*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
