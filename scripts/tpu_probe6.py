"""Same-process side-by-side: spmv chain, gmres full/est, cgmres, all in one
window so tunnel variance cancels."""

import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import cgmres, gmres

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    cons = s.constraints()
    k = 30

    def med(fn, reps=7):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    @jax.jit
    def chain(A, b):
        return lax.fori_loop(0, k, lambda j, w: A @ w, b).sum()

    rows = [
        ("spmv chain (fori, 30x)", lambda: chain(A, b).block_until_ready()),
        ("gmres full", lambda: gmres(A, b, k=k, tol=1e-50)[0].block_until_ready()),
        ("gmres est", lambda: gmres(A, b, k=k, tol=1e-50, true_residual=False)[0].block_until_ready()),
        ("cgmres mixed", lambda: cgmres(A, b, k=k, tol=1e-6, constraints=cons)[0].block_until_ready()),
        ("cgmres est", lambda: cgmres(A, b, k=k, tol=1e-6, constraints=cons, true_residual=False)[0].block_until_ready()),
        ("cgmres f32", lambda: cgmres(A, b, k=k, tol=1e-6, constraints=cons, mixed=False)[0].block_until_ready()),
    ]
    for label, fn in rows:
        t = med(fn)
        print(f"{label:24s} {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
