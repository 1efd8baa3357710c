"""Ablate the GMRES iteration cost on TPU to find the per-iteration overhead.
Each case in a subprocess (probe2 pattern)."""

import subprocess
import sys
import time

sys.path.insert(0, ".")

CASES = ["ablate"]


def _med(fn, reps=5, warmup=1):
    import numpy as np

    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def child(case):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import gmres
    from structurepreservingiterativesolvers_tpu.solvers.arnoldi import (
        arnoldi_step, init_state, lsq_coeffs,
    )

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    n = b.shape[0]
    k = 30
    print(f"n={n}", flush=True)

    # full gmres
    t = _med(lambda: gmres(A, b, k=k, tol=1e-50)[0].block_until_ready())
    print(f"gmres full          {t*1e3:8.2f} ms", flush=True)
    t = _med(lambda: gmres(A, b, k=k, tol=1e-50, true_residual=False)[0].block_until_ready())
    print(f"gmres est-residual  {t*1e3:8.2f} ms", flush=True)

    # arnoldi-only loop (with givens, no lsq/x/residual)
    @jax.jit
    def arnoldi_only(A, b):
        r0 = b
        beta = jnp.linalg.norm(r0)
        st = init_state(r0, beta, k)

        def body(j, st):
            st, _ = arnoldi_step(A, lambda v: v, st, j)
            return st

        st = lax.fori_loop(0, k, body, st)
        return st.H.sum()

    arnoldi_only(A, b).block_until_ready()
    t = _med(lambda: arnoldi_only(A, b).block_until_ready())
    print(f"arnoldi-only        {t*1e3:8.2f} ms", flush=True)

    # spmv + cgs2 only (no state writes, no givens)
    @jax.jit
    def bare(A, b):
        Q = jnp.zeros((k + 1, n), b.dtype).at[0].set(b)

        def body(j, carry):
            Q, w = carry
            w = A @ w
            h1 = Q @ w
            w = w - h1 @ Q
            h2 = Q @ w
            w = w - h2 @ Q
            nw = jnp.linalg.norm(w)
            Q = Q.at[j + 1].set(w / (nw + 1.0))
            return Q, w

        Q, w = lax.fori_loop(0, k, body, (Q, b))
        return w.sum()

    bare(A, b).block_until_ready()
    t = _med(lambda: bare(A, b).block_until_ready())
    print(f"bare spmv+cgs2      {t*1e3:8.2f} ms", flush=True)

    # spmv chain only
    @jax.jit
    def spmv_chain(A, b):
        def body(j, w):
            return A @ w

        return lax.fori_loop(0, k, body, b).sum()

    spmv_chain(A, b).block_until_ready()
    t = _med(lambda: spmv_chain(A, b).block_until_ready())
    print(f"spmv chain          {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(sys.argv[1])
    else:
        for case in CASES:
            print(f"=== {case} ===", flush=True)
            r = subprocess.run([sys.executable, __file__, case],
                               capture_output=True, text=True, timeout=560)
            tail = [ln for ln in (r.stdout + r.stderr).strip().splitlines()
                    if "WARN" not in ln and not ln.startswith("    @")]
            for line in tail[-12:]:
                print(line)
