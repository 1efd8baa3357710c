"""Compare DIA SpMV implementations on the current backend (TPU).

Chained in-program timing (dependent SpMVs inside one jitted fori_loop) —
repeated identical dispatches are cached/elided through the axon tunnel
(scripts/tpu_probe13.py), so per-dispatch medians are meaningless.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chained_time(make_chain, reps_inner=100, reps_outer=3):
    chain = make_chain(reps_inner)
    chain()
    ts = []
    for _ in range(reps_outer):
        t0 = time.perf_counter()
        chain()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / reps_inner


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops import sparse
    from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import dia_spmv_pallas

    s = heat.linforms(M=1024)
    A = s.A
    nnz = s.A_csr.nnz
    n = s.b.shape[0]
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), s.b.dtype)
    print("backend", jax.default_backend(), "dtype", x.dtype, "n", n, "nnz",
          nnz, "ndiag", len(A.offsets), flush=True)

    def roll_spmv(A, x):
        y = jnp.zeros(A.shape[0], jnp.result_type(A.data, x))
        for d, off in enumerate(A.offsets):
            y = y + A.data[d] * sparse._shift(x, off, A.wrap)
        return y

    def make_chain(spmv):
        def mk(reps):
            @jax.jit
            def chain(x):
                # dependent: each output feeds the next input (scaled to stay
                # finite); nothing can be elided or batched
                def body(i, v):
                    return spmv(A, v) / (1.0 + jnp.abs(v[0]))
                return lax.fori_loop(0, reps, body, x)
            return lambda: chain(x).block_until_ready()
        return mk

    variants = {
        "roll": roll_spmv,
        "dia_spmv (pkg)": sparse.dia_spmv,
    }
    for name, fn in variants.items():
        t = chained_time(make_chain(fn))
        print(f"{name:16s} {t*1e6:9.1f} us   {nnz/t/1e9:8.2f} GNNZ/s",
              flush=True)

    yref = jax.jit(roll_spmv)(A, x).block_until_ready()
    for R in (8192, 16384, 32768, 65536):
        fn = lambda A, x, R=R: dia_spmv_pallas(A, x, block_rows=R)
        try:
            y = jax.jit(fn)(A, x).block_until_ready()
            err = float(jnp.abs(y - yref).max())
            t = chained_time(make_chain(fn))
            print(f"pallas R={R:6d}   {t*1e6:9.1f} us   {nnz/t/1e9:8.2f} "
                  f"GNNZ/s  err {err:.1e}", flush=True)
        except Exception as e:
            print(f"pallas R={R}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
