"""Compare DIA SpMV implementations on the current backend (TPU)."""

import time

import numpy as np


def med(fn, reps=20, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops import sparse
    from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import dia_spmv_pallas

    s = heat.linforms(M=1024)
    A = s.A
    nnz = s.A_csr.nnz
    n = s.b.shape[0]
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), s.b.dtype)
    print("backend", jax.default_backend(), "dtype", x.dtype, "n", n, "nnz", nnz,
          "ndiag", len(A.offsets))

    def roll_spmv(A, x):
        y = jnp.zeros(A.shape[0], jnp.result_type(A.data, x))
        for d, off in enumerate(A.offsets):
            y = y + A.data[d] * sparse._shift(x, off, A.wrap)
        return y

    variants = {
        "roll": jax.jit(roll_spmv),
        "padded-slice": jax.jit(sparse.dia_spmv),
    }
    for name, fn in variants.items():
        fn(A, x).block_until_ready()
        t = med(lambda: fn(A, x).block_until_ready())
        print(f"{name:14s} {t*1e6:9.1f} us   {nnz/t/1e9:8.2f} GNNZ/s")

    for R in (8192, 16384, 32768, 65536):
        fn = jax.jit(lambda A, x, R=R: dia_spmv_pallas(A, x, block_rows=R))
        try:
            y = fn(A, x).block_until_ready()
            err = float(jnp.abs(y - variants["roll"](A, x)).max())
            t = med(lambda: fn(A, x).block_until_ready())
            print(f"pallas R={R:6d} {t*1e6:9.1f} us   {nnz/t/1e9:8.2f} GNNZ/s  err {err:.1e}")
        except Exception as e:
            print(f"pallas R={R}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
