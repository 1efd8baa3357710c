"""Probe 20: Pallas DIA SpMV vs XLA roll chain on the real chip.

Chained in-program timing (dependent SpMVs) at heat M=1024 — the bench
headline config.  Also checks numeric parity on device.
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat

    print("backend:", jax.default_backend(), flush=True)
    # health check
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          time.perf_counter() - t0, flush=True)

    s = heat.linforms(M=1024, N=100)
    A, b = s.A, s.b
    nnz = s.A_csr.nnz
    n = b.shape[0]
    print("n", n, "nnz", nnz, "offsets", A.offsets, "wrap", A.wrap, flush=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), b.dtype)

    # parity on device
    Ax = dataclasses.replace(A, engine="xla")
    Ap = dataclasses.replace(A, engine="pallas")
    y_x = jax.jit(lambda A_, v: A_ @ v)(Ax, x)
    y_p = jax.jit(lambda A_, v: A_ @ v)(Ap, x)
    err = float(jnp.max(jnp.abs(y_x - y_p)) / jnp.max(jnp.abs(y_x)))
    print("rel err pallas vs xla:", err, flush=True)

    def chained(A_op, reps=100, outer=5):
        @jax.jit
        def chain(v):
            return lax.fori_loop(0, reps, lambda i, w: A_op @ (w / (i + 1.0)), v)

        chain(x).block_until_ready()
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            chain(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / reps

    for name, A_op in [("xla", Ax), ("pallas", Ap)]:
        t = chained(A_op)
        print(f"{name}: {t*1e3:.4f} ms  {nnz/t/1e9:.1f} GNNZ/s  "
              f"{(nnz+2*n)*4/t/1e9:.0f} GB/s ideal-traffic", flush=True)

    # block size sweep for the pallas kernel
    from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import (
        dia_spmv_pallas,
    )

    for br in (4096, 8192, 16384, 32768, 65536):
        def mk(reps, br=br):
            @jax.jit
            def chain(v):
                return lax.fori_loop(
                    0, reps,
                    lambda i, w: dia_spmv_pallas(A, w / (i + 1.0), block_rows=br),
                    v,
                )
            return chain

        c = mk(100)
        c(x).block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            c(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) / 100
        print(f"pallas br={br}: {t*1e3:.4f} ms  {nnz/t/1e9:.1f} GNNZ/s", flush=True)


if __name__ == "__main__":
    main()
