"""Probe 21: minimal Pallas dia_spmv compile on the real chip (Mosaic i64
index-map legalization).  Small n to keep tunnel compile time down."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    import scipy.sparse as sp

    from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import (
        dia_spmv_pallas,
    )
    from structurepreservingiterativesolvers_tpu.ops.sparse import (
        dia_from_scipy,
        dia_spmv,
    )

    n = 128 * 512  # 65536
    offs = (-130, -1, 0, 1, 130)
    rng = np.random.default_rng(0)
    rows, cols, vals = [], [], []
    for off in offs:
        i = np.arange(n)
        j = i + off
        m = (j >= 0) & (j < n)
        rows.append(i[m]); cols.append(j[m]); vals.append(rng.standard_normal(m.sum()))
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    Ad = dia_from_scipy(A, wrap=False, dtype=np.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    t0 = time.perf_counter()
    y = dia_spmv_pallas(Ad, x, block_rows=16384)
    y.block_until_ready()
    print("pallas compile+run:", f"{time.perf_counter()-t0:.1f}s", flush=True)
    y_ref = jax.jit(lambda: dia_spmv(Ad, x))()
    err = float(jnp.max(jnp.abs(y - y_ref)))
    print("abs err:", err, flush=True)
    assert err < 1e-3


if __name__ == "__main__":
    main()
