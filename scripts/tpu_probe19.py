"""Bisect the Mosaic compile failure of ops/pallas_spmv.py on this toolchain.

Escalating kernels: copy → static lane roll → sublane-slice of a concat →
full DIA kernel. Each is tried independently; first failure names the
offending construct.
"""
import sys
sys.path.insert(0, ".")


def main():
    import warnings
    warnings.filterwarnings("ignore")
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES = 128
    Rb = 64  # sublanes per block
    H = 8
    grid_n = 4
    n2 = grid_n * Rb + H

    x2d = jnp.asarray(
        np.random.default_rng(0).standard_normal((n2, LANES)), jnp.float32)
    xmain = x2d[: grid_n * Rb]
    idx = (jnp.arange(grid_n)[:, None] + 1) * Rb + jnp.arange(H)[None, :]
    halo = x2d[jnp.clip(idx, 0, n2 - 1)]

    def run(name, kern, n_in=2):
        in_specs = [
            pl.BlockSpec((Rb, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [xmain]
        if n_in == 2:
            in_specs.append(pl.BlockSpec((1, H, LANES), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(halo)
        try:
            y = pl.pallas_call(
                kern,
                grid=(grid_n,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((Rb, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((grid_n * Rb, LANES),
                                               jnp.float32),
            )(*args)
            y.block_until_ready()
            print(f"{name:28s} OK", flush=True)
            return True
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{name:28s} FAIL {type(e).__name__}: {msg}", flush=True)
            return False

    def k_copy(x_ref, y_ref):
        y_ref[:] = x_ref[:] * 2.0

    run("copy", k_copy, n_in=1)

    def k_roll(x_ref, y_ref):
        y_ref[:] = pltpu.roll(x_ref[:], 5, 1)

    run("static lane roll", k_roll, n_in=1)

    def k_roll_traced(x_ref, y_ref):
        y_ref[:] = pltpu.roll(x_ref[:], jnp.asarray(5, jnp.int32), 1)

    run("traced-shift lane roll", k_roll_traced, n_in=1)

    def k_halo(x_ref, halo_ref, y_ref):
        y_ref[:] = x_ref[:] + halo_ref[0, :Rb % H + 1].sum() * 0.0

    run("halo read", k_halo)

    def k_concat(x_ref, halo_ref, y_ref):
        W = jnp.concatenate([x_ref[:], halo_ref[0]], axis=0)
        y_ref[:] = W[:Rb, :]

    run("concat + static slice", k_concat)

    def k_concat_shifted(x_ref, halo_ref, y_ref):
        W = jnp.concatenate([x_ref[:], halo_ref[0]], axis=0)
        y_ref[:] = W[1 : 1 + Rb, :]

    run("concat + offset slice", k_concat_shifted)

    def k_seam(x_ref, halo_ref, y_ref):
        W = jnp.concatenate([x_ref[:], halo_ref[0]], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Rb, LANES), 1)
        A = W[0:Rb, :]
        B = W[1 : 1 + Rb, :]
        r = 5
        sh = jnp.asarray(LANES - r, jnp.int32)
        rollA = pltpu.roll(A, sh, 1)
        rollB = pltpu.roll(B, sh, 1)
        y_ref[:] = jnp.where(lane < jnp.int32(LANES - r), rollA, rollB)

    run("full seam select", k_seam)

    # the real kernel on a tiny real system
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import (
        dia_spmv_pallas,
    )

    s = heat.linforms(M=64, dtype=jnp.float32)
    A = s.A
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(A.shape[0]), jnp.float32)
    try:
        y = dia_spmv_pallas(A, x, block_rows=1024)
        err = float(jnp.abs(y - A @ x).max())
        print(f"{'dia_spmv_pallas (M=64)':28s} OK err {err:.1e}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"{'dia_spmv_pallas (M=64)':28s} FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
