"""Bisect Mosaic features used by the DIA kernel. Each case in a subprocess."""

import subprocess
import sys

sys.path.insert(0, ".")

CASES = ["concat2d", "block3d", "roll_static", "roll_traced", "halo_lead1"]


def child(case):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Rb, L = 64, 128

    if case == "concat2d":
        def kern(x_ref, h_ref, o_ref):
            W = jnp.concatenate([x_ref[:], h_ref[:]], axis=0)
            o_ref[:] = W[:Rb] + W[8:Rb + 8]

        x = jnp.ones((Rb, L), jnp.float32)
        h = jnp.ones((8, L), jnp.float32)
        y = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Rb, L), jnp.float32),
        )(x, h)
        print("concat2d OK", float(y[0, 0]))

    elif case == "block3d":
        def kern(d_ref, o_ref):
            o_ref[:] = d_ref[0] + d_ref[1] * 2.0

        d = jnp.ones((2, Rb, L), jnp.float32)
        y = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((2, Rb, L), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Rb, L), jnp.float32),
        )(d)
        print("block3d OK", float(y[0, 0]))

    elif case == "roll_static":
        def kern(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], 5, 1)

        x = jnp.ones((Rb, L), jnp.float32)
        y = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Rb, L), jnp.float32),
        )(x)
        print("roll_static OK", float(y[0, 0]))

    elif case == "roll_traced":
        def kern(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], jnp.asarray(5, jnp.int32), 1)

        x = jnp.ones((Rb, L), jnp.float32)
        y = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Rb, L), jnp.float32),
        )(x)
        print("roll_traced OK", float(y[0, 0]))

    elif case == "halo_lead1":
        def kern(h_ref, o_ref):
            o_ref[:] = h_ref[0] * 2.0

        h = jnp.ones((4, 8, L), jnp.float32)
        y = pl.pallas_call(
            kern,
            grid=(4,),
            in_specs=[pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
        )(h)
        print("halo_lead1 OK", float(y[0, 0]))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(sys.argv[1])
    else:
        for case in CASES:
            r = subprocess.run([sys.executable, __file__, case],
                               capture_output=True, text=True, timeout=560)
            tail = [ln for ln in (r.stdout + r.stderr).strip().splitlines()
                    if "WARN" not in ln and not ln.startswith("    @")]
            ok = [ln for ln in tail if " OK " in ln or ln.endswith("OK")]
            if ok:
                print(ok[-1], flush=True)
            else:
                err = [ln for ln in tail if "rror" in ln][-2:]
                print(f"{case} FAILED:", *err, sep="\n  ", flush=True)
