"""Bisect Pallas DIA kernel failure + time cgmres variants. Each case runs in
a subprocess so a native abort doesn't kill the sweep.
Usage: python scripts/tpu_probe2.py            (parent: runs all cases)
       python scripts/tpu_probe2.py CASE       (child)
"""

import subprocess
import sys
import time

sys.path.insert(0, ".")

CASES = ["dia_small", "spmv_speed", "cgmres_time"]


def child(case):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if case == "dma_1d":
        def kern(x_hbm, o_ref, scratch, sem):
            i = pl.program_id(0)
            dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * 256, 384)], scratch, sem)
            dma.start()
            dma.wait()
            o_ref[:] = scratch[pl.ds(0, 256)] * 2.0

        x = jnp.arange(1024 + 128, dtype=jnp.float32)
        y = pl.pallas_call(
            kern, grid=(4,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((256,), lambda i: (i,), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1024,), jnp.float32),
            scratch_shapes=[pltpu.VMEM((384,), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(x)
        print("dma_1d OK", float(y[0]), float(y[300]))

    elif case == "slice_unaligned":
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[pl.ds(3, 256)] + x_ref[pl.ds(77, 256)]

        x = jnp.arange(512, dtype=jnp.float32)
        y = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256,), jnp.float32),
        )(x)
        print("slice_unaligned OK", float(y[0]))

    elif case == "dia_small":
        from structurepreservingiterativesolvers_tpu.models import heat
        from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import dia_spmv_pallas

        s = heat.linforms(M=128)
        xv = jnp.asarray(np.random.default_rng(0).standard_normal(s.b.shape[0]), s.b.dtype)
        y1 = dia_spmv_pallas(s.A, xv, block_rows=8192)
        y2 = s.A @ xv
        print("dia_small OK err", float(jnp.abs(y1 - y2).max()))

    elif case == "spmv_speed":
        from structurepreservingiterativesolvers_tpu.models import heat
        from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import dia_spmv_pallas

        s = heat.linforms(M=1024)
        nnz = s.A_csr.nnz
        xv = jnp.asarray(np.random.default_rng(0).standard_normal(s.b.shape[0]), s.b.dtype)
        roll = jax.jit(lambda A, x: A @ x)
        roll(s.A, xv).block_until_ready()
        for R in (16384, 65536, 262144):
            fn = jax.jit(lambda A, x, R=R: dia_spmv_pallas(A, x, block_rows=R))
            y = fn(s.A, xv).block_until_ready()
            err = float(jnp.abs(y - roll(s.A, xv)).max())
            ts = []
            for _ in range(15):
                t0 = time.perf_counter(); fn(s.A, xv).block_until_ready()
                ts.append(time.perf_counter() - t0)
            tm = float(np.median(ts))
            print(f"pallas R={R}: {tm*1e6:.1f}us {nnz/tm/1e9:.2f} GNNZ/s err {err:.1e}", flush=True)
        ts = []
        for _ in range(15):
            t0 = time.perf_counter(); roll(s.A, xv).block_until_ready()
            ts.append(time.perf_counter() - t0)
        tm = float(np.median(ts))
        print(f"roll: {tm*1e6:.1f}us {nnz/tm/1e9:.2f} GNNZ/s", flush=True)

    elif case == "cgmres_time":
        from structurepreservingiterativesolvers_tpu.models import heat
        from structurepreservingiterativesolvers_tpu.solvers import cgmres, gmres

        s2 = heat.linforms(M=256)
        cons = s2.constraints()
        for label, fn in [
            ("gmres", lambda: gmres(s2.A, s2.b, k=30, tol=1e-6)[0].block_until_ready()),
            ("cgmres-mixed", lambda: cgmres(s2.A, s2.b, k=30, tol=1e-6, constraints=cons)[0].block_until_ready()),
            ("cgmres-f32", lambda: cgmres(s2.A, s2.b, k=30, tol=1e-6, constraints=cons, mixed=False)[0].block_until_ready()),
        ]:
            t0 = time.perf_counter(); fn(); tc = time.perf_counter() - t0
            t0 = time.perf_counter(); fn(); tr = time.perf_counter() - t0
            print(f"{label}: compile+1st {tc:.1f}s steady {tr*1e3:.1f}ms", flush=True)


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
            for line in tail[-14:]:
                print(line)
