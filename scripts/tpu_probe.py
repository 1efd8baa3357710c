"""One-shot TPU probe: pallas support, cgmres mixed-precision cost, timings.
Run from repo root: python scripts/tpu_probe.py"""

import sys, time  # noqa: E401

sys.path.insert(0, ".")
import numpy as np


def t(label, fn, reps=3):
    t0 = time.perf_counter()
    r = fn()
    compile_t = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:28s} compile+1st {compile_t:7.2f}s   steady {np.median(ts)*1e3:9.2f} ms")
    return r


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())

    # 1. pallas basic
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k2(in_ref, out_ref):
            out_ref[:] = in_ref[:] * 2.0

        x = jnp.ones((256, 128), jnp.float32)
        y = pl.pallas_call(
            k2, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        print("pallas 2d basic: OK", float(y[0, 0]))
    except Exception as e:
        print("pallas 2d basic FAILED:", type(e).__name__, str(e)[:150])

    # 2. pallas DIA kernel (2-series)
    try:
        from structurepreservingiterativesolvers_tpu.models import heat
        from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import (
            dia_spmv_pallas,
        )

        s = heat.linforms(M=512)
        xv = jnp.asarray(np.random.default_rng(0).standard_normal(s.b.shape[0]),
                         s.b.dtype)
        fn = jax.jit(lambda A, x: dia_spmv_pallas(A, x, block_rows=16384))
        y1 = fn(s.A, xv).block_until_ready()
        y2 = jax.jit(lambda A, x: A @ x)(s.A, xv).block_until_ready()
        print("pallas DIA: OK, err", float(jnp.abs(y1 - y2).max()))
    except Exception as e:
        print("pallas DIA FAILED:", type(e).__name__, str(e)[:200])

    # 3. cgmres mixed vs pure-f32 cost (heat M=256)
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import cgmres, gmres

    s2 = heat.linforms(M=256)
    cons = s2.constraints()

    t("gmres k=30 f32", lambda: gmres(s2.A, s2.b, k=30, tol=1e-6)[0].block_until_ready())
    t("cgmres k=30 mixed", lambda: cgmres(s2.A, s2.b, k=30, tol=1e-6,
                                          constraints=cons)[0].block_until_ready())
    t("cgmres k=30 pure-f32", lambda: cgmres(s2.A, s2.b, k=30, tol=1e-6,
                                             constraints=cons, mixed=False)[0].block_until_ready())


if __name__ == "__main__":
    main()
