"""Probe 32 (round 5): decompose the heat M=2048 constrained cost.

Round-4's TimedSolve showed CGMRES 0.803 s vs GMRES 0.392 s at M=2048
(+411 ms), while probe31 at M=1024 finds the chained in-program cores at
59.6 vs 50.4 ms (1.18×) with snap = 7.6 ms of the 9.3 ms overhead.  This
probe repeats the decomposition at the flagship size to find whether an
n-scaled term appears at 4.2M rows (HBM pressure, snap ladder, dd eval)
or the +411 ms was dispatch/window artifact of the wall-clock method.

Usage: python scripts/tpu_probe32.py [M]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import subprocess

    for attempt in range(8):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))"],
                capture_output=True, timeout=180,
            )
            if r.returncode == 0:
                break
        except subprocess.TimeoutExpired:
            pass
        print(f"health probe attempt {attempt + 1} failed; retrying",
              flush=True)
        time.sleep(15)

    import jax
    import jax.numpy as jnp
    from jax import lax

    print("backend:", jax.default_backend(), flush=True)
    from structurepreservingiterativesolvers_tpu import config as _cfg
    _cfg.enable_compile_cache()
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    import importlib

    cgm = importlib.import_module(
        "structurepreservingiterativesolvers_tpu.solvers.cgmres")
    from structurepreservingiterativesolvers_tpu.constraints import (
        projection as P,
    )
    from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
        dd_constraint_value,
    )
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops import dd as _dd
    from structurepreservingiterativesolvers_tpu.precond.amg import amg
    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core as _g_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    k = 20
    t0 = time.perf_counter()
    s = heat.linforms(M=M, N=100)
    print(f"assembly: {time.perf_counter()-t0:.1f}s", flush=True)
    cons = tuple(s.constraints())
    dt = s.b.dtype
    t0 = time.perf_counter()
    pre = amg(s.A, dtype=dt, grid=(M + 1, M + 1))
    jax.block_until_ready(pre.coarse_inv)
    print(f"AMG device setup (incl compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    pre = amg(s.A, dtype=dt, grid=(M + 1, M + 1))
    jax.block_until_ready(pre.coarse_inv)
    print(f"AMG device setup (warm): {time.perf_counter()-t0:.2f}s",
          flush=True)
    tol_d, contol_d, ctol_d = (dscalar(1e-7, dt), dscalar(10.0, dt),
                               dscalar(1e-12, dt))

    def chained(fn, x, *ops, reps=10, outer=3):
        # big operands (A, pre, constraints) are passed as jit ARGUMENTS:
        # closed-over arrays become HLO constants and the remote-compile
        # request at M=2048 exceeds the tunnel's body limit (HTTP 413)
        @jax.jit
        def chain(v0, ops):
            def body(i, acc):
                out = fn(acc, *ops)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return acc + 1e-20 * jnp.ravel(leaf)[:1].astype(acc.dtype)
            return lax.fori_loop(0, reps, body, v0)
        chain(x, ops).block_until_ready()
        ts = []
        for _ in range(outer):
            t1 = time.perf_counter()
            chain(x, ops).block_until_ready()
            ts.append(time.perf_counter() - t1)
        return float(np.median(ts)) / reps

    gcore = _g_core(k, None, False, True, "cgs2", "while")
    t_g = chained(lambda b, A, pr: gcore(A, b, None, tol_d, pr).x,
                  s.b, s.A, pre, reps=5)
    print(f"gmres core:           {t_g*1e3:8.2f} ms", flush=True)

    def build(m, snap, f32r):
        cgm._build_core.cache_clear()
        return cgm._build_core(k, m, None, False, False, True,
                               ("q",) * m, "cgs2", True, "while", snap, f32r)

    for label, m, snap, f32r in (
        ("cgmres snap-first", 2, True, True),
        ("cgmres m=0", 0, False, False),
    ):
        core = build(m, snap, f32r)
        cc = cons[:m]
        t = chained(lambda b, A, pr, cc, core=core: core(
            A, b, None, cc, tol_d, contol_d, ctol_d, pr).x,
            s.b, s.A, pre, cc, reps=5)
        print(f"{label:21s} {t*1e3:8.2f} ms", flush=True)

    x = s.z0 + 1e-4 * jnp.asarray(
        np.random.default_rng(0).standard_normal(s.b.shape[0]), dt)
    t = chained(lambda v, cc: P.snap(v, cc)[0], x, cons, reps=5)
    print(f"snap standalone:      {t*1e3:8.2f} ms", flush=True)

    t = chained(lambda v, c1: dd_constraint_value(
        c1, _dd.from_f32(v)).astype(dt), x, cons[1], reps=10)
    print(f"one dd energy eval:   {t*1e3:8.2f} ms", flush=True)

    # single-dispatch walls for comparison with the TimedSolve method
    def med_wall(fn, reps=5):
        fn()  # warm
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t1)
        return float(np.median(ts))

    w_g = med_wall(lambda: jax.block_until_ready(
        gcore(s.A, s.b, None, tol_d, pre).x))
    core_c = build(2, True, True)
    w_c = med_wall(lambda: jax.block_until_ready(
        core_c(s.A, s.b, None, cons, tol_d, contol_d, ctol_d, pre).x))
    print(f"single-dispatch wall: gmres {w_g*1e3:8.2f} ms   "
          f"cgmres {w_c*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
