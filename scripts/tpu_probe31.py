"""Probe 31: decompose the heat M=1024 constrained-phase cost (~95 ms for
ONE constrained iteration in the TimedSolve rows — snap v2 did not move it,
so the epilogue is not the story).

Chained in-program timings at n=1.05M, f32, structured AMG, k=20:
  gmres core            — denominator
  cgmres snap-first     — production
  cgmres snap=False     — isolates the projection epilogue
  cgmres m=0            — isolates ALL constraint machinery
  snap standalone       — the epilogue alone
  dd eval standalone    — one full dd constraint evaluation
  catchup f32           — the phase-entry reduction
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("backend:", jax.default_backend(), flush=True)
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
        catchup_buffers,
        dd_constraint_value,
        init_buffers,
    )
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops import dd as _dd
    from structurepreservingiterativesolvers_tpu.precond.amg import amg
    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core as _g_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    M = 1024
    k = 20
    s = heat.linforms(M=M, N=100)
    cons = tuple(s.constraints())
    dt = s.b.dtype
    pre = amg(s.A_csr, dtype=dt, grid=(M + 1, M + 1))
    tol_d, contol_d, ctol_d = (dscalar(1e-7, dt), dscalar(10.0, dt),
                               dscalar(1e-12, dt))

    def chained(fn, x, reps=10, outer=3):
        @jax.jit
        def chain(v0):
            def body(i, acc):
                out = fn(acc)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return acc + 1e-20 * jnp.ravel(leaf)[:1].astype(acc.dtype)
            return lax.fori_loop(0, reps, body, v0)
        chain(x).block_until_ready()
        ts = []
        for _ in range(outer):
            t1 = time.perf_counter()
            chain(x).block_until_ready()
            ts.append(time.perf_counter() - t1)
        return float(np.median(ts)) / reps

    gcore = _g_core(k, None, False, True, "cgs2", "while")
    t_g = chained(lambda b: gcore(s.A, b, None, tol_d, pre).x, s.b)
    print(f"gmres core:           {t_g*1e3:8.2f} ms", flush=True)

    def build(m, snap, f32r):
        cgm._build_core.cache_clear()
        return cgm._build_core(k, m, None, False, False, True,
                               ("q",) * m, "cgs2", True, "while", snap, f32r)

    for label, m, snap, f32r in (
        ("cgmres snap-first", 2, True, True),
        ("cgmres snap=False dd", 2, False, False),
        ("cgmres m=0", 0, False, False),
    ):
        core = build(m, snap, f32r)
        cc = cons[:m]
        t = chained(lambda b, core=core, cc=cc: core(
            s.A, b, None, cc, tol_d, contol_d, ctol_d, pre).x, s.b)
        print(f"{label:21s} {t*1e3:8.2f} ms", flush=True)

    x = s.z0 + 1e-4 * jnp.asarray(
        np.random.default_rng(0).standard_normal(s.b.shape[0]), dt)
    t = chained(lambda v: P.snap(v, cons)[0], x, reps=5)
    print(f"snap standalone:      {t*1e3:8.2f} ms", flush=True)

    t = chained(lambda v: dd_constraint_value(
        cons[1], _dd.from_f32(v)).astype(dt), x, reps=20)
    print(f"one dd energy eval:   {t*1e3:8.2f} ms", flush=True)

    rng = np.random.default_rng(1)
    Z = jnp.asarray(rng.standard_normal((k, s.b.shape[0])), dt)
    x0c = jnp.zeros_like(s.b)
    cdtype = jnp.dtype("float64")

    def cu(Zv):
        bufs = tuple(
            init_buffers(c, x0c, k, cdtype, x0_zero=True, dd_value=True)
            for c in cons)
        out = tuple(
            catchup_buffers(c, bf, Zv, x0c, x0_zero=True, f32_reduce=True)
            for c, bf in zip(cons, bufs))
        return sum(b.T2[0, 0] for b in out).astype(dt)

    t = chained(lambda v: cu(Z * (1.0 + 1e-12 * v[0])), s.b, reps=10)
    print(f"catchup f32 (k=20):   {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
