"""Probe 26: where does the CGMRES-over-GMRES overhead live now?

heat M=256, cheb8, k=30, tol=1e-6 (the VERDICT target config; round-2
measured 14.8 ms cgmres vs 5.7 ms gmres).  Variants (chained in-program,
probe15-18 discipline — thread outputs or XLA DCEs the work):

  gmres          — ratio denominator
  cgmres         — shipped mixed-mode core
  cgmres_nokkt   — constrained_lsq monkeypatched to return the warm start
                   (keeps gating, catch-up, increments; isolates KKT cost)
  cgmres_nodd    — dd reduction disabled in update/catchup (f32 products
                   promoted to f64 targets; isolates dd arithmetic cost)
  kkt_cold/warm  — standalone constrained_lsq chained, with and without the
                   Kinv warm start (per-call KKT cost)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chained(make_chain, x, reps, outer=3):
    c = make_chain(reps)
    c(x).block_until_ready()
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        c(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    from structurepreservingiterativesolvers_tpu import precond
    from structurepreservingiterativesolvers_tpu.models import heat
    import importlib

    cgm = importlib.import_module(
        "structurepreservingiterativesolvers_tpu.solvers.cgmres")
    kktmod = importlib.import_module(
        "structurepreservingiterativesolvers_tpu.solvers.kkt")
    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core as _g_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    s = heat.linforms(M=256, N=100)
    cons = tuple(s.constraints())
    pre = precond.chebyshev(s.A, degree=8)
    dt = s.b.dtype
    k = 30
    tol_d, contol_d, ctol_d = (dscalar(1e-6, dt), dscalar(10.0, dt),
                               dscalar(1e-12, dt))

    def cg_chain_factory(core):
        def make(reps):
            @jax.jit
            def chain(b):
                def body(i, acc):
                    out = core(s.A, b * (1.0 + 1e-12 * acc[0]), None, cons,
                               tol_d, contol_d, ctol_d, pre)
                    return out.x + 0.0 * (out.deviation + out.res[0])
                return lax.fori_loop(0, reps, body, jnp.zeros_like(b))
            return chain
        return make

    def build(mixed=True, snap=False, f32_reduce=False):
        cgm._build_core.cache_clear()
        return cgm._build_core(k, len(cons), None, False, False, mixed,
                               ("q",) * len(cons), "cgs2", True, "while",
                               snap, f32_reduce)

    # --- baseline ---------------------------------------------------------
    core = build()
    out = jax.jit(lambda: core(s.A, s.b, None, cons, tol_d, contol_d,
                               ctol_d, pre))()
    print("steps", int(out.steps), "ncon", int(out.constrained_steps),
          "safety", int(out.safety), "dev", float(out.deviation),
          "kkt_iters", int(out.kkt_iters), flush=True)
    t_cg = chained(cg_chain_factory(core), s.b, 20)
    print(f"cgmres mixed:   {t_cg*1e3:.2f} ms", flush=True)

    core_snap = build(snap=True)
    t_cgs = chained(cg_chain_factory(core_snap), s.b, 20)
    print(f"cgmres mixed+snap: {t_cgs*1e3:.2f} ms  (projection epilogue "
          f"≈ {max(t_cgs - t_cg, 0.0)*1e3:.2f} ms)", flush=True)

    core_sf = build(snap=True, f32_reduce=True)
    out_sf = jax.jit(lambda: core_sf(s.A, s.b, None, cons, tol_d, contol_d,
                                     ctol_d, pre))()
    print("snap-first: steps", int(out_sf.steps), "ncon",
          int(out_sf.constrained_steps), "safety", int(out_sf.safety),
          "dev", float(out_sf.deviation), flush=True)
    t_sf = chained(cg_chain_factory(core_sf), s.b, 20)
    print(f"cgmres snap-first (f32 reduce): {t_sf*1e3:.2f} ms", flush=True)

    gcore = _g_core(k, None, False, True, "cgs2", "while")

    def g_make(reps):
        @jax.jit
        def chain(b):
            def body(i, acc):
                o = gcore(s.A, b * (1.0 + 1e-12 * acc[0]), None, tol_d, pre)
                return o.x + 0.0 * o.res[0]
            return lax.fori_loop(0, reps, body, jnp.zeros_like(b))
        return chain

    t_g = chained(g_make, s.b, 20)
    print(f"gmres:          {t_g*1e3:.2f} ms   ratio {t_cg/t_g:.2f}",
          flush=True)

    # --- no-KKT variant ---------------------------------------------------
    real_kkt = cgm.constrained_lsq

    def fake_kkt(H, beta, bufs, y0, active, con_mask, kkt_tol=None,
                 lam_ws=None, Kinv_ws=None, have_ws=None, **kw):
        m = len(bufs)
        return kktmod.KKTResult(
            y=y0, lam=jnp.zeros((m,), H.dtype),
            deviation=jnp.asarray(0.0, H.dtype),
            scale=jnp.asarray(1.0, H.dtype),
            kkt_norm=jnp.asarray(0.0, H.dtype),
            iters=jnp.int32(0),
            Kinv=jnp.zeros((H.shape[1] + m, H.shape[1] + m), H.dtype),
            refacts=jnp.int32(0),
        )

    cgm.constrained_lsq = fake_kkt
    try:
        core_nokkt = build()
        t_nokkt = chained(cg_chain_factory(core_nokkt), s.b, 20)
    finally:
        cgm.constrained_lsq = real_kkt
        cgm._build_core.cache_clear()
    print(f"cgmres no-KKT:  {t_nokkt*1e3:.2f} ms  (KKT total ≈ "
          f"{(t_cg-t_nokkt)*1e3:.2f} ms)", flush=True)

    # --- no-dd variant ----------------------------------------------------
    from structurepreservingiterativesolvers_tpu.constraints import (
        quadratic as quad,
    )

    real_up, real_cu = cgm.update_buffers, cgm.catchup_buffers

    def up_nodd(c, bf, Z, x0, j, x0_zero=False, **kw):
        return real_up(c, bf, Z, x0, j, x0_zero=x0_zero, dd_reduce=False)

    def cu_nodd(c, bf, Z, x0, x0_zero=False, **kw):
        return real_cu(c, bf, Z, x0, x0_zero=x0_zero, dd_reduce=False)

    cgm.update_buffers, cgm.catchup_buffers = up_nodd, cu_nodd
    try:
        core_nodd = build()
        t_nodd = chained(cg_chain_factory(core_nodd), s.b, 20)
    finally:
        cgm.update_buffers, cgm.catchup_buffers = real_up, real_cu
        cgm._build_core.cache_clear()
    print(f"cgmres no-dd:   {t_nodd*1e3:.2f} ms  (dd arith ≈ "
          f"{(t_cg-t_nodd)*1e3:.2f} ms)", flush=True)

    # --- standalone KKT cost ---------------------------------------------
    from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
        catchup_buffers,
        init_buffers,
    )

    cdtype = jnp.dtype("float64")
    x0c = jnp.zeros_like(s.b)
    rng = np.random.default_rng(0)
    Z = jnp.asarray(rng.standard_normal((k, s.b.shape[0])), dt)
    bufs = tuple(
        catchup_buffers(c, init_buffers(c, x0c, k, cdtype, x0_zero=True,
                                        dd_value=True),
                        Z, x0c, x0_zero=True, dd_reduce=True)
        for c in cons
    )
    H = jnp.asarray(rng.standard_normal((k + 1, k)), cdtype) * 0.1 \
        + jnp.eye(k + 1, k, dtype=cdtype)
    beta = jnp.asarray(1.0, cdtype)
    active = jnp.ones((k,), bool)
    con_mask = jnp.ones((len(cons),), cdtype)

    def kkt_make_cold(reps):
        @jax.jit
        def chain(H):
            def body(i, acc):
                r = real_kkt(H * (1.0 + 1e-13 * acc[0, 0]), beta, bufs,
                             jnp.zeros((k,), cdtype), active, con_mask)
                return H + 0.0 * (r.y[0] + r.Kinv[0, 0])
            return lax.fori_loop(0, reps, body, H)
        return lambda: chain(H).block_until_ready()

    def run_chain(fn, reps=20, outer=3):
        c = fn(reps)
        c()
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            c()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / reps

    t_cold = run_chain(lambda reps: kkt_make_cold(reps))
    print(f"kkt cold (factor+newton): {t_cold*1e3:.2f} ms", flush=True)

    r0 = jax.jit(lambda: real_kkt(H, beta, bufs, jnp.zeros((k,), cdtype),
                                  active, con_mask))()
    Kinv0 = r0.Kinv
    lam0 = r0.lam

    def kkt_make_warm(reps):
        @jax.jit
        def chain(H):
            def body(i, acc):
                r = real_kkt(H * (1.0 + 1e-13 * acc[0, 0]), beta, bufs,
                             r0.y, active, con_mask,
                             lam_ws=lam0, Kinv_ws=Kinv0,
                             have_ws=jnp.bool_(True))
                return H + 0.0 * (r.y[0] + r.Kinv[0, 0])
            return lax.fori_loop(0, reps, body, H)
        return lambda: chain(H).block_until_ready()

    t_warm = run_chain(kkt_make_warm)
    print(f"kkt warm (newton only):   {t_warm*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
