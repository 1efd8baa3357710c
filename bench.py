"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: sparse SpMV throughput (effective nnz/s) of the framework's
production dispatch on the heat-problem operator, the op that dominates every
Krylov iteration (reference hot loop: ``A @ z`` in solvers.py:95,191,370).
Three engines are measured and reported: the XLA roll chain, the Pallas DIA
kernel, and the matrix-free constant-stencil kernel (``ops/stencil.py``) that
production assembly now dispatches to for structured operators.
``vs_baseline`` compares against scipy CSR SpMV on the host CPU — the engine
the reference actually runs on.  Extra fields report CGMRES time-to-solution
and the invariant-deviation gain vs GMRES at equal budget (the reference's
quality bar, heat/TimedSolve.py:75-80).

TPU availability: the axon tunnel can wedge (even a trivial matmul hangs) and
its *first* device discovery alone can take >2 minutes, so the health probe
retries with backoff for up to ~12 minutes before falling back.  A fallback
is NEVER silent: the output carries ``"tpu_unavailable": true`` at top level
and a distinct metric name, so a CPU number can't masquerade as the round's
TPU result (this exact failure produced BENCH_r02).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _median_time(fn, reps=10, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _chained_time(make_chain, reps_inner, reps_outer=5):
    """(median, best) per-op time of ``reps_inner`` *dependent* ops inside
    ONE compiled program.  Repeated identical dispatches of a single program
    are cached/elided somewhere in the axon tunnel stack
    (scripts/tpu_probe13.py), so only chained in-program measurements
    reflect real device time.  The median is the headline; the best is what
    roofline fractions are measured against (the sustained-bandwidth
    ceiling, free of per-window tunnel jitter)."""
    chain = make_chain(reps_inner)
    chain()  # compile
    ts = []
    for _ in range(reps_outer):
        t0 = time.perf_counter()
        chain()
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) / reps_inner,
            float(np.min(ts)) / reps_inner)


def _probe_once(timeout_s: float) -> bool:
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))"],
            capture_output=True, timeout=timeout_s,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _backend_healthy(total_budget_s: float = 1500.0):
    """Probe the default backend with retry + backoff.

    First tunnel contact can spend >130 s in device discovery alone, and
    wedged windows of up to ~17 minutes have been observed to recover
    (probe28: health matmul completed after 1008 s) — so each attempt gets
    a generous timeout and a failed attempt is retried until the total
    budget is spent.  Returns (healthy, attempts, elapsed_s)."""
    t0 = time.time()
    attempts = 0
    while time.time() - t0 < total_budget_s:
        attempts += 1
        remaining = total_budget_s - (time.time() - t0)
        if _probe_once(timeout_s=max(60.0, min(600.0, remaining))):
            return True, attempts, time.time() - t0
        time.sleep(min(30.0, 5.0 * attempts))
    return False, attempts, time.time() - t0


def main():
    import os

    healthy, probe_attempts, probe_s = _backend_healthy()
    tpu_unavailable = not healthy
    if tpu_unavailable:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops.stencil import Stencil, as_dia
    from structurepreservingiterativesolvers_tpu.solvers import cgmres, gmres

    on_accel = jax.default_backend() != "cpu"
    if on_accel:
        # persistent compile cache: remote compiles are 1-4 min/program
        from structurepreservingiterativesolvers_tpu import config as _cfg

        _cfg.enable_compile_cache()
    M = 1024 if on_accel else 512  # keep the CPU-fallback path bounded
    sys_ = heat.linforms(M=M, N=100)
    A, b = sys_.A, sys_.b
    A_dia = as_dia(A)
    nnz = sys_.A_csr.nnz
    x = jnp.asarray(np.random.default_rng(0).standard_normal(b.shape[0]), b.dtype)

    def make_spmv_chain(A_op):
        def make(reps):
            @jax.jit
            def chain(x):
                # dependent SpMVs: each feeds the next, nothing can be elided
                return lax.fori_loop(0, reps, lambda i, v: A_op @ (v / (i + 1.0)), x)
            return lambda: chain(x).block_until_ready()
        return make

    # 1000 chained reps: at 100 reps the ~30 ms per-dispatch RPC floor of the
    # axon tunnel contributes ~0.3 ms/rep and the "SpMV time" is pure
    # artifact (this is what made BENCH_r01 report 25 GNNZ/s; probe24)
    reps = 1000 if on_accel else 20
    t_xla, t_xla_best = _chained_time(
        make_spmv_chain(dataclasses.replace(A_dia, engine="xla")),
        reps_inner=reps)
    if on_accel:
        t_pallas, t_pallas_best = _chained_time(
            make_spmv_chain(dataclasses.replace(A_dia, engine="pallas")),
            reps_inner=reps,
        )
    else:
        t_pallas = t_pallas_best = float("inf")  # interpret mode: no data
    # production dispatch: the assembled operator itself (Stencil on
    # structured problems — matrix-free constant part, ~2n HBM traffic)
    t_prod, t_prod_best = _chained_time(make_spmv_chain(A), reps_inner=reps)
    is_stencil = isinstance(A, Stencil)
    t_dev = min(t_xla, t_pallas, t_prod)
    dev_nnz_s = nnz / t_dev
    n_rows = b.shape[0]
    itemsize = b.dtype.itemsize
    # roofline fractions against each engine's own ideal HBM traffic
    # (v5e peak ~819 GB/s): explicit DIA moves nnz + 2n elements; the
    # stencil's constant part moves ~2n (+ O(corr) for the residual rows)
    bytes_dia = (nnz + 2 * n_rows) * itemsize
    if is_stencil:
        bytes_prod = (2 * n_rows + A.corr_elements) * itemsize
    else:
        bytes_prod = bytes_dia
    t_best_dia = min(t_xla_best, t_pallas_best)
    hbm_fraction = (bytes_dia / t_best_dia) / 819e9 if on_accel else float("nan")
    hbm_fraction_prod = (bytes_prod / t_prod_best) / 819e9 if on_accel else float("nan")

    # host baseline: scipy CSR (the reference's SpMV engine)
    xh = np.asarray(x, dtype=np.float64)
    Ah = sys_.A_csr
    t_host = _median_time(lambda: Ah @ xh, reps=5)
    host_nnz_s = nnz / t_host

    # CGMRES time-to-solution at fixed invariant quality (smaller problem to
    # keep total bench time low).  Preconditioned with smoothed-aggregation
    # AMG — the designed operating regime (the reference's TimedSolve pairs
    # heat with Ruge–Stüben): the solve must actually converge for the
    # constrained endgame to certify; a fixed-degree polynomial stalls here
    # and the run degenerates to a fixed-k sweep.
    from structurepreservingiterativesolvers_tpu.precond.amg import amg

    M2 = 256 if on_accel else 128
    s2 = heat.linforms(M=M2, N=100)
    cons = tuple(s2.constraints())
    # structured (gather-free, all-DIA) hierarchy — the production build
    pre = amg(s2.A_csr, dtype=b.dtype, grid=(M2 + 1, M2 + 1))
    xg, gi = gmres(s2.A, s2.b, k=40, tol=1e-6, pre=pre)

    # chained TTS: REPS dependent full solves inside one program (per-solve
    # steady-state device time, free of per-dispatch RPC/caching artifacts)
    from structurepreservingiterativesolvers_tpu.solvers.cgmres import (
        _build_core as _cg_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    dt2 = s2.b.dtype
    core = _cg_core(40, len(cons), None, False, False, dt2 == jnp.float32,
                    ("q",) * len(cons), "cgs2", True, "while",
                    dt2 == jnp.float32,  # snap: production configuration
                    dt2 == jnp.float32)  # f32_reduce (snap-first)
    tol_d = dscalar(1e-6, dt2)
    contol_d = dscalar(10.0, dt2)
    ctol_d = dscalar(1e-12, dt2)

    def make_cg_chain(reps):
        @jax.jit
        def chain(b2):
            def body(i, acc):
                out = core(s2.A, b2 * (1.0 + 1e-12 * acc[0]), None, cons,
                           tol_d, contol_d, ctol_d, pre)
                return out.x.astype(b2.dtype)
            return lax.fori_loop(0, reps, body, jnp.zeros_like(b2))
        return lambda: chain(s2.b).block_until_ready()

    t_cg, _ = _chained_time(make_cg_chain, reps_inner=5 if on_accel else 2,
                            reps_outer=3)

    # preconditioned-iteration throughput at the headline size (round-3
    # verdict #7: report the ITERATION, not just the bare SpMV): the lean
    # phase-1 GMRES loop (AMG apply + SpMV + CGS2 + Givens + true residual)
    # at M=1024, chained solves inside one program / measured iterations
    from structurepreservingiterativesolvers_tpu.solvers.cgmres import (
        _build_phase1,
    )

    pre_big = amg(sys_.A, dtype=b.dtype,
                  grid=(M + 1, M + 1))  # compile the setup program
    t0_amg = time.perf_counter()
    pre_big = amg(sys_.A, dtype=b.dtype, grid=(M + 1, M + 1))
    jax.block_until_ready(pre_big.coarse_inv)
    amg_setup_s = time.perf_counter() - t0_amg  # warm (compiled) device setup
    kp = 20
    p1 = _build_phase1(kp, None, "cgs2", True)
    tolp = dscalar(1e-7, b.dtype)
    contolp = dscalar(10.0, b.dtype)
    _, j1, _ = p1(A, b, None, tolp, contolp, pre_big)
    j1h = max(int(j1), 1)

    def make_p1_chain(reps):
        @jax.jit
        def chain(b2):
            def body(i, acc):
                Z, j, r = p1(A, b2 * (1.0 + 1e-12 * acc), None, tolp,
                             contolp, pre_big)
                return acc + 1e-20 * r.astype(acc.dtype)
            return lax.fori_loop(0, reps, body, jnp.zeros((), b2.dtype))
        return lambda: chain(b).block_until_ready()

    t_p1, _ = _chained_time(make_p1_chain, reps_inner=5 if on_accel else 2,
                            reps_outer=3)
    preconditioned_iter_s = t_p1 / j1h

    # GMRES-vs-CGMRES core ratio at the headline size, same-window chained
    # (round-5: the production constrained endgame is a tail — probe31/32
    # measured 1.12-1.18×; TimedSolve wall columns carry the RPC floor)
    from structurepreservingiterativesolvers_tpu.experiments.timed_solve import (
        chained_core_times,
    )

    t_g_core, t_c_core = chained_core_times(
        sys_, pre_big, kp, 1e-7, reps=5 if on_accel else 2, outer=3)
    ratio_cg = t_c_core / t_g_core
    xc, ci = cgmres(s2.A, s2.b, k=40, tol=1e-6, constraints=cons, pre=pre)
    # conservation gains through the dd/f64 certificate path — f32
    # compute_invariants evaluation noise sits orders above real deviations
    # (round-2 verdict weak #2)
    from structurepreservingiterativesolvers_tpu.experiments.timed_solve import (
        certified_deviations,
    )

    dg = certified_deviations(s2, xg)
    dc = certified_deviations(s2, xc)
    gain_mass = dg["mass"] / max(dc["mass"], 1e-16)
    gain_energy = dg["energy"] / max(dc["energy"], 1e-16)

    engines = {"dia_xla": t_xla,
               "dia_pallas": t_pallas if on_accel else None,
               ("stencil" if is_stencil else "dia_auto"): t_prod}
    best_engine = min((t, k) for k, t in engines.items() if t)[1]
    out = {
        # a CPU fallback must never look like the round's TPU number
        "metric": ("spmv_nnz_per_s" if not tpu_unavailable
                   else "spmv_nnz_per_s_CPU_FALLBACK"),
        "value": dev_nnz_s,
        "unit": "nnz/s",
        "vs_baseline": dev_nnz_s / host_nnz_s,
        "tpu_unavailable": tpu_unavailable,
        "extra": {
            "backend": jax.default_backend(),
            "health_probe_attempts": probe_attempts,
            "health_probe_elapsed_s": probe_s,
            "dtype": str(b.dtype),
            "n": int(n_rows),
            "nnz": int(nnz),
            "spmv_time_s": t_dev,
            "spmv_time_xla_s": t_xla,
            "spmv_time_pallas_s": t_pallas if on_accel else None,
            "spmv_time_production_s": t_prod,
            "production_operator": type(A).__name__,
            "spmv_engine": best_engine,
            "hbm_fraction": hbm_fraction,
            "hbm_fraction_production": hbm_fraction_prod,
            "host_scipy_nnz_per_s": host_nnz_s,
            "cgmres_tts_s": t_cg,
            "amg_setup_s": amg_setup_s,
            "cgmres_over_gmres_core": ratio_cg,
            "gmres_core_s": t_g_core,
            "cgmres_core_s": t_c_core,
            "preconditioned_iter_s": preconditioned_iter_s,
            "preconditioned_iters_measured": j1h,
            "cgmres_steps": ci["steps"],
            "cgmres_safety": ci["safety"],
            "cgmres_deviation": ci["deviation"],
            "conservation_gain_mass": gain_mass,
            "conservation_gain_energy": gain_energy,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
