"""Probe 29: GMRES iteration roofline at n ≈ 1M (heat M=1024, f32 AMG).

Round-3 verdict weak #5: the SpMV is characterised to death but nobody has
measured where a full preconditioned GMRES iteration sits against the
bandwidth bound.  Chained in-program timings (≥reps inside one program —
single-dispatch medians are poisoned by the ~30 ms tunnel RPC floor):

  spmv          — production stencil SpMV alone
  cgs2          — the two-pass (4 basis sweeps) orthogonalisation alone
  resid         — true-residual block (y@Z + SpMV + norm)
  vcycle        — full AMG apply
  vcycle parts  — level-0 smoother SpMV, R0 apply, P0 apply, rest-of-cycle
  arnoldi       — arnoldi_step (pre + SpMV + CGS2 + Givens) at j=k-1
  p1_loop/iter  — the phase-1 while loop (k iterations) / k

Prints per-item ms and the traffic-model fraction of HBM peak.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

HBM_PEAK = 819e9  # v5e bytes/s


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.ops.sparse import DIA, ELL
    from structurepreservingiterativesolvers_tpu.precond.amg import amg
    from structurepreservingiterativesolvers_tpu.solvers import arnoldi as AR
    from structurepreservingiterativesolvers_tpu.solvers.cgmres import (
        _build_phase1,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    M = 1024
    k = 20
    s = heat.linforms(M=M, N=100)
    n = s.b.shape[0]
    dt = s.b.dtype
    pre_ell = amg(s.A_csr, dtype=dt)
    pre = amg(s.A_csr, dtype=dt, grid=(M + 1, M + 1))  # structured (all-DIA)
    print(f"n={n} dtype={dt} levels={len(pre.levels)} "
          f"level sizes={[lv.dinv.shape[0] for lv in pre.levels]} "
          f"level types={[type(lv.A).__name__ for lv in pre.levels]} "
          f"P types={[type(lv.P).__name__ for lv in pre.levels if lv.P is not None]}",
          flush=True)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(n), dt)

    def chained(fn, x, reps=200, outer=3):
        @jax.jit
        def chain(v0):
            def body(i, acc):
                out = fn(acc)
                leaf = jax.tree_util.tree_leaves(out)[0]
                # thread a genuine data dependence at 1e-20 scale
                return acc + 1e-20 * jnp.ravel(leaf)[:1].astype(acc.dtype)

            return lax.fori_loop(0, reps, body, v0)

        chain(x).block_until_ready()
        ts = []
        for _ in range(outer):
            t1 = time.perf_counter()
            chain(x).block_until_ready()
            ts.append(time.perf_counter() - t1)
        return float(np.median(ts)) / reps

    def report(name, t_s, bytes_ideal=None):
        frac = "" if bytes_ideal is None else (
            f"  ideal {bytes_ideal/1e6:.1f} MB → "
            f"{bytes_ideal / t_s / HBM_PEAK:.2f}× peak-BW fraction")
        print(f"{name:26s} {t_s*1e3:8.3f} ms{frac}", flush=True)

    nnz = s.A_csr.nnz

    # --- operator -----------------------------------------------------------
    t = chained(lambda x: s.A @ x, v)
    report("spmv (stencil)", t, 4 * (nnz / 7 * 0 + 2 * n))  # const+strips: ~2n
    # --- CGS2 ---------------------------------------------------------------
    Q = jnp.asarray(rng.standard_normal((k + 1, n)), dt)

    def cgs2(x):
        h1 = Q @ x
        x = x - h1 @ Q
        h2 = Q @ x
        return x - h2 @ Q

    t = chained(cgs2, v)
    report("cgs2 (4 basis sweeps)", t, 4 * (k + 1) * n * 4)
    # --- true-residual block ------------------------------------------------
    Z = jnp.asarray(rng.standard_normal((k, n)), dt)
    y = jnp.asarray(rng.standard_normal(k), dt)

    def resid(x):
        xx = y @ Z + x
        return x + jnp.linalg.norm(s.A @ xx - s.b) * 1e-20

    t = chained(resid, v)
    report("true-residual block", t, (k * n + 4 * n) * 4)
    # --- V-cycle and parts --------------------------------------------------
    t = chained(lambda x: pre_ell(x), v)
    report("amg v-cycle (ELL greedy)", t)
    t = chained(lambda x: pre(x), v)
    report("amg v-cycle (structured)", t)
    L0 = pre.levels[0]
    t = chained(lambda x: L0.A @ x, v)
    report("  level-0 A spmv", t, 4 * (nnz + 2 * n))
    t = chained(lambda x: L0.dinv * x, v)
    report("  level-0 jacobi scale", t, 3 * 4 * n)
    r0 = v
    t = chained(lambda x: (L0.R @ x), r0)
    nc = pre.levels[1].dinv.shape[0]
    rR = L0.R.vals.shape[0] if isinstance(L0.R, ELL) else 0
    report("  R0 (fine→coarse)", t, 4 * (2 * rR * n / 1 + n + nc))
    ec = jnp.asarray(rng.standard_normal(nc), dt)

    def p0(x):
        return v + 1e-20 * (L0.P @ x)[:1]

    t = chained(lambda x: L0.P @ x, ec, reps=200)
    rP = L0.P.vals.shape[0] if isinstance(L0.P, ELL) else 0
    report("  P0 (coarse→fine)", t, 4 * (2 * rP * nc + n + nc))

    def rest(x):
        # everything below level 0: R0 → recursive cycle → P0 back
        return pre._cycle(1, x)

    t = chained(rest, jnp.asarray(rng.standard_normal(nc), dt))
    report("  cycle below level 0", t)

    # --- arnoldi step at j=k-1 ---------------------------------------------
    beta = jnp.linalg.norm(s.b)
    st0 = AR.init_state(s.b, beta, k)

    def arn(x):
        st = st0._replace(Q=st0.Q.at[0].set(x / jnp.linalg.norm(x)))
        st, h = AR.arnoldi_step(s.A, lambda u: pre(u), st, k - 1, "cgs2")
        return x + 1e-20 * h.astype(dt)

    t = chained(arn, v, reps=50)
    report("arnoldi_step (pre+spmv+cgs2)", t)

    # --- phase-1 loop per iteration ----------------------------------------
    p1 = _build_phase1(k, None, "cgs2", True)
    tol_d = dscalar(1e-7, dt)
    contol_d = dscalar(10.0, dt)
    Z1, j1, r1 = p1(s.A, s.b, None, tol_d, contol_d, pre)
    jax.block_until_ready(Z1)
    j1h = max(int(j1), 1)
    ts = []
    for _ in range(5):
        t1 = time.perf_counter()
        jax.block_until_ready(p1(s.A, s.b, None, tol_d, contol_d, pre)[0])
        ts.append(time.perf_counter() - t1)
    t_p1 = float(np.median(ts))
    print(f"p1 loop: {t_p1*1e3:.1f} ms total, {j1h} iters → "
          f"{t_p1/j1h*1e3:.3f} ms/iter (includes ~30-55 ms dispatch RPC)",
          flush=True)


if __name__ == "__main__":
    main()
