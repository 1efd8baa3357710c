"""Probe 33 (round 5): fused CGS2 pass kernel vs plain XLA CGS2 on TPU.

Measures (heat M=1024, n=1.05M, f32, k=20):
  - standalone: plain 2-sweep (update + matvec) vs fused kernel
  - gmres core with SPIS_ORTHO_ENGINE auto (fused) vs xla (plain)
Chained in-program reps; operands passed as jit arguments (tunnel 413).
"""

import os
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

    from structurepreservingiterativesolvers_tpu.ops.pallas_ortho import (
        fused_update_matvec,
    )

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    k1 = 21
    n = (M + 1) ** 2
    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((k1, n)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(n), jnp.float32)
    h = jnp.asarray(rng.standard_normal(k1), jnp.float32)

    def chained(fn, x, *ops, reps=50, outer=5):
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
        return float(np.median(ts)) / reps, float(np.min(ts)) / reps

    # plain two-sweep middle: w1 = w − hᵀQ; u2 = Q w1
    def plain(wv, Qv, hv):
        w1 = wv - hv @ Qv
        return Qv @ w1

    t_plain, b_plain = chained(plain, w, Q, h)
    print(f"plain 2-sweep:  {t_plain*1e6:9.1f} us (best {b_plain*1e6:.1f})",
          flush=True)

    def fused(wv, Qv, hv):
        w1, u2 = fused_update_matvec(Qv, wv, hv)
        return u2

    t_f, b_f = chained(fused, w, Q, h)
    print(f"fused kernel:   {t_f*1e6:9.1f} us (best {b_f*1e6:.1f})",
          flush=True)
    traffic = k1 * n * 4 * 2  # two basis reads (plain) baseline
    print(f"plain BW (2 reads): {traffic/b_plain/1e9:.0f} GB/s; "
          f"fused BW (1 read): {traffic/2/b_f/1e9:.0f} GB/s of 819", flush=True)

    # full CGS2 (4 sweeps vs 3)
    def cgs2_plain(wv, Qv):
        h1 = Qv @ wv
        w1 = wv - h1 @ Qv
        h2 = Qv @ w1
        return w1 - h2 @ Qv

    def cgs2_fused(wv, Qv):
        h1 = Qv @ wv
        w1, h2 = fused_update_matvec(Qv, wv, h1)
        return w1 - h2 @ Qv

    t_c4, b_c4 = chained(cgs2_plain, w, Q)
    t_c3, b_c3 = chained(cgs2_fused, w, Q)
    print(f"CGS2 plain (4 sweeps): {t_c4*1e6:9.1f} us (best {b_c4*1e6:.1f})",
          flush=True)
    print(f"CGS2 fused (3 sweeps): {t_c3*1e6:9.1f} us (best {b_c3*1e6:.1f})",
          flush=True)
    traffic4 = k1 * n * 4 * 4
    print(f"CGS2 plain BW: {traffic4/b_c4/1e9:.0f} GB/s eff; "
          f"fused: {traffic4*3/4/b_c3/1e9:.0f} GB/s of 819", flush=True)

    # gmres core end-to-end, both engines
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.precond.amg import amg
    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core as _g_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    s = heat.linforms(M=M, N=100)
    pre = amg(s.A, dtype=s.b.dtype, grid=(M + 1, M + 1))
    tol_d = dscalar(1e-7, s.b.dtype)
    for engine in ("auto", "xla"):
        os.environ["SPIS_ORTHO_ENGINE"] = engine
        _g_core.cache_clear()
        core = _g_core(20, None, False, True, "cgs2", "while")
        t, _ = chained(lambda b, A, pr, core=core: core(
            A, b, None, tol_d, pr).x, s.b, s.A, pre, reps=10, outer=3)
        print(f"gmres core [{engine:4s}]: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
