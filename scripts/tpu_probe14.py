"""Decompose the ~23 ms constrained-endgame overhead (probe13: cgmres core
29.6 ms vs gmres 6.9 ms chained).

Suspects: the phase-entry catch-up reduction (SpMM + Gram matmul) and the KKT
Newton run in emulated f64 on f32 hardware.  All timings chained (REPS
dependent evaluations inside ONE program) — standalone dispatches are
cached/elided through the tunnel (probe13).
"""
import sys, time
sys.path.insert(0, ".")


def main():
    import warnings
    warnings.filterwarnings("ignore")
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
        catchup_buffers, init_buffers,
    )
    from structurepreservingiterativesolvers_tpu.solvers.kkt import (
        constrained_lsq,
    )

    s = heat.linforms(M=256)
    b = s.b
    cons = tuple(s.constraints())
    k = 30
    n = b.shape[0]
    dt = b.dtype
    rng = np.random.default_rng(0)
    Z = jnp.asarray(rng.standard_normal((k, n)), dt) / np.sqrt(n)
    x0 = jnp.zeros_like(b)

    def med(fn, reps=5):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    REPS = 20

    def chained(fn, label, reps=REPS):
        @jax.jit
        def chain(Z):
            def body(i, acc):
                out = fn(Z + 1e-12 * acc[None, :] * 0 + 1e-12 * acc.sum())
                return out.astype(dt)
            return lax.fori_loop(0, reps, body, jnp.zeros(n, dt))
        t = med(lambda: chain(Z).block_until_ready())
        print(f"{label:42s} {t/reps*1e3:9.3f} ms/op", flush=True)
        return t / reps

    # (a) full catch-up, all 3 constraints, f64 (the shipped mixed mode)
    bufs64 = tuple(init_buffers(c, x0, k, jnp.dtype("float64")) for c in cons)
    def catchup64(Zp):
        outs = tuple(catchup_buffers(c, bf, Zp, x0)
                     for c, bf in zip(cons, bufs64))
        return sum(o.T2[0, :n % k + 5].sum().astype(dt) for o in outs) + Zp[0]
    chained(catchup64, "catchup all cons, f64")

    # (b) same in f32
    bufs32 = tuple(init_buffers(c, x0, k, dt) for c in cons)
    def catchup32(Zp):
        outs = tuple(catchup_buffers(c, bf, Zp, x0)
                     for c, bf in zip(cons, bufs32))
        return sum(o.T2[0, :n % k + 5].sum().astype(dt) for o in outs) + Zp[0]
    chained(catchup32, "catchup all cons, f32")

    # (c) KKT Newton with prebuilt f64 buffers (3 cons), warm zero
    H = jnp.asarray(rng.standard_normal((k + 1, k)), jnp.float64)
    beta = jnp.float64(1.0)
    act = jnp.ones(k, bool)
    cm = jnp.ones(len(cons), jnp.float64)
    fixed = tuple(catchup_buffers(c, bf, Z, x0)
                  for c, bf in zip(cons, bufs64))
    def kkt_run(Zp):
        out = constrained_lsq(H + 1e-12 * Zp[0], beta, fixed,
                              jnp.zeros(k, jnp.float64), act, cm,
                              kkt_tol=jnp.float64(1e-13))
        return out.y.astype(dt)[:n % k + 5].sum() + Zp
    @jax.jit
    def chain_kkt(Z):
        def body(i, acc):
            out = constrained_lsq(H * (1 + 1e-14 * acc[0]), beta, fixed,
                                  jnp.zeros(k, jnp.float64), act, cm,
                                  kkt_tol=jnp.float64(1e-13))
            return acc + out.y.astype(dt).sum() * 1e-14 + jnp.zeros(n, dt)
        return lax.fori_loop(0, REPS, body, jnp.zeros(n, dt))
    t = med(lambda: chain_kkt(Z).block_until_ready())
    print(f"{'constrained_lsq (fixed bufs, f64)':42s} {t/REPS*1e3:9.3f} ms/op",
          flush=True)

    # (d) refinement cost model: per Newton step per constraint =
    #     one f64 SpMV on an n-vector + one f64 tall matvec Z @ w
    A64 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64) if hasattr(x, "astype") else x, s.A)
    Z64 = Z.astype(jnp.float64)
    def refine_step(Zp):
        x = x0.astype(jnp.float64) + Z64.T @ jnp.ones(k, jnp.float64) * (
            1 + 1e-14 * Zp[0, 0])
        tot = jnp.zeros(k, jnp.float64)
        for c in cons:
            if c.M is not None:
                w = c.M @ x
                tot = tot + Z64 @ w
        return tot.astype(dt).sum() + Zp[0]
    chained(refine_step, "refine step all cons (f64 SpMV + Z@w)")

    # (e) the two halves of catchup, f64, energy constraint only
    cM = [c for c in cons if c.M is not None][0]
    def spmm64(Zp):
        U = (cM.M @ Zp.astype(jnp.float64).T)
        return U[0, :5].sum().astype(dt) + Zp[0]
    chained(spmm64, "SpMM M@Z^T (k cols), f64, 1 con")
    def gram64(Zp):
        Zc = Zp.astype(jnp.float64)
        T2 = Zc @ Zc.T
        return T2[0, :5].sum().astype(dt) + Zp[0]
    chained(gram64, "Gram Z@Z^T, f64")
    def gram32(Zp):
        T2 = Zp @ Zp.T
        return T2[0, :5].sum() + Zp[0]
    chained(gram32, "Gram Z@Z^T, f32")


if __name__ == "__main__":
    main()
