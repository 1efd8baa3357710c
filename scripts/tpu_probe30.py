"""Probe 30: BoxRestrict box-sum variants at (1025, 1025) f32.

probe29: the (Cc1,b,Cc2,b).sum((1,3)) reduction costs 0.65 ms for 4.7 MB of
traffic (~100x off HBM bw).  Variants: minor-axis-first two-step reduce,
strided-slice adds, and matmul-with-ones.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")

def main():
    import jax, jax.numpy as jnp
    from jax import lax
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    C1 = C2 = 1025; b = 3
    Cc1 = Cc2 = -(-C1 // b)
    n = C1 * C2
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(n), jnp.float32)

    def chained(fn, x, reps=300, outer=3):
        @jax.jit
        def chain(v0):
            def body(i, acc):
                out = fn(acc)
                return acc + 1e-20 * jnp.ravel(out)[:1].astype(acc.dtype)
            return lax.fori_loop(0, reps, body, v0)
        chain(x).block_until_ready()
        ts = []
        for _ in range(outer):
            t1 = time.perf_counter()
            chain(x).block_until_ready()
            ts.append(time.perf_counter() - t1)
        return float(np.median(ts)) / reps

    def v_current(r):
        W = r.reshape(C1, C2)
        W = jnp.pad(W, ((0, b*Cc1-C1), (0, b*Cc2-C2)))
        return W.reshape(Cc1, b, Cc2, b).sum(axis=(1,3)).reshape(-1)

    def v_minor_first(r):
        W = r.reshape(C1, C2)
        W = jnp.pad(W, ((0, b*Cc1-C1), (0, b*Cc2-C2)))
        Wc = W.reshape(b*Cc1, Cc2, b).sum(-1)        # minor-axis reduce
        return Wc.reshape(Cc1, b, Cc2).sum(1).reshape(-1)

    def v_strided(r):
        W = r.reshape(C1, C2)
        W = jnp.pad(W, ((0, b*Cc1-C1), (0, b*Cc2-C2)))
        Wc = W[:, 0::b] + W[:, 1::b] + W[:, 2::b]
        return (Wc[0::b] + Wc[1::b] + Wc[2::b]).reshape(-1)

    ones_b = jnp.ones((b,), jnp.float32)
    def v_matmul(r):
        W = r.reshape(C1, C2)
        W = jnp.pad(W, ((0, b*Cc1-C1), (0, b*Cc2-C2)))
        Wc = (W.reshape(b*Cc1*Cc2, b) @ ones_b).reshape(b*Cc1, Cc2)
        return (Wc.reshape(Cc1, b, Cc2).sum(1)).reshape(-1)

    ref = None
    for name, fn in (("current", v_current), ("minor_first", v_minor_first),
                     ("strided", v_strided), ("matmul", v_matmul)):
        out = jax.jit(fn)(v)
        if ref is None: ref = out
        err = float(jnp.max(jnp.abs(out - ref)))
        t = chained(fn, v)
        print(f"{name:12s} {t*1e3:7.3f} ms  maxdiff {err:.2e}", flush=True)

    # repeat (BoxProlong upsample) variants
    e = jnp.asarray(rng.standard_normal(Cc1*Cc2), jnp.float32)
    def u_repeat(x):
        E = x.reshape(Cc1, Cc2)
        return jnp.repeat(jnp.repeat(E, b, 0), b, 1)[:C1, :C2].reshape(-1)
    def u_bcast(x):
        E = x.reshape(Cc1, 1, Cc2, 1)
        F = jnp.broadcast_to(E, (Cc1, b, Cc2, b)).reshape(b*Cc1, b*Cc2)
        return F[:C1, :C2].reshape(-1)
    ref = None
    for name, fn in (("repeat", u_repeat), ("broadcast", u_bcast)):
        out = jax.jit(fn)(e)
        if ref is None: ref = out
        err = float(jnp.max(jnp.abs(out - ref)))
        t = chained(fn, e)
        print(f"{name:12s} {t*1e3:7.3f} ms  maxdiff {err:.2e}", flush=True)

if __name__ == "__main__":
    main()
