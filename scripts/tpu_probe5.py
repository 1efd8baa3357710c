"""Isolate while_loop vs fori_loop overhead for the SpMV chain."""

import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from structurepreservingiterativesolvers_tpu.models import heat

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    k = 30

    def med(fn, reps=5):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    @jax.jit
    def chain_fori(A, b):
        return lax.fori_loop(0, k, lambda j, w: A @ w, b).sum()

    @jax.jit
    def chain_while(A, b):
        def cond(c):
            j, w, done = c
            return (j < k) & ~done

        def body(c):
            j, w, done = c
            w = A @ w
            return j + 1, w, jnp.linalg.norm(w) < 0.0

        _, w, _ = lax.while_loop(cond, body, (jnp.int32(0), b, jnp.bool_(False)))
        return w.sum()

    t1 = med(lambda: chain_fori(A, b).block_until_ready())
    print(f"fori spmv chain   {t1*1e3:8.2f} ms", flush=True)
    t2 = med(lambda: chain_while(A, b).block_until_ready())
    print(f"while spmv chain  {t2*1e3:8.2f} ms", flush=True)
    print(f"while overhead per iteration: {(t2-t1)/k*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
