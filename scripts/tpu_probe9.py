"""Decompose gmres wall time: jitted core vs Python wrapper vs tunnel fetches.

probe7 showed the k=30 Arnoldi loop (incl. Givens + estimate) is 0.06-0.38 ms
on-device while full ``gmres()`` is ~140 ms.  Hypothesis: the overhead is
per-CALL host<->device traffic through the axon tunnel (scalar fetch for
``steps``, array fetch for ``res``, per-call ``zeros_like``/``asarray(tol)``
dispatches), not per-iteration device work.
"""
import sys, time
sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import gmres
    from structurepreservingiterativesolvers_tpu.solvers.gmres import _build_core

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    k = 30

    def med(fn, reps=7):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    core = _build_core(k, None, False, True, "cgs2", "while")
    x0 = jnp.zeros_like(b)
    tol = jnp.asarray(1e-50, b.dtype)

    out = core(A, b, x0, tol, None)
    scalar = out.steps
    small = out.res

    rows = [
        ("core only (block x)", lambda: core(A, b, x0, tol, None).x.block_until_ready()),
        ("core + device_get all", lambda: jax.device_get(core(A, b, x0, tol, None))),
        ("full gmres wrapper", lambda: gmres(A, b, k=k, tol=1e-50)[0].block_until_ready()),
        ("int(scalar) fetch", lambda: int(scalar)),
        ("np.asarray((k,)) fetch", lambda: np.asarray(small)),
        ("zeros_like dispatch+block", lambda: jnp.zeros_like(b).block_until_ready()),
        ("asarray(tol) put+block", lambda: jnp.asarray(1e-50, b.dtype).block_until_ready()),
    ]
    for label, fn in rows:
        print(f"{label:26s} {med(fn)*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
