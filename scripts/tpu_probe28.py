"""Probe 28: bisect the heat M=2048 compile-time HBM OOM (23.6 GB).

Compiles (AOT, no run until it fits) the solver cores at n=4.2M with
progressively more machinery: gmres core; cgmres with m=0; cgmres with the
mass constraint only (linear — no T2/U); cgmres with both constraints.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    print("health:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0]),
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    import importlib

    cgm = importlib.import_module(
        "structurepreservingiterativesolvers_tpu.solvers.cgmres")
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.precond.amg import amg
    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core as _g_core,
    )
    from structurepreservingiterativesolvers_tpu.solvers.hostio import dscalar

    t0 = time.perf_counter()
    s = heat.linforms(M=2048, N=100)
    print(f"assembly {time.perf_counter()-t0:.0f}s n={s.b.shape[0]}",
          flush=True)
    t0 = time.perf_counter()
    pre = amg(s.A_csr, dtype=s.b.dtype)
    print(f"amg setup {time.perf_counter()-t0:.0f}s "
          f"levels={len(pre.levels)}", flush=True)
    dt = s.b.dtype
    k = 20
    tol_d, contol_d, ctol_d = (dscalar(1e-7, dt), dscalar(10.0, dt),
                               dscalar(1e-12, dt))
    cons = tuple(s.constraints())

    def try_compile(name, fn):
        t0 = time.perf_counter()
        try:
            jax.block_until_ready(fn())
            print(f"{name}: OK ({time.perf_counter()-t0:.0f}s)", flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            for line in msg.splitlines():
                if "memory" in line.lower() or "Exceeded" in line:
                    print(f"{name}: FAIL — {line.strip()[:200]}", flush=True)
                    break
            else:
                print(f"{name}: FAIL — {msg[:200]}", flush=True)
            return False

    gcore = _g_core(k, None, False, True, "cgs2", "while")
    try_compile("gmres+amg", lambda: gcore(s.A, s.b, None, tol_d, pre).x)

    for name, cc in (("cgmres m=0", ()),
                     ("cgmres mass only", (cons[0],)),
                     ("cgmres both", cons)):
        core = cgm._build_core(k, len(cc), None, False, False,
                               dt == jnp.float32, ("q",) * len(cc),
                               "cgs2", True, "while")
        try_compile(
            name,
            lambda core=core, cc=cc: core(
                s.A, s.b, None, cc, tol_d, contol_d, ctol_d, pre).x,
        )


if __name__ == "__main__":
    main()
