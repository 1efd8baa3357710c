"""Multi-device scaling measurements (SpMV throughput and solve time vs
mesh size).

BASELINE's north-star metrics include nnz/s at 1 chip / N devices and ≥80%
scaling efficiency.  This harness runs the same problem over growing device
meshes and reports throughput + efficiency.  On a single-chip or CPU host it
still runs (virtual devices) — functional validation of the sharded path;
on a pod slice it measures real ICI scaling.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _med(fn, reps=10, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def spmv_scaling(
    problem: str = "swe",
    M: int = 64,
    device_counts: Optional[Sequence[int]] = None,
    **params,
):
    """DIA SpMV time vs number of devices (GSPMD sharding)."""
    from ..parallel import make_mesh, shard_matrix, shard_vector
    from .single_solve import get_model

    model = get_model(problem)
    s = model.linforms(M=M, **params)
    nnz = s.A_csr.nnz
    n = s.b.shape[0]
    navail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= navail and n % d == 0]

    spmv = jax.jit(lambda A, x: A @ x)
    rows = []
    t1 = None
    for d in device_counts:
        mesh = make_mesh(d)
        A = shard_matrix(s.A, mesh)
        x = shard_vector(s.b, mesh)
        spmv(A, x).block_until_ready()
        t = _med(lambda: spmv(A, x).block_until_ready())
        if t1 is None:
            t1 = t
        rows.append(
            {
                "devices": d,
                "time_s": t,
                "nnz_per_s": nnz / t,
                "speedup": t1 / t,
                "efficiency": t1 / t / d,
            }
        )
    return rows


def solve_scaling(
    problem: str = "swe",
    M: int = 64,
    k: int = 20,
    tol: float = 1e-7,
    device_counts: Optional[Sequence[int]] = None,
    **params,
):
    """Full CGMRES solve time vs number of devices."""
    from ..parallel import make_mesh, shard_system
    from ..solvers import cgmres
    from .single_solve import get_model

    model = get_model(problem)
    s = model.linforms(M=M, **params)
    n = s.b.shape[0]
    navail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= navail and n % d == 0]

    rows = []
    t1 = None
    for d in device_counts:
        mesh = make_mesh(d)
        A, b, x0, cons = shard_system(
            s.A, s.b, jnp.zeros_like(s.b), s.constraints(), mesh
        )

        def run():
            x, _ = cgmres(A, b, x0, k=k, tol=tol, constraints=cons)
            return x.block_until_ready()

        run()
        t = _med(run, reps=5, warmup=1)
        if t1 is None:
            t1 = t
        rows.append(
            {"devices": d, "time_s": t, "speedup": t1 / t, "efficiency": t1 / t / d}
        )
    return rows


def report(rows) -> str:
    import pandas as pd

    df = pd.DataFrame(rows)
    return df.to_markdown(index=False)
