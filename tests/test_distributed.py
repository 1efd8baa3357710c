"""Multi-process (multi-host surrogate) distribution: two local CPU
processes form one distributed job over an 8-device global mesh and run the
sharded CGMRES benchmark.

The reference has no distributed backend at all (SURVEY §2.3); this is the
CI-able validation of the multi-host path (BASELINE north star: scaling
efficiency at ≥2 hosts) using gloo collectives across process boundaries.

These tests spawn subprocesses and do NOT inherit conftest's in-process jax
config; each worker pins itself to CPU explicitly (see experiments/cli.py).
"""

import json
import sys

import numpy as np
import pytest

from structurepreservingiterativesolvers_tpu.parallel.distributed import spawn_local


def test_two_process_dist_bench_matches_single():
    """The same solve on a 1-process (4-device) and a 2-process (8-device)
    global mesh: both converge, agree on iteration count, and certify the
    constraints; the coordinator emits the DIST_RESULT line."""
    argv = ["dist-bench", "--problem", "swe", "--M", "16", "--k", "20",
            "--tol", "1e-6"]
    results = {}
    for nproc, port in ((1, 13411), (2, 13412)):
        outs = spawn_local(nproc, argv, port=port, timeout=420)
        res = None
        for rc, out in outs:
            assert rc == 0, out[-3000:]
            for line in out.splitlines():
                if line.startswith("DIST_RESULT "):
                    res = json.loads(line[len("DIST_RESULT "):])
        assert res is not None, "coordinator printed no DIST_RESULT"
        results[nproc] = res

    r1, r2 = results[1], results[2]
    assert r2["hosts"] == 2
    assert r2["devices"] == 8
    assert r1["steps"] == r2["steps"]
    assert r2["safety"] is True
    assert r2["deviation"] < 1e-10
    np.testing.assert_allclose(r1["deviation"], r2["deviation"], atol=1e-10)


def test_global_mesh_host_major_single_process():
    """host-major ordering and the 2-D hosts×chips mesh degenerate correctly
    in a single process (the common local case)."""
    import jax

    from structurepreservingiterativesolvers_tpu.parallel.distributed import (
        global_mesh,
        host_chip_mesh,
        is_coordinator,
    )

    m = global_mesh()
    assert m.devices.size == len(jax.devices())
    m2 = host_chip_mesh()
    assert m2.devices.shape[0] == jax.process_count()
    assert m2.devices.size == len(jax.devices())
    assert is_coordinator()
