"""Pallas DIA SpMV kernel: interpret-mode parity vs the XLA roll chain and
the dense operator, plus dispatch-path coverage (``DIA.engine``).

The kernel is the production answer to the reference hot loop ``A @ z``
(reference solvers.py:95,191,370) on TPU backends; on CPU it runs in
pallas interpret mode so the whole dispatch path is exercised in CI.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import dia_spmv_pallas
from structurepreservingiterativesolvers_tpu.ops.sparse import (
    DIA,
    _pallas_eligible,
    dia_from_scipy,
    dia_spmv,
)


def _random_dia(n, offsets, wrap, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for off in offsets:
        for i in range(n):
            j = (i + off) % n if wrap else i + off
            if wrap or 0 <= j < n:
                rows.append(i)
                cols.append(j % n)
                vals.append(rng.standard_normal())
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    return dia_from_scipy(A, wrap=wrap, dtype=np.float32), A


CASES = [
    # n, offsets, wrap — covering: lane-aligned shifts (r=0), unaligned,
    # multi-sublane shifts, non-multiple-of-128 n, multi-block grids
    (1000, (-3, -1, 0, 1, 3), False),
    (1024, (-130, -1, 0, 1, 130), True),
    (777, (-256, 0, 256), False),
    (4096, (-1030, -1, 0, 2, 1030), True),
    (300, (-7, 0, 7), True),
]


@pytest.mark.parametrize("n,offsets,wrap", CASES)
def test_pallas_matches_roll_chain(n, offsets, wrap):
    Ad, Ah = _random_dia(n, offsets, wrap)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(n), jnp.float32
    )
    y_roll = dia_spmv(Ad, x)
    y_pal = dia_spmv_pallas(Ad, x, block_rows=512, interpret=True)
    y_dense = jnp.asarray(Ah @ np.asarray(x, np.float64), jnp.float32)
    np.testing.assert_allclose(y_pal, y_roll, rtol=0, atol=2e-5)
    np.testing.assert_allclose(y_pal, y_dense, rtol=0, atol=1e-4)


def test_engine_dispatch_forced_pallas():
    """engine='pallas' routes ``A @ x`` through the kernel (interpret mode on
    CPU), inside and outside jit."""
    Ad, Ah = _random_dia(1024, (-33, -1, 0, 1, 33), True, seed=2)
    Ap = dataclasses.replace(Ad, engine="pallas")
    x = jnp.asarray(np.random.default_rng(3).standard_normal(1024), jnp.float32)
    y = Ap @ x
    yj = jax.jit(lambda A, v: A @ v)(Ap, x)
    y_ref = Ad @ x
    np.testing.assert_allclose(y, y_ref, atol=2e-5)
    np.testing.assert_allclose(yj, y_ref, atol=2e-5)


def test_engine_gating():
    Ad, _ = _random_dia(512, (-1, 0, 1), False, seed=4)
    x = jnp.zeros(512, jnp.float32)
    # explicit engines override autodetection
    assert _pallas_eligible(dataclasses.replace(Ad, engine="pallas"), x)
    assert not _pallas_eligible(dataclasses.replace(Ad, engine="xla"), x)
    # auto on CPU: roll chain
    assert not _pallas_eligible(Ad, x)
    # f64 never eligible (Mosaic has no f64 path)
    Ad64 = Ad.astype(jnp.float64)
    assert not _pallas_eligible(dataclasses.replace(Ad64, engine="pallas"),
                                jnp.zeros(512, jnp.float64))


def test_pallas_in_solver_loop():
    """Forced-pallas operator drives a full GMRES solve to the same answer."""
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import gmres

    s = heat.linforms(M=16)
    A32 = s.A.astype(jnp.float32)
    b32 = s.b.astype(jnp.float32)
    Ap = dataclasses.replace(A32, engine="pallas")
    x_roll, _ = gmres(A32, b32, k=25, tol=1e-5)
    x_pal, info = gmres(Ap, b32, k=25, tol=1e-5)
    np.testing.assert_allclose(
        np.asarray(x_pal), np.asarray(x_roll), rtol=0, atol=1e-4
    )
    assert info["steps"] >= 1
