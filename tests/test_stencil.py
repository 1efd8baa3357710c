"""Constant-stencil fast path: decomposition, SpMV/SpMM parity, dispatch.

``ops/stencil.py`` is the matrix-free answer to the reference hot loop
``A @ z`` (reference solvers.py:95,191,370) for structured-grid operators:
``A = C + E`` with one constant per diagonal plus an O(boundary) residual.
These tests mirror ``test_pallas_spmv.py``: parity against the explicit DIA
operator (wrap and non-wrap, boundary residual rows), the all-constant and
over-``max_corr_frac`` fallback gates, the pallas interpret engine, SpMM,
and the model-assembly wiring (heat assembles straight into a Stencil).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from structurepreservingiterativesolvers_tpu.ops.sparse import (
    DIA,
    dia_from_scipy,
)
from structurepreservingiterativesolvers_tpu.ops.stencil import (
    Stencil,
    as_dia,
    maybe_stencil,
    stencil_spmm,
    stencil_spmv,
)


def _stencil_dia(n, offsets, wrap, corr_rows=(), seed=0, dtype=np.float64):
    """DIA with constant diagonals except perturbations on ``corr_rows``."""
    rng = np.random.default_rng(seed)
    consts = rng.standard_normal(len(offsets))
    data = np.zeros((len(offsets), n), dtype)
    for d, off in enumerate(offsets):
        if wrap:
            data[d, :] = consts[d]
        else:
            lo, hi = max(0, -off), min(n, n - off)
            data[d, lo:hi] = consts[d]
    for r in corr_rows:
        for d in range(len(offsets)):
            data[d, r] += rng.standard_normal()
    return DIA(jnp.asarray(data), tuple(offsets), (n, n), bool(wrap))


CASES = [
    # n, offsets, wrap, corr_rows
    (1000, (-3, -1, 0, 1, 3), False, (0, 1, 499, 998, 999)),
    (1024, (-130, -1, 0, 1, 130), True, (0, 511, 1023)),
    (777, (-256, 0, 256), False, ()),
    (300, (-7, 0, 7), True, (5,)),
]


@pytest.mark.parametrize("n,offsets,wrap,corr", CASES)
def test_spmv_matches_dia(n, offsets, wrap, corr):
    A = _stencil_dia(n, offsets, wrap, corr)
    S = maybe_stencil(A)
    assert isinstance(S, Stencil), "decomposition should accept this matrix"
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    y_dia = A @ x
    y_st = S @ x
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_dia),
                               rtol=1e-13, atol=1e-12)
    # uncorrected rows are exact: C alone reproduces them
    mask = np.ones(n, bool)
    mask[list(corr)] = False
    np.testing.assert_array_equal(
        np.asarray(y_st)[mask], np.asarray(y_dia)[mask]
    )


@pytest.mark.parametrize("n,offsets,wrap,corr", CASES)
def test_spmm_matches_dia(n, offsets, wrap, corr):
    A = _stencil_dia(n, offsets, wrap, corr, seed=3)
    S = maybe_stencil(A)
    X = jnp.asarray(np.random.default_rng(2).standard_normal((n, 5)))
    np.testing.assert_allclose(
        np.asarray(stencil_spmm(S, X)), np.asarray(A @ X),
        rtol=1e-13, atol=1e-12,
    )


def test_all_constant_has_empty_correction():
    A = _stencil_dia(512, (-1, 0, 1), True, corr_rows=())
    S = maybe_stencil(A)
    assert isinstance(S, Stencil)
    assert not np.any(np.asarray(S.resid_vals))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(512))
    np.testing.assert_array_equal(np.asarray(S @ x), np.asarray(A @ x))


def test_fallback_when_not_stencil_like():
    # every row perturbed → corrected fraction 1.0 > max_corr_frac
    rng = np.random.default_rng(0)
    n = 256
    data = rng.standard_normal((3, n))
    A = DIA(jnp.asarray(data), (-1, 0, 1), (n, n), True)
    assert maybe_stencil(A) is A


def test_fallback_passthrough_non_dia():
    X = jnp.ones((4, 4))
    assert maybe_stencil(X) is X
    assert as_dia(X) is X


def test_as_dia_roundtrip():
    A = _stencil_dia(300, (-7, 0, 7), True, corr_rows=(5,))
    S = maybe_stencil(A)
    assert as_dia(S) is S.dia
    np.testing.assert_array_equal(
        np.asarray(S.todense()), np.asarray(A.todense())
    )
    # DIA-compatible surface
    assert S.nnz == A.nnz
    assert S.shape == A.shape
    assert S.dtype == A.dtype
    np.testing.assert_array_equal(np.asarray(S.data), np.asarray(A.data))


@pytest.mark.parametrize("wrap", [False, True])
def test_pallas_interpret_engine(wrap):
    n, offsets = 640, (-130, -1, 0, 1, 130)
    corr = (0, 5, 639) if wrap else (0, 1, 638, 639)
    A = _stencil_dia(n, offsets, wrap, corr, dtype=np.float32)
    S = maybe_stencil(A)
    S32 = dataclasses.replace(S.astype(jnp.float32), engine="pallas")
    x = jnp.asarray(np.random.default_rng(4).standard_normal(n), jnp.float32)
    y_ref = np.asarray(A.astype(jnp.float32) @ x, np.float64)
    y_pal = np.asarray(stencil_spmv(S32, x), np.float64)
    np.testing.assert_allclose(y_pal, y_ref, rtol=0, atol=2e-5)


def test_astype_casts_all_leaves():
    A = _stencil_dia(128, (-1, 0, 1), True, corr_rows=(3,))
    S = maybe_stencil(A).astype(jnp.float32)
    assert S.const.dtype == jnp.float32
    assert S.resid_vals.dtype == jnp.float32
    assert S.dia.data.dtype == jnp.float32


def test_heat_assembles_stencil_and_solves_identically():
    """Production wiring: heat's operator becomes a Stencil at real sizes and
    the solver result is identical to the explicit-DIA run."""
    import os

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import gmres

    s = heat.linforms(M=64, N=100)
    assert isinstance(s.A, Stencil)
    x_st, info_st = gmres(s.A, s.b, k=30, tol=1e-10)

    os.environ["SPIS_DISABLE_STENCIL"] = "1"
    try:
        s2 = heat.linforms(M=64, N=100)
    finally:
        del os.environ["SPIS_DISABLE_STENCIL"]
    assert isinstance(s2.A, DIA)
    x_dia, info_dia = gmres(s2.A, s2.b, k=30, tol=1e-10)
    assert info_st["steps"] == info_dia["steps"]
    np.testing.assert_allclose(
        np.asarray(x_st), np.asarray(x_dia), rtol=1e-12, atol=1e-12
    )


def test_block_system_declines():
    """lkdv/swe operators are block systems whose diagonals vary per field
    block — maybe_stencil must decline them (DIA path unchanged)."""
    from structurepreservingiterativesolvers_tpu.models import lkdv, swe

    assert isinstance(lkdv.linforms(M=100).A, DIA)
    assert isinstance(swe.linforms(M=16).A, DIA)


def test_cgmres_on_stencil_certifies():
    """Full constrained solve over a Stencil operator: the endgame and
    invariant certificate must behave exactly as on DIA."""
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import cgmres

    s = heat.linforms(M=64, N=100)
    assert isinstance(s.A, Stencil)
    cons = tuple(s.constraints())
    x, info = cgmres(s.A, s.b, k=30, tol=1e-8, constraints=cons)
    assert info["safety"]
    assert info["deviation"] < 1e-10
