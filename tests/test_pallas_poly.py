"""Fused polynomial-apply Pallas kernel (ops/pallas_poly.py): interpret-mode
parity vs the unfused recurrences, through the builder dispatch and inside a
full preconditioned solve.

The fused kernel is the TPU replacement for issuing a degree-p
Chebyshev/Neumann preconditioner as p separate SpMV sweeps (reference role:
ILU/AMG applies, heat/TimedSolve.py:30-31, swe/TimedSolve.py:23-24).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from structurepreservingiterativesolvers_tpu import precond
from structurepreservingiterativesolvers_tpu.models import heat, swe


@pytest.fixture(scope="module")
def heat32():
    s = heat.linforms(M=48)
    return s, s.A.astype(jnp.float32)


@pytest.fixture(scope="module")
def swe32():
    s = swe.linforms(M=16)
    return s, s.A.astype(jnp.float32)


def test_fused_chebyshev_matches_recurrence(heat32):
    s, A32 = heat32
    base = precond.chebyshev(s.A, degree=8)
    fused = precond.chebyshev(A32, lmin=base.lmin, lmax=base.lmax, degree=8,
                              fused=True, block_rows=2048, interpret=True)
    assert fused.datawin is not None
    plain = precond.Chebyshev(A=A32, lmin=base.lmin, lmax=base.lmax, degree=8)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(s.b.shape[0]),
                    jnp.float32)
    y_f, y_p = fused(v), plain(v)
    scale = float(jnp.max(jnp.abs(y_p)))
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               atol=1e-5 * scale)


def test_fused_neumann_matches_recurrence_wrap(swe32):
    s, A32 = swe32
    fused = precond.neumann(A32, degree=4, fused=True, block_rows=4096,
                            interpret=True)
    assert fused.datawin is not None and fused.dinvwin is not None
    plain = precond.neumann(A32, degree=4, fused=False)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(s.b.shape[0]),
                    jnp.float32)
    y_f, y_p = fused(v), plain(v)
    scale = float(jnp.max(jnp.abs(y_p)))
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               atol=1e-5 * scale)


def test_fused_cheb_drives_gmres(heat32):
    """The fused preconditioner is a drop-in jit operand: same iterate as
    the unfused one inside a full GMRES solve."""
    from structurepreservingiterativesolvers_tpu.solvers import gmres

    s, A32 = heat32
    b32 = s.b.astype(jnp.float32)
    base = precond.chebyshev(s.A, degree=8)
    fused = precond.chebyshev(A32, lmin=base.lmin, lmax=base.lmax, degree=8,
                              fused=True, block_rows=2048, interpret=True)
    plain = precond.Chebyshev(A=A32, lmin=base.lmin, lmax=base.lmax, degree=8)
    x_f, inf_f = gmres(A32, b32, k=25, tol=1e-4, pre=fused)
    x_p, inf_p = gmres(A32, b32, k=25, tol=1e-4, pre=plain)
    assert inf_f["steps"] == inf_p["steps"]
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_p), atol=1e-3)


def test_auto_gate_off_on_cpu(heat32):
    s, A32 = heat32
    p = precond.chebyshev(A32, degree=8)  # auto: CPU backend → unfused
    assert p.datawin is None
    # f64 never fuses even when forced
    p64 = precond.chebyshev(s.A, degree=8, fused=True)
    assert p64.datawin is None
