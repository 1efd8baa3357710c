"""Heat and shallow-water problem validation (reference heat/, swe/ parity)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from structurepreservingiterativesolvers_tpu.models import heat, swe
from structurepreservingiterativesolvers_tpu.solvers import cgmres, gmres


@pytest.fixture(scope="module")
def heat_sys():
    return heat.linforms(M=32)


@pytest.fixture(scope="module")
def swe_sys():
    return swe.linforms(M=32)


def test_heat_direct_satisfies_structure(heat_sys):
    s = heat_sys
    x = spla.spsolve(s.A_csr, np.asarray(s.b))
    inv = s.compute_invariants(jnp.asarray(x))
    # mass conserved; dissipation identity holds (energy "invariant" is the
    # identity residual, zero for the exact step — heat/heat.py:92-104)
    assert abs(float(inv["mass"] - s.m0)) < 1e-9
    assert abs(float(inv["energy"])) < 1e-9


def test_heat_constraints_vanish_at_direct(heat_sys):
    s = heat_sys
    x = jnp.asarray(spla.spsolve(s.A_csr, np.asarray(s.b)))
    for con in s.constraints():
        assert abs(float(con(x))) < 1e-9


def test_heat_cgmres_enforces_dissipation_identity(heat_sys):
    s = heat_sys
    k, tol = 20, 1e-7
    xg, _ = gmres(s.A, s.b, k=k, tol=tol)
    xc, ci = cgmres(s.A, s.b, k=k, tol=tol, constraints=s.constraints())
    ig, ic = s.compute_invariants(xg), s.compute_invariants(xc)
    assert ci["safety"] is True
    for key, ref0 in (("mass", s.m0), ("energy", s.e0)):
        dg = abs(float(ig[key] - ref0))
        dc = abs(float(ic[key] - ref0))
        assert dc < 1e-10
        assert 2.0 * dc <= dg + 1e-16


def test_swe_skew_symmetry(swe_sys):
    """The C-grid operator must be skew-symmetric in the energy product —
    the discrete structure behind exact energy conservation."""
    s = swe_sys
    prob = s.prob
    import scipy.sparse as sp

    n0 = s.n0
    dt = prob.dt
    # recover S from A = I/dt − S/2
    S = 2.0 * (sp.identity(3 * n0) / dt - s.A_csr)
    P = sp.diags(
        np.concatenate(
            [np.full(n0, prob.h**2), np.full(n0, prob.h**2), np.full(n0, prob.h**2 * prob.c**2)]
        )
    )
    PS = (P @ S).toarray() if n0 <= 2048 else None
    if PS is not None:
        assert np.abs(PS + PS.T).max() < 1e-12


def test_swe_direct_conserves(swe_sys):
    s = swe_sys
    x = jnp.asarray(spla.spsolve(s.A_csr, np.asarray(s.b)))
    inv = s.compute_invariants(x)
    assert abs(float(inv["mass"] - s.m0)) / (1 + abs(float(s.m0))) < 1e-13
    assert abs(float(inv["energy"] - s.e0)) / (1 + abs(float(s.e0))) < 1e-13


def test_swe_cgmres_terminates_with_safety(swe_sys):
    """Large-magnitude invariants: the safety latch must accept deviations at
    the f64 evaluation-roundoff floor instead of spinning to k."""
    s = swe_sys
    xc, ci = cgmres(s.A, s.b, k=20, tol=1e-7, constraints=s.constraints())
    assert ci["safety"] is True
    assert ci["steps"] < 15
    inv = s.compute_invariants(xc)
    assert abs(float(inv["energy"] - s.e0)) / abs(float(s.e0)) < 1e-13


def test_heat_p2_structure():
    """Degree-2 heat: mass conserved and dissipation identity enforced
    (reference heat accepts a degree parameter, heat/heat.py:23-25)."""
    s = heat.linforms(M=16, degree=2)
    x = jnp.asarray(spla.spsolve(s.A_csr, np.asarray(s.b)))
    inv = s.compute_invariants(x)
    assert abs(float(inv["mass"] - s.m0)) < 1e-9
    assert abs(float(inv["energy"])) < 1e-9
    xc, ci = cgmres(s.A, s.b, k=40, tol=1e-8, constraints=s.constraints())
    assert ci["safety"] is True
    ic = s.compute_invariants(xc)
    assert abs(float(ic["mass"] - s.m0)) < 1e-10


def test_p2_convergence_beats_p1():
    """P2 projection error of a smooth function converges faster than P1."""
    from structurepreservingiterativesolvers_tpu.models.fem2d import (
        SpaceP1,
        SpaceP2,
    )

    f = lambda x, y: np.sin(2 * np.pi * x) * np.cos(np.pi * y)
    errs = {}
    for cls in (SpaceP1, SpaceP2):
        sp_ = cls(16)
        u = sp_.project(f)
        # evaluate at vertices
        ex = f(sp_.xy[:, 0], sp_.xy[:, 1])
        errs[cls.__name__] = np.abs(u[: sp_.nv] - ex).max()
    assert errs["SpaceP2"] < 0.2 * errs["SpaceP1"]
