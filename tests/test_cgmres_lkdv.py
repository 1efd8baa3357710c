"""End-to-end CGMRES validation on the lkdv problem.

Formalises the reference's manual oracles (SURVEY §4): direct-solver
comparison, invariant-deviation comparison, and the ≥2× conservation-gain
bar promoted from a warning (reference heat/TimedSolve.py:75-80) to an
assertion.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from structurepreservingiterativesolvers_tpu.models import lkdv
from structurepreservingiterativesolvers_tpu.solvers import cgmres, cgmres_p, gmres


@pytest.fixture(scope="module")
def easy():
    return lkdv.linforms(degree=1, M=50, N=100)


@pytest.fixture(scope="module")
def hard():
    return lkdv.linforms(degree=3, M=100, N=100)


def devs(sys_, x):
    inv = sys_.compute_invariants(x)
    return np.array(
        [
            float(inv["mass"] - sys_.m0),
            float(inv["momentum"] - sys_.mo0),
            float(inv["energy"] - sys_.e0),
        ]
    )


def test_direct_solve_preserves_invariants(easy):
    x = spla.spsolve(easy.A_csr, np.asarray(easy.b))
    assert np.abs(devs(easy, jnp.asarray(x))).max() < 1e-11


def test_cgmres_matches_direct(easy):
    x_dir = spla.spsolve(easy.A_csr, np.asarray(easy.b))
    x, info = cgmres(
        easy.A, easy.b, k=30, tol=1e-10, constraints=easy.constraints()
    )
    assert info["safety"] is True
    rel = np.max(np.abs(np.asarray(x) - x_dir) / np.abs(x_dir))
    assert rel < 1e-7


def test_cgmres_p_single_solve(easy):
    """SingleSolve parity: prototypical CGMRES at k=20, tol irrelevant
    (reference lkdv/SingleSolve.py:31-34)."""
    x, info = cgmres_p(easy.A, easy.b, k=20, constraints=easy.constraints())
    assert info["name"] == "geosolve"
    assert info["steps"] == 20
    assert np.abs(devs(easy, x)).max() < 1e-10


def test_cgmres_beats_gmres_on_invariants(hard):
    """The headline property: at equal iteration budget and tolerance, CGMRES
    invariant deviations are ≥2× (here: orders of magnitude) smaller."""
    k, tol = 50, 1e-6
    xg, _ = gmres(hard.A, hard.b, k=k, tol=tol)
    xc, ci = cgmres(hard.A, hard.b, k=k, tol=tol, constraints=hard.constraints())
    dg = np.abs(devs(hard, xg))
    dc = np.abs(devs(hard, xc))
    assert ci["safety"] is True
    assert dc.max() < 1e-10
    # ≥2× gain on every invariant (the reference's warning threshold)
    assert np.all(dc * 2.0 <= dg + 1e-16)


def test_cgmres_gating_counts(hard):
    """Constraints only enter the endgame: most steps must be unconstrained
    (reference solvers.py:230 gating)."""
    _, info = cgmres(hard.A, hard.b, k=50, tol=1e-6, constraints=hard.constraints())
    assert info["constrained_steps"] >= 1
    assert info["constrained_steps"] <= 3
    assert info["steps"] >= 10


def test_cgmres_residual_still_converges(hard):
    """Constraint enforcement must not destroy residual convergence: the
    constrained residual tracks the unconstrained one closely."""
    k, tol = 50, 1e-6
    _, gi = gmres(hard.A, hard.b, k=k, tol=tol)
    _, ci = cgmres(hard.A, hard.b, k=k, tol=tol, constraints=hard.constraints())
    assert ci["res"][-1] < 5.0 * gi["res"][min(ci["steps"], gi["steps"]) - 1]


def test_history_contract(easy):
    """info['x'][0] is the initial residual vector; consumers index from 1
    (reference quirk, solvers.py:75-80)."""
    x, info = cgmres(
        easy.A, easy.b, k=10, tol=1e-10, constraints=easy.constraints(),
        history=True,
    )
    r0 = np.asarray(easy.b)  # x0 = 0 ⇒ r0 = b
    np.testing.assert_allclose(info["x"][0], r0, rtol=1e-12)
    np.testing.assert_allclose(info["x"][info["steps"]], np.asarray(x), rtol=1e-12)


def test_general_constraint_matches_quadratic(hard):
    """A general (callable, autodiff) spelling of the energy constraint must
    reproduce the quadratic fast path (dict-form parity, reference
    lkdvRK/LinearSolver.py:29-79)."""
    import jax.numpy as jnp

    from structurepreservingiterativesolvers_tpu.constraints.general import (
        GeneralConstraint,
    )

    sys_ = hard
    mass_q, mom_q, energy_q = sys_.constraints()
    Mmat, e0 = sys_.Mmat, sys_.e0

    def energy_fn(x):
        u, v, w = jnp.split(x, 3)
        return 0.5 * jnp.dot(w, Mmat @ w) - 0.5 * jnp.dot(u, Mmat @ u) - e0

    gen = GeneralConstraint(func=energy_fn, name="energy")
    k, tol = 50, 1e-6
    xq, iq = cgmres(sys_.A, sys_.b, k=k, tol=tol,
                    constraints=[mass_q, mom_q, energy_q])
    xg, ig = cgmres(sys_.A, sys_.b, k=k, tol=tol,
                    constraints=[mass_q, mom_q, gen])
    assert ig["safety"] is True
    dq = np.abs(devs(sys_, xq))
    dg = np.abs(devs(sys_, xg))
    assert dg.max() < 1e-9
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xq), rtol=1e-6, atol=1e-10)


def test_lkdv_cg_space():
    """CG (continuous) spatial discretisation end-to-end (reference lkdv
    supports space='CG', lkdv/lkdv.py:27)."""
    sys_ = lkdv.linforms(M=40, degree=2, space="CG")
    x_dir = spla.spsolve(sys_.A_csr, np.asarray(sys_.b))
    assert np.abs(devs(sys_, jnp.asarray(x_dir))).max() < 1e-10
    x, info = cgmres(sys_.A, sys_.b, k=40, tol=1e-8,
                     constraints=sys_.constraints())
    assert info["safety"] is True
    assert np.abs(devs(sys_, x)).max() < 1e-10
