"""In-tree fixture assets at the reference's canonical parameters.

SURVEY §2.4 / round-4 verdict missing #4: portable pre-assembled fixtures
pin the assembled systems across rounds, so matrix-level assembly changes
(fem1d/fem2d, the RK Kronecker expansion, constraint construction) are
regression-visible.  Parameters mirror the reference drivers: lkdv M=50
degree=1 (reference lkdv/SingleSolve.py:21), lkdvRK M=50 degree=3
tstages=2 (lkdvRK/Evolve.py:19), heat M=2⁴ (heat/TimedSolve.py:114),
swe M=2⁴ (swe/TimedSolve.py:88).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from structurepreservingiterativesolvers_tpu.models import heat, lkdv, lkdvrk, swe
from structurepreservingiterativesolvers_tpu.models.fixtures import load_fixture

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")

SPECS = [
    ("lkdv", lkdv, dict(M=50, degree=1), "lkdv_M50_deg1.npz"),
    ("lkdvrk", lkdvrk, dict(M=50, degree=3, tstages=2),
     "lkdvrk_M50_deg3_s2.npz"),
    ("heat", heat, dict(M=16, degree=1), "heat_M16_deg1.npz"),
    ("swe", swe, dict(M=16, degree=1), "swe_M16_deg1.npz"),
]


@pytest.mark.parametrize("name,mod,kw,fname", SPECS, ids=[s[0] for s in SPECS])
def test_fixture_matches_live_assembly(name, mod, kw, fname):
    """The committed fixture must reproduce the live ``linforms`` system
    bit-for-bit: operator CSR, rhs, initial vector, and every constraint's
    (M, v, c).  A mismatch means the assembly changed — regenerate with
    scripts/make_fixtures.py ONLY if the change is intentional."""
    path = os.path.join(FIXDIR, fname)
    A_dev, b, z0, cons, A_csr = load_fixture(path)
    s = mod.linforms(**kw)

    live = s.A_csr.tocsr()
    live.sum_duplicates()
    stored = A_csr.tocsr()
    stored.sum_duplicates()
    assert stored.shape == live.shape
    np.testing.assert_array_equal(stored.indptr, live.indptr)
    np.testing.assert_array_equal(stored.indices, live.indices)
    np.testing.assert_array_equal(stored.data, live.data)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(s.b))
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(s.z0))

    live_cons = s.constraints()
    assert len(cons) == len(live_cons)
    for cf, cl in zip(cons, live_cons):
        assert cf.name == cl.name
        np.testing.assert_array_equal(np.asarray(cf.c), np.asarray(cl.c))
        if cl.v is None:
            assert cf.v is None or not np.any(np.asarray(cf.v))
        else:
            np.testing.assert_array_equal(np.asarray(cf.v), np.asarray(cl.v))
        if cl.M is None:
            assert cf.M is None
        else:
            np.testing.assert_array_equal(
                np.asarray(cf.M.todense()), np.asarray(cl.M.todense()))


def test_fixture_solves_and_certifies():
    """A fixture is solve-ready without any model code: CGMRES on the
    loaded (A, b, constraints) must terminate with the certificate."""
    from structurepreservingiterativesolvers_tpu.solvers import cgmres

    A, b, z0, cons, _ = load_fixture(
        os.path.join(FIXDIR, "lkdv_M50_deg1.npz"))
    x, info = cgmres(A, b, k=20, tol=1e-8, constraints=cons)
    assert info["safety"] is True
    assert info["deviation"] < 1e-12
    assert float(info["res"][-1]) < 1e-8
