"""Cross-product of solver engineering options: every combination must
preserve the CGMRES contract (convergence + certified constraints)."""

import itertools

import numpy as np
import pytest

from structurepreservingiterativesolvers_tpu.models import lkdv
from structurepreservingiterativesolvers_tpu.solvers import cgmres


@pytest.fixture(scope="module")
def sys_():
    return lkdv.linforms(M=50, degree=1)


@pytest.mark.parametrize(
    "mixed,ortho,loop,true_residual",
    list(itertools.product([False, True], ["cgs2", "mgs"], ["while", "fori"],
                           [True, False]))[::2],  # every other combo (8)
)
def test_option_matrix(sys_, mixed, ortho, loop, true_residual):
    x, info = cgmres(
        sys_.A, sys_.b, k=20, tol=1e-8, constraints=sys_.constraints(),
        mixed=mixed, ortho=ortho, loop=loop, true_residual=true_residual,
    )
    assert info["safety"] is True, (mixed, ortho, loop, true_residual)
    inv = sys_.compute_invariants(x)
    assert abs(float(inv["mass"] - sys_.m0)) < 1e-10
    assert abs(float(inv["energy"] - sys_.e0)) < 1e-10
    assert np.isfinite(np.asarray(x)).all()
