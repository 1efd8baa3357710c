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


def test_f32_storage_warm_start_dd_t0(sys_):
    """Mixed-precision path with f32 storage and a NONZERO x0: t0 = g(x0)
    is evaluated in double-f32 (constraints/quadratic.py::dd_constraint_value)
    and the certificate must still hold to the roundoff-floored latch."""
    import jax.numpy as jnp

    s32 = lkdv.linforms(M=50, degree=1, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(
        np.asarray(s32.b, np.float64)
        + 1e-3 * rng.standard_normal(s32.b.shape[0]),
        jnp.float32,
    )
    x, info = cgmres(
        s32.A, s32.b, x0=x0, k=20, tol=1e-5, constraints=s32.constraints()
    )
    assert info["safety"] is True
    inv = s32.compute_invariants(np.asarray(x, np.float64))
    # f32 iterate: invariants hold to the f32-iterate roundoff scale
    assert abs(float(inv["mass"] - s32.m0)) < 1e-3
    assert abs(float(inv["energy"] - s32.e0)) < 1e-3
    # info["deviation"] now certifies the ASSEMBLED returned iterate (dd
    # evaluation + projection epilogue, constraints/projection.py) — at
    # n=300 the f32 assembly floor is ~1e-6, far under the 1e-3 bound above
    # but not the reduced-space 1e-12 the pre-round-4 field reported
    assert info["deviation"] < 1e-5


def test_cgmres_without_constraints_degenerates_to_gmres():
    """m=0 must not crash (the far-branch machinery stacks per-constraint
    evaluations) and must behave like plain GMRES."""
    import numpy as np

    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import cgmres, gmres

    s = heat.linforms(M=24)
    xc, ic = cgmres(s.A, s.b, k=30, tol=1e-9, constraints=())
    xg, ig = gmres(s.A, s.b, k=30, tol=1e-9)
    assert ic["steps"] == ig["steps"]
    np.testing.assert_allclose(
        np.asarray(xc), np.asarray(xg), rtol=1e-10, atol=1e-12
    )


def test_explicit_snap_unsupported_constraint_clear_error():
    """snap=True with a non-dd-evaluable or general constraint must raise a
    nameable ValueError up front, not a trace-time failure inside _dd_matvec
    (advisor r4 #4)."""
    import jax.numpy as jnp
    import pytest

    from structurepreservingiterativesolvers_tpu.constraints.general import (
        GeneralConstraint,
    )
    from structurepreservingiterativesolvers_tpu.models import heat

    s = heat.linforms(M=16, dtype=jnp.float32)
    gen = GeneralConstraint(
        func=lambda x: jnp.dot(x, x) - 1.0,
        name="unit-sphere",
    )
    with pytest.raises(ValueError, match="unit-sphere"):
        cgmres(s.A, s.b, k=10, tol=1e-5, constraints=(gen,), snap=True)
