"""Convergence-order assertion (the reference error pipeline's claim).

The lkdvRK error pipeline exists to show CGMRES preserves the
discretisation's convergence order while enforcing invariants exactly
(reference lkdvRK/ErrorGenerator.py:32-34, ErrorPlotter.py:11-46).  This is
the CI-sized version of docs/CONVERGENCE.md: a dt-refinement at fixed space
(degree=5 so spatial error is negligible), GL 1-stage → temporal order 2,
asserted for Exact and CGMRES, plus CGMRES error ≤ 1.05× Exact at every
level.
"""

import math

import pytest

from structurepreservingiterativesolvers_tpu.experiments import wrappers
from structurepreservingiterativesolvers_tpu.experiments.evolve import evolve
from structurepreservingiterativesolvers_tpu.experiments.timed_solve import (
    default_pre_builder,
)
from structurepreservingiterativesolvers_tpu.models import lkdvrk


def _final_err(solver, N, M=60, degree=5, tstages=1, tol=1e-11):
    if solver == "Exact":
        fn = lambda system, x0=None, k=50, tol=tol, pre=None: (  # noqa: E731
            wrappers.exact(system)[0], {"steps": -1})
        pre = None
    else:
        s0 = lkdvrk.linforms(N=N, M=M, degree=degree, tstages=tstages, T=1.0)
        pre = default_pre_builder("lkdvrk")(s0)
        fn = wrappers.cgmres_wrapper
    out = evolve("lkdvrk", N=N, M=M, degree=degree, tstages=tstages, T=1.0,
                 k=50, tol=tol, solver=fn, pre=pre, compute_error=True)
    return float(out["err"][-1])


@pytest.mark.parametrize("solver", ["Exact", "CGMRES"])
def test_observed_temporal_order(solver):
    e4 = _final_err(solver, 4)
    e8 = _final_err(solver, 8)
    order = math.log2(e4 / e8)
    assert abs(order - 2.0) < 0.4, (solver, e4, e8, order)


def test_cgmres_tracks_exact_error():
    for N in (4, 8):
        ee = _final_err("Exact", N)
        ce = _final_err("CGMRES", N)
        assert ce < 1.05 * ee, (N, ee, ce)


def test_reference_grid_point_order_resolving_tolerance():
    """CI-sized version of docs/CONVERGENCE.md's order-resolving section:
    at the reference's (degree=3, stages=2) grid point — the one where the
    discretisation error dominates — a tolerance BELOW that error must make
    CGMRES track Exact directly (measured 1.000 at reference scale M=400;
    here M=100 for CI)."""
    ee = _final_err("Exact", 10, M=100, degree=3, tstages=2, tol=1e-9)
    ce = _final_err("CGMRES", 10, M=100, degree=3, tstages=2, tol=1e-9)
    assert ce < 2.0 * ee, (ee, ce)
