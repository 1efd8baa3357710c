"""Golden-trace regression tests: residual histories are pinned so numerical
behaviour changes are caught (the role the reference's recorded experiment
outputs play, formalised)."""

import json
import os

import numpy as np

from structurepreservingiterativesolvers_tpu.models import lkdv
from structurepreservingiterativesolvers_tpu.solvers import cgmres, gmres

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_lkdv.json")


def test_lkdv_residual_traces_stable():
    with open(GOLDEN) as fh:
        gold = json.load(fh)
    s = lkdv.linforms(M=50, degree=1, N=100)
    _, gi = gmres(s.A, s.b, k=20, tol=1e-50)
    _, ci = cgmres(s.A, s.b, k=20, tol=1e-8, constraints=s.constraints())
    # rtol for the convergent regime, atol floors out machine-noise
    # residuals (~1e-13 of the initial residual)
    floor = 1e-12 * gold["gmres_res"][0]
    np.testing.assert_allclose(gi["res"], gold["gmres_res"], rtol=1e-6, atol=floor)
    np.testing.assert_allclose(ci["res"], gold["cgmres_res"], rtol=1e-4, atol=floor)
    assert ci["steps"] == gold["cgmres_steps"]
    assert ci["safety"] is (gold["cgmres_safety"] is True)
    assert abs(ci["deviation"]) <= 10 * max(gold["cgmres_deviation"], 1e-15)
