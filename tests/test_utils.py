"""Utility-layer smoke tests (profiling counters, config, native fallback)."""

import numpy as np

from structurepreservingiterativesolvers_tpu import config
from structurepreservingiterativesolvers_tpu.utils import profiling


def test_profiling_counters():
    sw = profiling.Stopwatch()
    sw.mark("a")
    assert sw.marks["a"] >= 0.0
    assert profiling.spmv_throughput(1000, 0.001) == 1e6
    out = profiling.solve_throughput({"steps": 10}, nnz=500, seconds=0.5)
    assert out["iterations_per_s"] == 20.0
    assert out["spmv_nnz_per_s"] == 2 * 10 * 500 / 0.5


def test_config_dtype_cpu():
    # under the test conftest we are on CPU with x64 enabled
    assert not config.is_tpu()
    assert config.default_dtype() == np.dtype("float64")
    assert config.CTOL == 1e-12


def test_checkpoint_roundtrip(tmp_path):
    from structurepreservingiterativesolvers_tpu.utils.checkpoint import (
        load_state,
        save_state,
    )

    path = str(tmp_path / "c.npz")
    save_state(path, 7, np.arange(5.0), {"mass": [1.0, 2.0], "time": [0.0, 0.1]})
    step, z, series = load_state(path)
    assert step == 7
    np.testing.assert_allclose(z, np.arange(5.0))
    assert series["mass"] == [1.0, 2.0]
    assert load_state(str(tmp_path / "missing.npz")) is None
