"""Checkpoint/resume for long evolutions.

The reference's only persistence is parameter-keyed pickles between pipeline
stages (reference lkdvRK/subcall.py:62-67, ErrorGenerator.py:57-80).  Here
checkpointing is first-class: the evolve loop can write its full state
(solution vector / stage vector, step index, drift series) every
``every`` steps and resume bit-exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_state(path: str, step: int, z, series: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        step=step,
        z=np.asarray(z),
        **{f"series_{k}": np.asarray(v) for k, v in series.items()},
    )


def load_state(path: str):
    if not os.path.exists(path):
        return None
    with np.load(path) as f:
        step = int(f["step"])
        z = f["z"]
        series = {
            k[len("series_"):]: f[k].tolist()
            for k in f.files if k.startswith("series_")
        }
    return step, z, series
