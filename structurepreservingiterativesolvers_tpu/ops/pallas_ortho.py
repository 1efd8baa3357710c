"""Pallas TPU kernel fusing the CGS projection update with the next
projection matvec — one basis read instead of two.

CGS2 (solvers/arnoldi.py::_cgs2) is the bandwidth-bound core of the
preconditioned iteration: its four (k+1, n) basis sweeps move 42× the
SpMV's traffic and run at 0.62× of HBM peak (docs/ITERATION_ROOFLINE.md).
The four sweeps are

    u1 = Q w          (read 1)
    w1 = w − u1ᵀ Q    (read 2)
    u2 = Q w1         (read 3)
    w2 = w1 − u2ᵀ Q   (read 4)

Reads 2 and 3 touch the same bytes back-to-back with an elementwise
dependency between them, but XLA materialises w1 and re-streams Q.  This
kernel computes ``w1 = w − hᵀQ`` AND the partial sums of ``u2 = Q w1``
from the same VMEM-resident Q tile — exact CGS2 arithmetic in 3 sweeps
(25% of the orthogonalisation traffic removed, no algorithm change).

Layout: Q is (k+1, n) with n minor — each grid step loads a (k+1, BN)
tile; the update is a (1,k+1)×(k+1,BN) MXU product, the partial u2 a
(k+1,BN)×(BN,1) product accumulated into a (k+1,1) output across the
sequential TPU grid.  The ragged last block is masked by global column
index (reference hot loop this accelerates: solvers.py:92-119).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_COLS = 8192
MIN_N = 65536


def _kernel(n, BN, h_ref, Q_ref, w_ref, w1_ref, u2_ref):
    i = pl.program_id(0)
    Qb = Q_ref[:]  # (k1, BN)
    wb = w_ref[:]  # (1, BN)
    h = h_ref[:]  # (k1, 1)
    proj = jax.lax.dot_general(
        h.T, Qb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, BN)
    w1 = wb - proj
    col = jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
    valid = (i * BN + col) < n
    w1 = jnp.where(valid, w1, 0.0)
    w1_ref[:] = w1
    # zero the ragged columns of Q too: the padded region of the last block
    # is uninitialised and 0·garbage (or 0·NaN) would poison the reduction
    Qz = jnp.where(valid, Qb, 0.0)
    part = jax.lax.dot_general(
        Qz, w1.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (k1, 1)

    @pl.when(i == 0)
    def _init():
        u2_ref[:] = jnp.zeros_like(u2_ref)

    u2_ref[:] += part


def fused_update_matvec(Q, w, h, block_cols: int = DEFAULT_BLOCK_COLS,
                        interpret: bool = False):
    """(w − hᵀQ,  Q (w − hᵀQ)) in one pass over Q.

    Exact CGS2 pass-2 inputs: call with h = Q w, then finish with
    ``w2 = w1 − u2ᵀ Q`` and hcol = h + u2."""
    k1, n = Q.shape
    grid = pl.cdiv(n, block_cols)
    w1, u2 = pl.pallas_call(
        partial(_kernel, n, block_cols),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((k1, 1), lambda i: (0, 0)),
            pl.BlockSpec((k1, block_cols), lambda i: (0, i)),
            pl.BlockSpec((1, block_cols), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_cols), lambda i: (0, i)),
            pl.BlockSpec((k1, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), Q.dtype),
            jax.ShapeDtypeStruct((k1, 1), Q.dtype),
        ],
        interpret=interpret,
    )(h[:, None], Q, w[None, :])
    return w1[0], u2[:, 0]


def fused_eligible(Q, w) -> bool:
    """'auto' gate: TPU backend, f32, and big enough that the saved basis
    sweep beats the kernel's fixed cost.  The kernel must NOT be used on
    GSPMD-sharded operands (pallas_call blocks partitioning and would
    gather the basis onto one device) — multi-chip solves pass
    ``ortho='cgs2_xla'`` (see solvers/arnoldi.py)."""
    import os

    engine = os.environ.get("SPIS_ORTHO_ENGINE", "auto")
    if engine == "xla":
        return False
    structurally_ok = (
        Q.ndim == 2 and Q.dtype == jnp.float32 and w.dtype == jnp.float32
    )
    if engine == "pallas":
        return structurally_ok
    from .. import config

    return structurally_ok and Q.shape[1] >= MIN_N and config.is_tpu()
