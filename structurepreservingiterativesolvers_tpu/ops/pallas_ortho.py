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

DEFAULT_BLOCK_COLS = 32768
MIN_N = 65536


def _kernel(n, BN, k1, h_ref, Q_ref, w_ref, w1_ref, u2_ref):
    # pure-VPU formulation: k1 ~ 21 makes MXU dot_generals pathological on
    # f32 (HIGHEST precision = 6-pass bf16 decomposition; measured 127 GB/s
    # vs 342 for the XLA matvecs) — unrolled row FMAs + lane reductions
    # keep everything on the VPU with the Q tile resident in VMEM.
    i = pl.program_id(0)
    wb = w_ref[:]  # (1, BN)
    Qb = Q_ref[:]  # (k1, BN)
    h = h_ref[:]  # (k1, 1)
    # whole-tile sublane reduction: Σ_r h[r]·Q[r,:] in one VPU pass
    proj = jnp.sum(h * Qb, axis=0, keepdims=True)  # (1, BN)
    w1 = wb - proj
    col = jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
    valid = (i * BN + col) < n
    w1 = jnp.where(valid, w1, 0.0)
    w1_ref[:] = w1
    # whole-tile lane reduction for the partial u2; mask Q's ragged columns
    # (uninitialised padding: 0·NaN would poison the sum)
    Qz = jnp.where(valid, Qb, 0.0)
    part = jnp.sum(Qz * w1, axis=1, keepdims=True)  # (k1, 1)

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
        partial(_kernel, n, block_cols, k1),
        grid=(grid,),
        # index maps use ``i - i`` for constant coordinates: a literal 0
        # promotes the map's return to i64 under x64 mode, which Mosaic
        # rejects ("failed to legalize 'func.return' (i64, i64)")
        in_specs=[
            pl.BlockSpec((k1, 1), lambda i: (i - i, i - i)),
            pl.BlockSpec((k1, block_cols), lambda i: (i - i, i)),
            pl.BlockSpec((1, block_cols), lambda i: (i - i, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_cols), lambda i: (i - i, i)),
            pl.BlockSpec((k1, 1), lambda i: (i - i, i - i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), Q.dtype),
            jax.ShapeDtypeStruct((k1, 1), Q.dtype),
        ],
        interpret=interpret,
    )(h[:, None], Q, w[None, :])
    return w1[0], u2[:, 0]


def fused_eligible(Q, w) -> bool:
    """Gate for the fused kernel — DEFAULT OFF (documented negative result,
    round-5 probe33 at n=1.05M, k=20, v5e): the kernel reaches only
    121-136 GB/s per basis read (MXU dot_general variant 127 — f32 needs
    the 6-pass bf16 HIGHEST path at k1=21; whole-tile VPU reductions 136;
    per-row FMAs 115; 8k vs 32k blocks indistinguishable), while XLA's
    "two-sweep" update+matvec pair measures 352 GB/s against a 2-read
    traffic model — i.e. XLA already fuses the adjacent sweeps below two
    physical reads, so a hand kernel that saves one *nominal* sweep starts
    from behind.  End-to-end gmres core: 50.5-54.4 ms fused vs 48.1-48.2 ms
    plain.  ``SPIS_ORTHO_ENGINE=pallas`` forces the kernel (experiments);
    it must NOT be used on GSPMD-sharded operands (pallas_call blocks
    partitioning and would gather the basis onto one device)."""
    import os

    engine = os.environ.get("SPIS_ORTHO_ENGINE", "xla")
    structurally_ok = (
        Q.ndim == 2 and Q.dtype == jnp.float32 and w.dtype == jnp.float32
    )
    if engine == "pallas":
        return structurally_ok
    return False
