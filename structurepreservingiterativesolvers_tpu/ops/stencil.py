"""Constant-stencil (matrix-free) operator: the TPU-native fast path for
structured-grid FEM matrices.

Every reference problem assembles its operator on a *uniform* structured mesh
(reference lkdv/lkdv.py:48, heat/heat.py:35-121, swe/swe.py:90-99,
lkdvRK/lkdvRK.py:113-124), so away from the boundary every row of ``A`` is
the same stencil: ``A = C + E`` where ``C`` has one constant per diagonal and
``E`` is a sparse residual touching only O(boundary) rows.  The reference
pays scipy-CSR traffic (indices + values per nonzero) for what is really a
convolution; here the SpMV reads **no matrix data at all** on the constant
part — HBM traffic drops from ``nnz + 2n`` elements (the DIA roofline) to
``~2n`` plus an O(boundary) correction, a >3× bandwidth win for 7-diagonal
operators and the dominant cost of every Krylov iteration
(reference solvers.py:95,191,370).

``maybe_stencil`` performs the host-side decomposition at assembly time
(exact on uncorrected rows, ulp-level on the O(boundary) corrected rows) and
returns the original ``DIA`` unchanged when the matrix is not stencil-like,
so nothing downstream needs to care.  ``Stencil`` mirrors
the DIA operator surface (``@``, ``shape``, ``nnz``, ``todense``, ``astype``,
``.data``/``.offsets``) and keeps the full ``DIA`` as a field for consumers
that need explicit matrix values (preconditioner setup, sharding, SpMM
catch-up, oracles).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import DIA, PALLAS_MIN_N, _register, _shift


@_register
@dataclasses.dataclass(frozen=True)
class Stencil:
    """``A = C + E``: per-diagonal constants ``const`` plus a row-sparse
    exact residual (``resid_idx`` rows with per-diagonal values
    ``resid_vals``).  ``dia`` is the full operator for fallback paths."""

    dia: DIA
    const: jnp.ndarray  # (ndiag,)
    resid_idx: jnp.ndarray  # (ncorr,) int32, padded with 0
    resid_vals: jnp.ndarray  # (ncorr, ndiag), padded with 0.0
    offsets: Tuple[int, ...]  # static
    shape: Tuple[int, int]  # static
    wrap: bool  # static
    engine: str = "auto"  # static: 'auto' | 'xla'

    _static = ("offsets", "shape", "wrap", "engine")

    # -- DIA-compatible surface -------------------------------------------
    @property
    def data(self):
        return self.dia.data

    @property
    def nnz(self) -> int:
        return self.dia.nnz

    @property
    def dtype(self):
        return self.dia.dtype

    @property
    def ncorr(self) -> int:
        return int(self.resid_idx.shape[0])

    def __matmul__(self, other):
        if other.ndim == 1:
            return stencil_spmv(self, other)
        return stencil_spmm(self, other)

    def astype(self, dtype):
        return dataclasses.replace(
            self,
            dia=self.dia.astype(dtype),
            const=self.const.astype(dtype),
            resid_vals=self.resid_vals.astype(dtype),
        )

    def todense(self) -> jnp.ndarray:
        return self.dia.todense()


def as_dia(A):
    """The explicit-matrix view of an operator (identity for plain DIA)."""
    return A.dia if isinstance(A, Stencil) else A


def maybe_stencil(A, max_corr_frac: float = 0.125):
    """Decompose a DIA matrix into constant stencil + row-sparse residual.

    The constant for each diagonal is its *mode* over in-range rows.  The
    SpMV is exact on uncorrected rows (``E`` is identically zero there, so
    ``C`` alone reproduces the row); on corrected rows ``C·x + E·x`` differs
    from ``A·x`` only by one extra f32 rounding of the split product
    (ulp-level, ~1e-7 relative in f32).  Returns ``A`` unchanged when the
    corrected-row fraction exceeds ``max_corr_frac`` (the traffic win would
    be eaten by the gather) or when ``A`` is not a DIA.
    """
    import os

    if not isinstance(A, DIA) or os.environ.get("SPIS_DISABLE_STENCIL") == "1":
        return A
    data = np.asarray(A.data)
    ndiag, n = data.shape
    const = np.zeros((ndiag,), data.dtype)
    resid = np.zeros_like(data)
    for d, off in enumerate(A.offsets):
        if A.wrap:
            inr = slice(0, n)
        else:
            inr = slice(max(0, -off), min(n, n - off))
        col = data[d, inr]
        if col.size == 0:
            continue
        vals, counts = np.unique(col, return_counts=True)
        const[d] = vals[np.argmax(counts)]
        resid[d, inr] = col - const[d]
        # out-of-range positions are structural zeros: the shifted read is 0
        # there regardless of the coefficient, so C never contributes and E
        # stays 0 — nothing to correct.
    corr_rows = np.nonzero(np.any(resid != 0.0, axis=0))[0]
    if corr_rows.size > max_corr_frac * n:
        return A
    ncorr = max(int(corr_rows.size), 1)
    ncorr_pad = ((ncorr + 7) // 8) * 8  # sublane-friendly static shape
    resid_idx = np.zeros((ncorr_pad,), np.int32)
    resid_vals = np.zeros((ncorr_pad, ndiag), data.dtype)
    resid_idx[: corr_rows.size] = corr_rows
    resid_vals[: corr_rows.size] = resid[:, corr_rows].T
    return Stencil(
        dia=A,
        const=jnp.asarray(const),
        resid_idx=jnp.asarray(resid_idx),
        resid_vals=jnp.asarray(resid_vals),
        offsets=A.offsets,
        shape=A.shape,
        wrap=A.wrap,
    )


def _gather_shifted(S: Stencil, x: jnp.ndarray, d: int):
    """x[resid_idx + off_d] with DIA shift semantics (wrap or zero-fill)."""
    n = S.shape[0]
    off = S.offsets[d]
    cols = S.resid_idx + off
    if S.wrap:
        return x[cols % n]
    valid = (cols >= 0) & (cols < n)
    return jnp.where(valid, x[jnp.clip(cols, 0, n - 1)], 0)


def _correction(S: Stencil, x: jnp.ndarray):
    acc = None
    for d in range(len(S.offsets)):
        term = S.resid_vals[:, d] * _gather_shifted(S, x, d)
        acc = term if acc is None else acc + term
    return acc


def _pallas_ok(S: Stencil, x) -> bool:
    if S.engine == "xla":
        return False
    n = S.shape[0]
    span = max(max(S.offsets), 0) - min(min(S.offsets), 0)
    structurally_ok = (
        x.ndim == 1
        and jnp.result_type(S.const, x) == jnp.float32
        and span < n
    )
    if S.engine == "pallas":
        return structurally_ok
    from .. import config

    return structurally_ok and n >= PALLAS_MIN_N and config.is_tpu()


def stencil_spmv(S: Stencil, x: jnp.ndarray) -> jnp.ndarray:
    if _pallas_ok(S, x):
        from .. import config
        from .pallas_spmv import stencil_spmv_pallas

        y = stencil_spmv_pallas(S, x, interpret=not config.is_tpu())
    else:
        y = jnp.zeros(S.shape[0], jnp.result_type(S.const, x))
        for d, off in enumerate(S.offsets):
            y = y + S.const[d] * _shift(x, off, S.wrap)
    return y.at[S.resid_idx].add(_correction(S, x))


def stencil_spmm(S: Stencil, X: jnp.ndarray) -> jnp.ndarray:
    Y = jnp.zeros((S.shape[0], X.shape[1]), jnp.result_type(S.const, X))
    for d, off in enumerate(S.offsets):
        Y = Y + S.const[d] * _shift(X, off, S.wrap)
    corr = None
    for d in range(len(S.offsets)):
        term = S.resid_vals[:, d, None] * _gather_shifted_rows(S, X, d)
        corr = term if corr is None else corr + term
    return Y.at[S.resid_idx].add(corr)


def _gather_shifted_rows(S: Stencil, X: jnp.ndarray, d: int):
    n = S.shape[0]
    off = S.offsets[d]
    cols = S.resid_idx + off
    if S.wrap:
        return X[cols % n]
    valid = (cols >= 0) & (cols < n)
    return jnp.where(valid[:, None], X[jnp.clip(cols, 0, n - 1)], 0)
