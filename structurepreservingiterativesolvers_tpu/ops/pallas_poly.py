"""Fused polynomial-in-A apply (time-tiled stencil) — Pallas TPU kernel.

The polynomial preconditioners (``precond/chebyshev.py``) replace the
reference's ILU/AMG triangular machinery (reference lkdvRK/Evolve.py:51-52,
heat/TimedSolve.py:30-31) with degree-p short recurrences: p SpMVs per
apply.  Issued as p separate XLA ops, every step re-reads the operator's
diagonals and the full vector from HBM — p·(nnz + 2n) traffic for an
operation whose arithmetic intensity allows nnz + 2n.

This kernel is the TPU answer: classic stencil *time-tiling* (trapezoidal
decomposition).  Each grid program loads one x window of
``R + 2·p·span`` elements and the matching diagonal-data windows into VMEM,
runs ALL p recurrence steps locally (each A-apply contaminates ≤span edge
elements per side per step — the halo budget absorbs exactly p of them),
and writes one exact R-sized output tile.  The diagonal-data windows are
static per operator and cached at preconditioner build time, so a full
degree-p apply costs ~(nnz + 2n)(1+2p·span/R) HBM traffic — ~p× less than
the unfused path at large n.

Shift mechanics per A-apply mirror ``pallas_spmv.py``: a flat circular
shift by ``s = q·128 + r`` inside the window = sublane roll by q / q+1 +
lane roll by r merged with a lane-index select (tile-aligned vector ops
only; Mosaic limits on this toolchain reject 1-D forms).  Circular wrap
inside the window brings edge garbage, which the same halo budget absorbs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sparse import DIA

LANES = 128
SUBS = 8  # sublane alignment


VMEM_BUDGET = 12 * 2**20  # scoped VMEM limit is 16 MB; leave compiler slack


def fit_block_rows(n: int, offsets: Tuple[int, ...], degree: int,
                   requested: int = 131072) -> int:
    """Largest block size whose kernel working set fits scoped VMEM.

    Working set ≈ (2× double-buffered data windows + ~18 vector
    temporaries/stack slots) × window — calibrated against a real Mosaic
    scoped-VMEM OOM (heat M=512, degree 8: the old (ndiag+6) model predicted
    7.3 MB where the compiler allocated 17.55 MB and overflowed the 16 MB
    scoped limit).  Returns 0 when even the smallest tile cannot fit (caller
    falls back to the unfused path)."""
    ndiag = len(offsets)
    br = requested
    while br >= 1024:
        _, _, _, _, _, _, _, Wb = _plan(n, offsets, degree, br)
        if (2 * ndiag + 18) * Wb * LANES * 4 <= VMEM_BUDGET:
            return br
        br //= 2
    return 0


def _plan(n: int, offsets: Tuple[int, ...], degree: int, block_rows: int):
    """Static tiling plan: output tile R, window W (rows), halo rows."""
    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)
    span = max(lo, hi)
    halo = degree * span + LANES  # one extra lane-block of slack
    halo_rows = ((halo + LANES - 1) // LANES + SUBS - 1) // SUBS * SUBS

    R = min(block_rows, max(((n + LANES - 1) // LANES) * LANES, LANES))
    R = ((R + LANES - 1) // LANES) * LANES
    n_pad = ((n + R - 1) // R) * R
    grid_n = n_pad // R
    Rb = R // LANES
    Wb = Rb + 2 * halo_rows  # window rows (sublanes)
    return lo, hi, R, Rb, n_pad, grid_n, halo_rows, Wb


def _extend(x: jnp.ndarray, n: int, halo: int, n_pad: int, wrap: bool):
    """ext[j] = x[(j - halo) mod n] (wrap) or zero-padded x, length
    halo + n_pad + halo (a multiple of 128).

    The centre is a plain copy; only the 2·halo + (n_pad−n) edge elements
    are gathered — an arbitrary element-level gather over the whole window
    set is catastrophically slow on TPU (probe26: 10.5 ms vs 0.5 ms for the
    whole apply), while this layout leaves one aligned ROW gather per
    window."""
    if wrap:
        left = jnp.take(x, jnp.arange(-halo, 0) % n)
        right = jnp.take(x, jnp.arange(n, n_pad + halo) % n)
    else:
        left = jnp.zeros((halo,), x.dtype)
        right = jnp.zeros((n_pad + halo - n,), x.dtype)
    return jnp.concatenate([left, x, right])


def _row_windows(ext2d: jnp.ndarray, grid_n: int, Rb: int, Wb: int):
    """Overlapping (Wb, 128) row windows of the extended 2-D view — one
    aligned row gather, vectorised by XLA."""
    rows = jnp.arange(grid_n)[:, None] * Rb + jnp.arange(Wb)[None, :]
    return ext2d[rows]  # (grid_n, Wb, 128)


def window_data(A: DIA, degree: int, block_rows: int = 65536):
    """Pre-gather the per-block diagonal-data windows (build-time, cached
    on the preconditioner).  Returns (grid_n, ndiag, Wb, 128)."""
    n = A.shape[0]
    lo, hi, R, Rb, n_pad, grid_n, halo_rows, Wb = _plan(
        n, A.offsets, degree, block_rows)
    halo = halo_rows * LANES
    wins = []
    for d in range(A.data.shape[0]):
        ext = _extend(A.data[d], n, halo, n_pad, A.wrap)
        wins.append(_row_windows(ext.reshape(-1, LANES), grid_n, Rb, Wb))
    return jnp.stack(wins, axis=1)  # (grid_n, ndiag, Wb, 128)


def window_vector(x: jnp.ndarray, A_offsets, wrap: bool, degree: int,
                  block_rows: int = 65536):
    n = x.shape[0]
    lo, hi, R, Rb, n_pad, grid_n, halo_rows, Wb = _plan(
        n, A_offsets, degree, block_rows)
    halo = halo_rows * LANES
    ext = _extend(x, n, halo, n_pad, wrap)
    return _row_windows(ext.reshape(-1, LANES), grid_n, Rb, Wb)


def _shift_circ(u: jnp.ndarray, s: int, Wb: int):
    """out[j] = u[(j + s) mod W] on the (Wb, 128) lane-major view.

    Shifts are Python ints resolved at trace time; pltpu.roll shift
    arguments are cast to i32 explicitly (bare ints promote to i64 under
    x64 mode, which Mosaic rejects)."""
    q, r = divmod(s % (Wb * LANES), LANES)
    A = pltpu.roll(u, jnp.int32((Wb - q) % Wb), 0)
    if r == 0:
        return A
    B = pltpu.roll(u, jnp.int32((Wb - q - 1) % Wb), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    rollA = pltpu.roll(A, jnp.int32(LANES - r), 1)
    rollB = pltpu.roll(B, jnp.int32(LANES - r), 1)
    return jnp.where(lane < jnp.int32(LANES - r), rollA, rollB)


def _apply_local(datawin, u, offsets, Wb):
    acc = None
    for d, off in enumerate(offsets):
        term = datawin[d] * _shift_circ(u, off, Wb)
        acc = term if acc is None else acc + term
    return acc


def _cheb_kernel(offsets, Wb, Rb, halo_rows, degree, theta, delta, sigma,
                 data_ref, v_ref, y_ref):
    data = data_ref[0]
    v = v_ref[0]
    Av = partial(_apply_local, data, offsets=offsets, Wb=Wb)

    rho = 1.0 / sigma
    x = v / theta
    r = v - Av(x)
    d = (2.0 * rho / delta) * r
    for _ in range(degree - 1):
        x = x + d
        r = r - Av(d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * r
        rho = rho_new
    out = x + d
    y_ref[:] = out[halo_rows: halo_rows + Rb, :]


def _neumann_kernel(offsets, Wb, Rb, halo_rows, degree, omega,
                    data_ref, dinv_ref, v_ref, y_ref):
    data = data_ref[0]
    dinv = dinv_ref[0]
    v = v_ref[0]
    Av = partial(_apply_local, data, offsets=offsets, Wb=Wb)

    z = omega * (dinv * v)
    acc = z
    for _ in range(degree - 1):
        z = z - omega * (dinv * Av(z))
        acc = acc + z
    y_ref[:] = acc[halo_rows: halo_rows + Rb, :]


def _call(kern, nin, datawins, vwin, n, Rb, grid_n, interpret):
    Wb = vwin.shape[1]
    in_specs = []
    for dw in datawins:
        nd = dw.ndim  # bind per-spec (late-binding lambda pitfall); i-i
        in_specs.append(  # keeps every returned index i32 (Mosaic: no i64)
            pl.BlockSpec((1,) + dw.shape[1:],
                         lambda i, nd=nd: (i,) + (i - i,) * (nd - 1),
                         memory_space=pltpu.VMEM))
    in_specs.append(
        pl.BlockSpec((1, Wb, LANES), lambda i: (i, i - i, i - i),
                     memory_space=pltpu.VMEM))
    y = pl.pallas_call(
        kern,
        grid=(grid_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Rb, LANES), lambda i: (i, i - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * Rb, LANES), vwin.dtype),
        interpret=interpret,
    )(*datawins, vwin)
    return y.reshape(-1)[:n]


def cheb_apply_fused(datawin, offsets, wrap, n, degree,
                     theta: float, delta: float, sigma: float,
                     v: jnp.ndarray, block_rows: int = 65536,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused degree-``degree`` Chebyshev apply: p(A) v in ONE kernel pass."""
    lo, hi, R, Rb, n_pad, grid_n, halo_rows, Wb = _plan(
        n, offsets, degree, block_rows)
    vwin = window_vector(v, offsets, wrap, degree, block_rows)
    kern = partial(_cheb_kernel, offsets, Wb, Rb, halo_rows, degree,
                   theta, delta, sigma)
    return _call(kern, 1, [datawin], vwin, n, Rb, grid_n, interpret)


def neumann_apply_fused(datawin, dinvwin, offsets, wrap, n, degree,
                        omega: float, v: jnp.ndarray,
                        block_rows: int = 65536,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused truncated-Neumann apply: ω Σ (I − ω D⁻¹A)^i D⁻¹ v, one pass."""
    lo, hi, R, Rb, n_pad, grid_n, halo_rows, Wb = _plan(
        n, offsets, degree, block_rows)
    vwin = window_vector(v, offsets, wrap, degree, block_rows)
    kern = partial(_neumann_kernel, offsets, Wb, Rb, halo_rows, degree, omega)
    return _call(kern, 2, [datawin, dinvwin], vwin, n, Rb, grid_n, interpret)
