"""Pallas TPU kernel for DIA SpMV (tile-aligned 2-D formulation).

Goal: HBM traffic of exactly ``nnz + n + n`` elements per SpMV — the
bandwidth roofline — versus the XLA roll-chain which re-materialises a
shifted copy of x per diagonal.

Layout: vectors are viewed lane-major as (sublanes, 128).  A flat shift by
``s = q·128 + r`` decomposes into a static sublane slice (by q and q+1) and a
lane rotation by r, merged with a lane-index select at the seam — all
tile-aligned vector ops, no gathers, no unaligned slices (1-D formulations
hit Mosaic limitations on this toolchain; see git history).

Each grid program receives its x tile plus a small per-block halo table
(the first sublanes of the next block), applies every diagonal as a VPU
multiply-add, and writes one y tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sparse import DIA

LANES = 128


def _kernel(offsets, lo, Rb, H, data_ref, x_ref, halo_ref, y_ref):
    # window W: (Rb + H, 128) — this block's sublanes plus the halo
    W = jnp.concatenate([x_ref[:], halo_ref[0]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Rb, LANES), 1)

    acc = None
    for d, off in enumerate(offsets):
        s = lo + off
        q, r = divmod(s, LANES)
        A = W[q : q + Rb, :]
        if r == 0:
            seg = A
        else:
            B = W[q + 1 : q + 1 + Rb, :]
            shift = jnp.asarray(LANES - r, jnp.int32)  # i64 shifts crash Mosaic
            rollA = pltpu.roll(A, shift, 1)
            rollB = pltpu.roll(B, shift, 1)
            seg = jnp.where(lane < jnp.int32(LANES - r), rollA, rollB)
        term = data_ref[d] * seg
        acc = term if acc is None else acc + term
    y_ref[:] = acc


def _window_geometry(n: int, offsets, block_rows: int):
    """Shared tile/halo geometry for the windowed-x kernels."""
    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)
    R = min(block_rows, max(((n + LANES - 1) // LANES) * LANES, LANES))
    R = ((R + LANES - 1) // LANES) * LANES
    Rb = R // LANES
    n_pad = ((n + R - 1) // R) * R
    grid_n = n_pad // R
    H = (lo + hi) // LANES + 2
    H = ((H + 7) // 8) * 8  # sublane-align the halo block
    return lo, hi, R, Rb, n_pad, grid_n, H


def _windowed_x(x: jnp.ndarray, n: int, lo: int, hi: int, wrap: bool,
                n_pad: int, grid_n: int, Rb: int, H: int):
    """Build the lane-major main view and per-program halo table of x."""
    if wrap:
        head = x[:hi] if hi else x[:0]
        tail = x[n - lo:] if lo else x[:0]
        x_ext = jnp.concatenate([tail, x, head])
    else:
        x_ext = jnp.concatenate(
            [jnp.zeros((lo,), x.dtype), x, jnp.zeros((hi,), x.dtype)]
        )
    tot = n_pad + H * LANES
    extra = tot - x_ext.shape[0]
    if extra > 0:
        x_ext = jnp.concatenate([x_ext, jnp.zeros((extra,), x.dtype)])
    x2d = x_ext[:tot].reshape(-1, LANES)
    idx = (jnp.arange(grid_n)[:, None] + 1) * Rb + jnp.arange(H)[None, :]
    halo = x2d[idx]  # (grid_n, H, 128)
    return x2d[: n_pad // LANES], halo


def dia_spmv_pallas(A: DIA, x: jnp.ndarray, block_rows: int = 16384,
                    interpret: bool = False) -> jnp.ndarray:
    n = A.shape[0]
    offsets = A.offsets
    lo, hi, R, Rb, n_pad, grid_n, H = _window_geometry(n, offsets, block_rows)
    xmain, halo = _windowed_x(x, n, lo, hi, A.wrap, n_pad, grid_n, Rb, H)

    data = A.data
    if n_pad != n:
        data = jnp.concatenate(
            [data, jnp.zeros((data.shape[0], n_pad - n), data.dtype)], axis=1
        )
    data3 = data.reshape(data.shape[0], n_pad // LANES, LANES)

    # index maps: derive constants from the program id (i - i == 0) so every
    # returned index is i32 — bare Python 0 literals promote to i64 under
    # x64 mode and Mosaic fails to legalize the i64 func.return
    kern = partial(_kernel, offsets, lo, Rb, H)
    y = pl.pallas_call(
        kern,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((data3.shape[0], Rb, LANES), lambda i: (i - i, i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, LANES), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
            # per-program halo block (leading dim 1; last two dims aligned)
            pl.BlockSpec((1, H, LANES), lambda i: (i, i - i, i - i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, LANES), lambda i: (i, i - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES), x.dtype),
        interpret=interpret,
    )(data3, xmain, halo)
    return y.reshape(-1)[:n]


def _const_kernel(offsets, lo, Rb, H, const_ref, x_ref, halo_ref, y_ref):
    """Constant-coefficient stencil: no matrix data blocks touch HBM at all
    (traffic = x tile + halo + y tile).  Lane rotations are the VPU
    bottleneck (scripts/tpu_probe25.py), so the whole window is rotated ONCE
    per *distinct* lane shift and every diagonal sharing that shift reads
    free slices of it (an MXU shift-matrix formulation was tried and is
    slower: f32 needs HIGHEST precision = 6-pass bf16 emulation)."""
    W = jnp.concatenate([x_ref[:], halo_ref[0]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Rb, LANES), 1)

    # one full-window rotation per distinct lane shift r
    by_r = {}
    for d, off in enumerate(offsets):
        q, r = divmod(lo + off, LANES)
        by_r.setdefault(r, []).append((d, q))
    rolled = {
        r: pltpu.roll(W, jnp.asarray(LANES - r, jnp.int32), 1)
        for r in by_r if r != 0
    }

    acc = None
    for r, diags in sorted(by_r.items()):
        if r == 0:
            for d, q in diags:
                term = const_ref[d, 0] * W[q : q + Rb, :]
                acc = term if acc is None else acc + term
            continue
        Wr = rolled[r]
        sel = lane < jnp.int32(LANES - r)
        for d, q in diags:
            seg = jnp.where(sel, Wr[q : q + Rb, :], Wr[q + 1 : q + 1 + Rb, :])
            term = const_ref[d, 0] * seg
            acc = term if acc is None else acc + term
    y_ref[:] = acc


def stencil_spmv_pallas(S, x: jnp.ndarray, block_rows: int = 65536,
                        interpret: bool = False) -> jnp.ndarray:
    """Matrix-free constant-stencil SpMV (the ``C`` part of ``A = C + E``;
    the caller applies the boundary-strip ``E`` correction).  HBM traffic is
    ``~2n + pad`` elements versus ``nnz + 2n`` for explicit DIA."""
    n = S.shape[0]
    offsets = S.offsets
    lo, hi, R, Rb, n_pad, grid_n, H = _window_geometry(n, offsets, block_rows)
    xmain, halo = _windowed_x(x, n, lo, hi, S.wrap, n_pad, grid_n, Rb, H)
    const2d = S.const.reshape(-1, 1)

    kern = partial(_const_kernel, offsets, lo, Rb, H)
    y = pl.pallas_call(
        kern,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((const2d.shape[0], 1), lambda i: (i - i, i - i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Rb, LANES), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, LANES), lambda i: (i, i - i, i - i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Rb, LANES), lambda i: (i, i - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES), x.dtype),
        interpret=interpret,
    )(const2d, xmain, halo)
    return y.reshape(-1)[:n]
