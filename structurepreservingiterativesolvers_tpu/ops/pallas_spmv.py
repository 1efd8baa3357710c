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


def dia_spmv_pallas(A: DIA, x: jnp.ndarray, block_rows: int = 16384,
                    interpret: bool = False) -> jnp.ndarray:
    n = A.shape[0]
    offsets = A.offsets
    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)
    span = lo + hi

    R = min(block_rows, max(((n + LANES - 1) // LANES) * LANES, LANES))
    R = ((R + LANES - 1) // LANES) * LANES
    Rb = R // LANES
    n_pad = ((n + R - 1) // R) * R
    grid_n = n_pad // R
    # halo sublanes: enough to cover the largest positive shift
    H = (lo + hi) // LANES + 2
    H = ((H + 7) // 8) * 8  # sublane-align the halo block

    if A.wrap:
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
    x2d = x_ext[:tot].reshape(-1, LANES)  # (n_pad/128 + H, 128)

    # halo table: halo[i] = sublanes [(i+1)*Rb, (i+1)*Rb + H)
    idx = (jnp.arange(grid_n)[:, None] + 1) * Rb + jnp.arange(H)[None, :]
    halo = x2d[idx]  # (grid_n, H, 128)
    xmain = x2d[: n_pad // LANES]

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
