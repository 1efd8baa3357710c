"""Pallas TPU kernel for DIA SpMV.

Strategy: one padded host-side window ``x_ext = [x-tail | x | x-head]`` turns
the (possibly periodic) matrix into pure contiguous-slice reads.  The kernel
grids over row blocks; each program receives its x block and a small
precomputed *halo* (the first ``span`` elements of the next block) through
standard BlockSpecs — no manual DMA, fully pipelined by the Mosaic runtime —
and applies every diagonal as a VPU multiply-add over statically-offset
slices of ``concat(x_block, halo)``.  HBM traffic per SpMV is
``nnz + n(1 + span/R) + n`` elements — the bandwidth roofline.

(The earlier variant that DMA'd overlapping windows from ANY memory crashes
the Mosaic compiler on this toolchain; static unaligned VMEM slices compile
fine, hence this formulation.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sparse import DIA


def _kernel(offsets, lo, R, data_ref, x_ref, halo_ref, y_ref):
    i = pl.program_id(0)

    def seg(shift):
        if shift == 0:
            return x_ref[:]
        return jnp.concatenate([x_ref[shift:], halo_ref[i, :shift]])

    acc = data_ref[0, :] * seg(lo + offsets[0])
    for d in range(1, len(offsets)):
        acc = acc + data_ref[d, :] * seg(lo + offsets[d])
    y_ref[:] = acc


def dia_spmv_pallas(A: DIA, x: jnp.ndarray, block_rows: int = 16384,
                    interpret: bool = False) -> jnp.ndarray:
    n = A.shape[0]
    offsets = A.offsets
    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)
    span = lo + hi
    span_pad = max(((span + 127) // 128) * 128, 128)

    R = min(block_rows, max(((n + 127) // 128) * 128, 128))
    n_pad = ((n + R - 1) // R) * R
    grid_n = n_pad // R

    if A.wrap:
        head = x[:hi] if hi else x[:0]
        tail = x[n - lo:] if lo else x[:0]
        x_ext = jnp.concatenate([tail, x, head])
    else:
        x_ext = jnp.concatenate(
            [jnp.zeros((lo,), x.dtype), x, jnp.zeros((hi,), x.dtype)]
        )
    extra = (n_pad + span_pad) - x_ext.shape[0]
    if extra > 0:
        x_ext = jnp.concatenate([x_ext, jnp.zeros((extra,), x.dtype)])

    # per-block halo: halo[i] = x_ext[(i+1)*R : (i+1)*R + span_pad]
    idx = (jnp.arange(grid_n)[:, None] + 1) * R + jnp.arange(span_pad)[None, :]
    halo = x_ext[jnp.minimum(idx, x_ext.shape[0] - 1)]
    xblocks = x_ext[: n_pad]

    data = A.data
    if n_pad != n:
        data = jnp.concatenate(
            [data, jnp.zeros((data.shape[0], n_pad - n), data.dtype)], axis=1
        )

    kern = partial(_kernel, offsets, lo, R)
    y = pl.pallas_call(
        kern,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((data.shape[0], R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
            # the halo table is tiny (grid × span_pad): keep it whole in
            # VMEM and index by program id
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), x.dtype),
        interpret=interpret,
    )(data, xblocks, halo)
    return y[:n]
