"""Pallas TPU kernel for DIA SpMV.

The XLA path (``dia_spmv``) re-reads the padded x window once per diagonal
unless fusion catches it.  This kernel makes the data movement explicit and
minimal: per row-block it DMAs the x window (block + halo) into VMEM once,
then applies every diagonal as a VPU multiply-add over statically-offset
slices of that window — so HBM traffic is exactly
``nnz + n + n`` elements per SpMV, the bandwidth roofline.

Host-side preparation (wrap → padded window) matches ``dia_spmv``: the
periodic matrix is applied as contiguous slices of
``x_ext = [x-tail | x | x-head]``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sparse import DIA


def _kernel(offsets, lo, span_pad, R, data_ref, xext_ref, y_ref, xwin, sem):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        xext_ref.at[pl.ds(i * R, R + span_pad)], xwin, sem
    )
    dma.start()
    dma.wait()
    acc = data_ref[0, :] * xwin[pl.ds(lo + offsets[0], R)]
    for d in range(1, len(offsets)):
        acc = acc + data_ref[d, :] * xwin[pl.ds(lo + offsets[d], R)]
    y_ref[:] = acc


def dia_spmv_pallas(A: DIA, x: jnp.ndarray, block_rows: int = 16384,
                    interpret: bool = False) -> jnp.ndarray:
    n = A.shape[0]
    offsets = A.offsets
    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)
    span = lo + hi
    # pad the halo span up to a lane multiple so the DMA'd window is aligned
    span_pad = ((span + 127) // 128) * 128

    R = min(block_rows, n)
    n_pad = ((n + R - 1) // R) * R

    if A.wrap:
        head = x[: hi] if hi else x[:0]
        tail = x[n - lo:] if lo else x[:0]
        x_ext = jnp.concatenate([tail, x, head])
    else:
        x_ext = jnp.concatenate(
            [jnp.zeros((lo,), x.dtype), x, jnp.zeros((hi,), x.dtype)]
        )
    # pad to n_pad + span_pad
    extra = (n_pad + span_pad) - x_ext.shape[0]
    if extra > 0:
        x_ext = jnp.concatenate([x_ext, jnp.zeros((extra,), x.dtype)])

    data = A.data
    if n_pad != n:
        data = jnp.concatenate(
            [data, jnp.zeros((data.shape[0], n_pad - n), data.dtype)], axis=1
        )

    grid = (n_pad // R,)
    kern = partial(_kernel, offsets, lo, span_pad, R)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((data.shape[0], R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R + span_pad,), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(data, x_ext)
    return y[:n]
