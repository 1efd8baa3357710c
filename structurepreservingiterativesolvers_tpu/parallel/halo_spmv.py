"""Explicit distributed DIA SpMV under ``shard_map``: halo exchange over the
ring via ``lax.ppermute``, local stencil apply.

The GSPMD path (``parallel.mesh``) lets XLA partition the rolled-shift SpMV
automatically; this module is the hand-scheduled alternative the survey's
distribution plan calls for (SURVEY §2.3/§5.8): rows are partitioned across
the mesh, each device exchanges only its halo segments (max |offset| values)
with its ring neighbours over ICI, and the stencil is applied locally.
Communication volume per SpMV is 2·halo per device instead of anything
global.

Requires halo ≤ local rows.  Periodic (wrap) matrices map onto the ring
naturally; non-wrapping ones zero the global edges.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sparse import DIA
from .mesh import ROWS


import dataclasses

from ..ops.sparse import _register


@_register
@dataclasses.dataclass(frozen=True)
class HaloDia:
    """A row-sharded DIA operator whose SpMV uses the explicit ring-halo
    schedule — drop-in ``A`` for the solvers (supports ``A @ x``)."""

    A: DIA
    mesh: Mesh  # static

    _static = ("mesh",)

    @property
    def shape(self):
        return self.A.shape

    @property
    def offsets(self):
        return self.A.offsets

    def __matmul__(self, x):
        if x.ndim == 1:
            return dia_spmv_halo(self.A, x, self.mesh)
        # tall-dense SpMM falls back to the GSPMD path
        return self.A @ x


def dia_spmv_halo(A: DIA, x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """y = A @ x with row-partitioned data/x and ring halo exchange.

    ``A.data`` must be sharded P(None, rows) and ``x`` P(rows) on ``mesh``
    (or anything reshardable to that)."""
    nd = mesh.shape[ROWS]
    n = A.shape[0]
    if n % nd:
        raise ValueError(f"n={n} not divisible by {nd} devices")
    lo = -min(min(A.offsets), 0)
    hi = max(max(A.offsets), 0)
    if max(lo, hi) > n // nd:
        raise ValueError("halo wider than a local shard")
    offsets = A.offsets
    wrap = A.wrap

    fwd = [(i, (i + 1) % nd) for i in range(nd)]  # send to right neighbour
    bwd = [(i, (i - 1) % nd) for i in range(nd)]  # send to left neighbour

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, ROWS), P(ROWS)),
        out_specs=P(ROWS),
    )
    def apply(data_local, x_local):
        n_local = x_local.shape[0]
        idx = lax.axis_index(ROWS)
        parts = [x_local]
        if lo:
            # left halo: last lo values of the left neighbour
            left = lax.ppermute(x_local[-lo:], ROWS, fwd)
            if not wrap:
                left = jnp.where(idx == 0, 0.0, left)
            parts.insert(0, left)
        if hi:
            right = lax.ppermute(x_local[:hi], ROWS, bwd)
            if not wrap:
                right = jnp.where(idx == nd - 1, 0.0, right)
            parts.append(right)
        x_ext = jnp.concatenate(parts) if len(parts) > 1 else x_local
        y = jnp.zeros(n_local, jnp.result_type(data_local, x_local))
        for d, off in enumerate(offsets):
            y = y + data_local[d] * lax.dynamic_slice(
                x_ext, (lo + off,), (n_local,)
            )
        return y

    return apply(A.data, x)
