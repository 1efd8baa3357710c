"""Device-mesh construction and system sharding.

The reference has no distributed backend at all (SURVEY §2.3): every solve is
single-process scipy.  Here distribution is first-class and idiomatic JAX:
build a 1-D ``Mesh`` over the available chips, place the row dimension of
every operator and vector on it (``NamedSharding``), and run the *same*
jitted solver — XLA/GSPMD inserts the collectives (psum for MGS inner
products and norms, collective-permute for the periodic diagonal shifts of
DIA SpMV) on ICI.  The tiny KKT endgame data (t1, T2, H, R) stays replicated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sparse import BSR, DIA, ELL

ROWS = "rows"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROWS,))


def _pad_to(n: int, d: int) -> int:
    return ((n + d - 1) // d) * d


def shard_matrix(A, mesh: Mesh):
    """Place a sparse operator's row dimension on the mesh."""
    from ..ops.stencil import as_dia

    # Stencil → shard its explicit DIA view: the residual-row gather/scatter
    # is not GSPMD-friendly, and the sharded roll chain is the designed
    # multi-chip SpMV (engine='xla' below)
    A = as_dia(A)
    if isinstance(A, DIA):
        sh = NamedSharding(mesh, P(None, ROWS))
        # engine='xla': GSPMD partitions the roll chain; a pallas_call here
        # would force a gather of the full operand onto one device
        return dataclasses.replace(
            A, data=jax.device_put(A.data, sh), engine="xla"
        )
    if isinstance(A, ELL):
        # transposed (r, n) layout: the row dimension is axis 1
        sh = NamedSharding(mesh, P(None, ROWS))
        return dataclasses.replace(
            A,
            cols=jax.device_put(A.cols, sh),
            vals=jax.device_put(A.vals, sh),
        )
    raise NotImplementedError(f"sharding for {type(A).__name__} not implemented")


def shard_vector(v: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return jax.device_put(v, NamedSharding(mesh, P(ROWS)))


def replicated(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_constraint(con, mesh: Mesh):
    """Shard a QuadraticConstraint's vector data row-wise; scalars replicate.

    Matrix operators in DIA/ELL form are row-sharded; composite operators
    (MatComb, block-diagonal wrappers, StageKron) are left as-is — GSPMD
    propagates shardings through them, inserting reshards where needed.
    """
    from ..constraints.quadratic import MatComb, QuadraticConstraint

    M = con.M
    if isinstance(M, (DIA, ELL)):
        M = shard_matrix(M, mesh)
    elif isinstance(M, MatComb):
        M = dataclasses.replace(
            M,
            mats=tuple(
                shard_matrix(A, mesh) if isinstance(A, (DIA, ELL)) else A
                for A in M.mats
            ),
        )
    v = shard_vector(con.v, mesh) if con.v is not None else None
    return QuadraticConstraint(M=M, v=v, c=replicated(con.c, mesh), name=con.name)


def shard_system(A, b, x0, constraints, mesh: Mesh):
    """One-call sharding of a full solve problem onto the mesh."""
    return (
        shard_matrix(A, mesh),
        shard_vector(b, mesh),
        shard_vector(x0, mesh),
        tuple(shard_constraint(c, mesh) for c in constraints),
    )
