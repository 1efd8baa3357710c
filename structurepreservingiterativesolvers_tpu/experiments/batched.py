"""On-device batched solves via vmap.

SURVEY §7's experiment plan: "sweep fan-out via vmap where shapes allow".
The reference fans out parameter sweeps as OS processes
(lkdvRK/ErrorGenerator.py); when the operator is shared and only the
right-hand side / initial guess / constraint targets vary (time-step
batches, ensemble ICs, tolerance studies), a single vmapped solve keeps the
whole sweep on the accelerator with one compiled program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..precond.base import as_preconditioner, is_operand_preconditioner
from ..solvers.cgmres import _build_core


def cgmres_many(
    A,
    Bs: jnp.ndarray,  # (batch, n) right-hand sides
    X0s: Optional[jnp.ndarray] = None,
    constraints_batched: Sequence = (),  # constraints with batched leaves
    k: int = 30,
    tol: float = 1e-8,
    contol: float = 10.0,
    ctol: float = 1e-12,
    pre=None,
    mixed: Optional[bool] = None,
):
    """Solve A x_i = b_i for a batch of right-hand sides with per-item
    constraint targets, as ONE vmapped device program.

    ``constraints_batched``: QuadraticConstraint pytrees whose array leaves
    carry a leading batch dimension where they vary (e.g. per-item ``c``)
    and no batch dimension where shared (e.g. the matrix M) — in_axes are
    inferred per leaf.
    """
    Bs = jnp.asarray(Bs)
    batch, n = Bs.shape
    X0s = jnp.zeros_like(Bs) if X0s is None else jnp.asarray(X0s, Bs.dtype)
    cons = tuple(constraints_batched)
    if mixed is None:
        mixed = Bs.dtype == jnp.float32 and jax.config.jax_enable_x64
    if is_operand_preconditioner(pre):
        static_pre, pre_op = None, pre
    else:
        static_pre = as_preconditioner(pre) if pre is not None else None
        pre_op = None

    core = _build_core(int(k), len(cons), static_pre, False, False,
                       bool(mixed), ("q",) * len(cons))

    # infer per-leaf in_axes for the constraint pytrees: batched iff the
    # leading dimension equals the batch size and the leaf is "per-item"
    def axis_for(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == batch:
            return 0
        return None

    cons_axes = jax.tree_util.tree_map(axis_for, cons)
    dt = Bs.dtype

    vm = jax.vmap(
        lambda b, x0, cons_: core(
            A, b, x0, cons_, jnp.asarray(tol, dt), jnp.asarray(contol, dt),
            jnp.asarray(ctol, dt), pre_op,
        ),
        in_axes=(0, 0, cons_axes),
    )
    out = vm(Bs, X0s, cons)
    return out.x, {
        "steps": jax.device_get(out.steps),
        "deviation": jax.device_get(out.deviation),
        "safety": jax.device_get(out.safety),
        "res": jax.device_get(out.res),
    }
