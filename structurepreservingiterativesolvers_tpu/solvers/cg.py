"""Preconditioned conjugate gradients (SPD systems), jit-compiled.

The reference ships no CG (its systems are mildly nonsymmetric), but the
capability target includes it for the SPD paths (heat operator M/dt + ½K is
SPD).  Same engineering as the GMRES core: one ``lax.while_loop``, operand
preconditioners, true-residual reporting.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..precond.base import (
    apply_preconditioner,
    as_preconditioner,
    is_operand_preconditioner,
)
from .hostio import dscalar


class CgResult(NamedTuple):
    x: jnp.ndarray
    res: jnp.ndarray
    steps: jnp.ndarray


@lru_cache(maxsize=64)
def _build_core(k: int, static_pre):
    @jax.jit
    def core(A, b, x0, tol, pre_op) -> CgResult:
        def prefunc(v):
            if static_pre is not None:
                return static_pre(v)
            return apply_preconditioner(pre_op, v)

        if x0 is None:  # resolved in-program: avoids a per-call host put
            x0 = jnp.zeros_like(b)
        r0 = b - A @ x0
        z0 = prefunc(r0)
        res0 = jnp.full((k,), jnp.inf, b.dtype)

        def cond(c):
            x, r, z, p, rz, j, res, done = c
            return (j < k) & ~done

        def body(c):
            x, r, z, p, rz, j, res, done = c
            Ap = A @ p
            alpha = rz / jnp.dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = prefunc(r)
            rz_new = jnp.dot(r, z)
            p = z + (rz_new / rz) * p
            rnorm = jnp.linalg.norm(r)
            res = res.at[j].set(rnorm)
            return (x, r, z, p, rz_new, j + 1, res, rnorm < tol)

        init = (x0, r0, z0, z0, jnp.dot(r0, z0), jnp.int32(0), res0,
                jnp.linalg.norm(r0) < tol)
        x, r, z, p, rz, j, res, done = lax.while_loop(cond, body, init)

        # per-iteration residuals follow the CG recurrence (r is b − A x up to
        # roundoff); the terminal entry is replaced by the recomputed TRUE
        # residual, matching the reference's termination-time check
        # (reference solvers.py:116,122-127) without paying an extra SpMV
        # per iteration.
        res = res.at[jnp.maximum(j - 1, 0)].set(jnp.linalg.norm(A @ x - b))
        return CgResult(x=x, res=res, steps=j)

    return core


def cg(A, b, x0=None, k: int = 100, tol: float = 1e-8, pre=None):
    """Solve SPD ``A x = b``; returns (x, info) on the common contract."""
    b = jnp.asarray(b)
    if x0 is not None:
        x0 = jnp.asarray(x0, b.dtype)
    if is_operand_preconditioner(pre):
        static_pre, pre_op = None, pre
    else:
        static_pre, pre_op = (as_preconditioner(pre) if pre is not None else None), None
    core = _build_core(int(k), static_pre)
    out = core(A, b, x0, dscalar(tol, b.dtype), pre_op)
    res_h, steps_h = jax.device_get((out.res, out.steps))  # one batched fetch
    info = {
        "name": "cg",
        "res": res_h[: max(int(steps_h), 1)],  # per-iteration, like gmres
        "steps": int(steps_h),
    }
    return out.x, info
