"""Flexible GMRES (FGMRES), jit-compiled end to end.

Capability parity with the reference's hand-rolled ``gmres`` (reference
``solvers.py:58-127``): right preconditioning with the flexible Z-basis
reconstruction, Gram-Schmidt Arnoldi (CGS2 default — two batched matvec
passes with MGS-level orthogonality; ``ortho='mgs'`` for the reference's
sequential recurrence), per-iteration true residual ‖Ax−b‖, breakdown
detection, and the same ``(x, info)`` output contract.

TPU-first differences (by design, not omission):

* the entire iteration is one compiled ``lax.while_loop`` — no host↔device
  round-trips per iteration;
* the Hessenberg least-squares uses incremental Givens QR instead of
  ``np.linalg.lstsq`` (reference solvers.py:113), so coefficients cost O(k²)
  per iteration and a residual estimate is available for free;
* ``true_residual=False`` switches convergence checks to the Givens estimate,
  dropping one SpMV per iteration (the default keeps the reference's exact
  true-residual semantics).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..precond.base import (
    apply_preconditioner,
    as_preconditioner,
    is_operand_preconditioner,
)
from .arnoldi import (
    ArnoldiState,
    arnoldi_step,
    init_state,
    lsq_coeffs,
    lsq_residual_estimate,
)
from .hostio import dscalar


class GmresResult(NamedTuple):
    x: jnp.ndarray
    res: jnp.ndarray  # (k,) true residual per iteration (inf where unused)
    steps: jnp.ndarray  # number of iterations performed
    breakdown: jnp.ndarray  # bool
    xs: Optional[jnp.ndarray]  # (k+1, n) iterate history, or None


@lru_cache(maxsize=64)
def _build_core(k: int, static_pre, history: bool, true_residual: bool,
                ortho: str = "cgs2", loop: str = "while"):
    @jax.jit
    def core(A, b, x0, tol, pre_op) -> GmresResult:
        # static_pre: hashable callable closed over statically; pre_op: a
        # pytree preconditioner passed as a traced operand (either may be
        # None; apply dispatches at trace time)
        def prefunc(v):
            if static_pre is not None:
                return static_pre(v)
            return apply_preconditioner(pre_op, v)
        n = b.shape[0]
        # x0=None is resolved *inside* the jitted program: a host-side
        # zeros_like would be a per-call host→device put (~34 ms through the
        # axon tunnel, scripts/tpu_probe9.py); in-program it is free.
        if x0 is None:
            x0 = jnp.zeros_like(b)
        r0 = b - A @ x0
        beta = jnp.linalg.norm(r0)
        st0 = init_state(r0, beta, k)

        res0 = jnp.full((k,), jnp.inf, b.dtype)
        # History slot 0 mirrors the reference quirk of storing the initial
        # residual vector as x[0] (reference solvers.py:75-80); consumers
        # iterate from index 1.
        xs0 = jnp.zeros((k + 1, n), b.dtype).at[0].set(r0) if history else None

        def cond(carry):
            st, j, x, res, done, brk, xs = carry
            return (j < k) & ~done

        def body(carry):
            st, j, x, res, done, brk, xs = carry
            st, hlast = arnoldi_step(A, prefunc, st, j, ortho)
            brk_now = hlast == 0
            if true_residual or history:
                y = lsq_coeffs(st, j)
                x = y @ st.Z + x0
            if true_residual:
                r = jnp.linalg.norm(A @ x - b)
            else:
                # fast mode: no coefficient solve, no iterate reconstruction,
                # no extra SpMV per iteration — the Givens estimate drives
                # convergence, x is built once after the loop
                r = lsq_residual_estimate(st, j)
            res = res.at[j].set(r)
            if history:
                xs = xs.at[j + 1].set(x)
            done = (r < tol) | brk_now
            return (st, j + 1, x, res, done, brk | brk_now, xs)

        init = (st0, jnp.int32(0), x0, res0, beta < tol, jnp.bool_(False), xs0)
        if loop == "while":
            st, j, x, res, done, brk, xs = lax.while_loop(cond, body, init)
        else:
            # static-trip variant: always runs k iterations; the result
            # snapshot (x, res, steps) freezes at first convergence while the
            # Arnoldi factorisation keeps growing harmlessly (extra columns
            # are masked out of every coefficient solve).  Dynamic-trip
            # while_loops showed large per-iteration overhead on some TPU
            # toolchains — this trades wasted-but-cheap iterations for a
            # fully schedulable loop.
            def fbody(jj, carry):
                st, j, x, res, done, brk, xs = carry
                st2, j2, x2, res2, done2, brk2, xs2 = body(
                    (st, jj, x, res, done, brk, xs)
                )
                j_keep = jnp.where(done, j, j2)
                x_keep = jnp.where(done, x, x2) if x is not None else x2
                res_keep = jnp.where(done, res, res2)
                xs_keep = (jnp.where(done, xs, xs2) if history else xs2)
                return (st2, j_keep, x_keep, res_keep, done | done2,
                        brk | (brk2 & ~done), xs_keep)

            st, j, x, res, done, brk, xs = lax.fori_loop(0, k, fbody, init)
        if not true_residual and not history:
            y = lsq_coeffs(st, jnp.maximum(j - 1, 0))
            x = jnp.where(j > 0, y @ st.Z + x0, x0)
            res = res.at[jnp.maximum(j - 1, 0)].set(jnp.linalg.norm(A @ x - b))
        return GmresResult(x=x, res=res, steps=j, breakdown=brk, xs=xs)

    return core


def gmres(
    A,
    b,
    x0=None,
    k: int = 30,
    tol: float = 1e-50,
    pre=None,
    history: bool = False,
    true_residual: bool = True,
    ortho: str = "cgs2",
    loop: str = "while",
):
    """Solve ``A x = b`` with right-preconditioned flexible GMRES.

    Returns ``(x, info)`` where ``info`` matches the reference contract
    (reference solvers.py:122-127): ``name``, per-iteration residuals
    ``res`` (trimmed to performed steps), ``steps``, and — when
    ``history=True`` — the iterate history ``x`` whose index 0 holds the
    initial residual vector.
    """
    b = jnp.asarray(b)
    if x0 is not None:
        x0 = jnp.asarray(x0, b.dtype)
    if is_operand_preconditioner(pre):
        static_pre, pre_op = None, pre
    else:
        static_pre, pre_op = (as_preconditioner(pre) if pre is not None else None), None
    core = _build_core(int(k), static_pre, bool(history), bool(true_residual),
                       ortho, loop)
    out = core(A, b, x0, dscalar(tol, b.dtype), pre_op)

    # single batched fetch for everything the info dict needs (each separate
    # int()/np.asarray() is its own device→host round trip through the tunnel)
    steps_h, res_h, brk_h, xs_h = jax.device_get(
        (out.steps, out.res, out.breakdown, out.xs if history else None)
    )
    steps = int(steps_h)
    info = {
        "name": "gmres",
        "res": res_h[:steps],
        "steps": steps,
        "breakdown": bool(brk_h),
    }
    if history:
        info["x"] = xs_h[: steps + 1]
    return out.x, info
