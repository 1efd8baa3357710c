"""General (callable) constraints — the escape hatch for invariants that are
not expressed as an explicit quadratic form.

Capability parity with the reference's dict-form constraints
(reference lkdvRK/LinearSolver.py:29-79: ``{'func': ..., 'jac': ...}``
callables over Krylov coefficients), modernised: the user supplies a single
jax-traceable scalar function of the *full-space* vector ``g(x)``; the
reduction onto Krylov coefficients, the Jacobian, and the Hessian all come
from autodiff — no hand-written chain rules through ``z1calc``.

Inside the solver each general constraint is handled as a per-iteration
quadratic Taylor model about the warm-start coefficients (exact whenever g is
quadratic — e.g. every invariant in the reference corpus — and an SQP-style
approximation otherwise, with the safety latch checking the *true* g at the
accepted iterate).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.sparse import _register
from .quadratic import ReducedBuffers


@_register
@dataclasses.dataclass(frozen=True)
class GeneralConstraint:
    """g(x) = 0 with ``func`` a jax-traceable scalar function of the
    full-space vector x."""

    func: Callable  # static (hashable callable)
    name: str = "general"

    _static = ("func", "name")

    def __call__(self, x):
        return self.func(x)


def taylor_buffers(
    con: GeneralConstraint,
    y0: jnp.ndarray,  # (k,) expansion point (masked coefficients)
    Z: jnp.ndarray,  # (k, n)
    x0: jnp.ndarray,
    cdtype=None,
) -> ReducedBuffers:
    """Quadratic model of the reduced constraint about y0:
    g̃(y) ≈ t0 + t1·y + yᵀ T2 y, built by autodiff."""
    cdtype = cdtype or x0.dtype

    def reduced(y):
        return con.func(x0 + (y.astype(x0.dtype) @ Z))

    val = reduced(y0).astype(cdtype)
    grad = jax.grad(reduced)(y0).astype(cdtype)
    hess = jax.hessian(reduced)(y0).astype(cdtype)
    y0c = y0.astype(cdtype)
    T2 = 0.5 * hess
    t1 = grad - hess @ y0c
    t0 = val - jnp.dot(grad, y0c) + 0.5 * jnp.dot(y0c, hess @ y0c)
    return ReducedBuffers(t0=t0, t1=t1, T2=T2)


def true_value(con: GeneralConstraint, y, Z, x0):
    return con.func(x0 + (y.astype(x0.dtype) @ Z))
