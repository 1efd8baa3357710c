"""Preconditioner protocol.

The reference accepts ``pre`` as either an object with ``.solve`` (an ILU
factor, a PyAMG preconditioner) or something supporting ``pre @ v``, with
``None`` meaning identity (reference ``solvers.py:60-73``).  Here a
preconditioner is anything callable on a device vector inside jit; this
adapter normalises the accepted spellings.
"""

from __future__ import annotations

from typing import Callable, Optional


def _identity(v):
    return v


def apply_preconditioner(pre, v):
    """Apply any accepted preconditioner spelling to a vector (trace-time
    dispatch; ``pre`` may be a traced pytree object)."""
    if pre is None:
        return v
    if hasattr(pre, "solve"):
        return pre.solve(v)
    if callable(pre):
        return pre(v)
    if hasattr(pre, "__matmul__"):
        return pre @ v
    raise ValueError(f"Preconditioner not supported: {type(pre)!r}")


def is_operand_preconditioner(pre) -> bool:
    """True if ``pre`` is a registered pytree carrying device arrays — such
    preconditioners are passed through jit as operands (retrace-free data
    updates); plain functions are closed over statically."""
    import jax

    if pre is None:
        return False
    return not jax.tree_util.all_leaves([pre])


def as_preconditioner(pre) -> Callable:
    if pre is None:
        return _identity
    if callable(pre) and not hasattr(pre, "__matmul__"):
        return pre
    if hasattr(pre, "solve"):
        return pre.solve
    if hasattr(pre, "__matmul__"):
        return lambda v: pre @ v
    raise ValueError(f"Preconditioner not supported: {type(pre)!r}")


class IdentityPreconditioner:
    """Explicit identity (for API symmetry with the reference's
    ``sps.identity`` placeholder, solvers.py:62)."""

    def __call__(self, v):
        return v

    def solve(self, v):
        return v
