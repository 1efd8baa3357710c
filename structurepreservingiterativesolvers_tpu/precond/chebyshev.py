"""Polynomial preconditioners (Chebyshev and Neumann).

TPU-native replacements for the algorithmically sequential preconditioners
the reference imports (SuperLU ILU triangular solves; PyAMG Ruge–Stüben,
reference heat/TimedSolve.py:30-31): a fixed short sequence of SpMVs is
perfectly jit-able, has no data-dependent control flow, and — because FGMRES
is flexible — any fixed polynomial in A is an admissible right
preconditioner.

* ``chebyshev(A, lmin, lmax, degree)`` — optimal polynomial approximation of
  A⁻¹ on a positive spectrum interval (SPD systems, e.g. heat).
* ``neumann(A, degree, omega)`` — truncated Neumann series of the
  Jacobi-scaled system; works for the mildly nonsymmetric systems.
* ``power_bounds(A)`` — cheap spectral-interval estimate (power iteration on
  the Jacobi-scaled operator).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse import _register
from .jacobi import diagonal


@_register
@dataclasses.dataclass(frozen=True)
class Chebyshev:
    """Chebyshev polynomial approximation of A⁻¹ on [lmin, lmax] applied via
    the standard three-term recurrence (one SpMV per degree)."""

    A: object
    lmin: float  # static
    lmax: float  # static
    degree: int  # static

    _static = ("lmin", "lmax", "degree")

    def __call__(self, v):
        theta = 0.5 * (self.lmax + self.lmin)
        delta = 0.5 * (self.lmax - self.lmin)
        sigma = theta / delta
        rho = 1.0 / sigma
        x = v / theta
        r = v - self.A @ x
        d = (2.0 * rho / delta) * r
        for _ in range(self.degree - 1):
            x = x + d
            r = r - self.A @ d
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * r
            rho = rho_new
        return x + d if self.degree >= 1 else x

    def solve(self, v):
        return self(v)


@_register
@dataclasses.dataclass(frozen=True)
class Neumann:
    """Truncated Neumann series for (D⁻¹A) with damping ω:
    p(A) = ω Σ_{i<degree} (I − ω D⁻¹A)^i D⁻¹."""

    A: object
    dinv: jnp.ndarray
    omega: float  # static
    degree: int  # static

    _static = ("omega", "degree")

    def __call__(self, v):
        z = self.omega * (self.dinv * v)
        acc = z
        for _ in range(self.degree - 1):
            z = z - self.omega * (self.dinv * (self.A @ z))
            acc = acc + z
        return acc

    def solve(self, v):
        return self(v)


@_register
@dataclasses.dataclass(frozen=True)
class NeumannComposite:
    """Neumann acceleration of an *inner* preconditioner B:

        M⁻¹ = Σ_{i≤degree} (I − B A)^i B

    — the polynomial-of-preconditioned-operator upgrade that closes the
    iteration-count gap to the reference's SuperLU ILU
    (lkdvRK/Evolve.py:51-52): each extra degree costs one SpMV + one inner
    apply (batched MXU work for block/RAS inners), no triangular solves.
    With a RAS inner this reaches ILU-level preconditioning quality on the
    lkdvRK stage systems (see docs/ILU_PARITY.md)."""

    A: object
    inner: object
    degree: int  # static

    _static = ("degree",)

    def __call__(self, v):
        from .base import apply_preconditioner

        z = apply_preconditioner(self.inner, v)
        acc = z
        for _ in range(self.degree):
            z = z - apply_preconditioner(self.inner, self.A @ z)
            acc = acc + z
        return acc

    def solve(self, v):
        return self(v)


def neumann_composite(A, inner, degree: int = 2) -> NeumannComposite:
    return NeumannComposite(A=A, inner=inner, degree=int(degree))


def power_bounds(A, iters: int = 30, seed: int = 0):
    """Estimate the spectral interval of D⁻¹A by power iteration.
    Returns (lmin_est, lmax_est) with safety margins."""
    n = A.shape[0]
    dinv = 1.0 / jnp.where(diagonal(A) == 0, 1.0, diagonal(A))
    v = jnp.asarray(np.random.default_rng(seed).standard_normal(n), dinv.dtype)
    v = v / jnp.linalg.norm(v)
    lmax = 1.0
    for _ in range(iters):
        w = dinv * (A @ v)
        lmax = jnp.linalg.norm(w)
        v = w / jnp.where(lmax == 0, 1.0, lmax)
    lmax = float(lmax)
    return 0.05 * lmax, 1.1 * lmax


def chebyshev(A, lmin: Optional[float] = None, lmax: Optional[float] = None,
              degree: int = 8, scale_by_diag: bool = True):
    """Build a Chebyshev preconditioner; bounds estimated if not given.

    For diagonally-scaled operation, compose with Jacobi outside; here we
    precondition A itself using estimated bounds of A's spectrum (via the
    Rayleigh quotient growth of plain power iteration)."""
    if lmin is None or lmax is None:
        n = A.shape[0]
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal(n), diagonal(A).dtype)
        v = v / jnp.linalg.norm(v)
        est = 1.0
        for _ in range(30):
            w = A @ v
            est = float(jnp.linalg.norm(w))
            v = w / est
        lmax = lmax or 1.1 * est
        lmin = lmin or 0.03 * est
    return Chebyshev(A=A, lmin=float(lmin), lmax=float(lmax), degree=int(degree))


def neumann(A, degree: int = 4, omega: float = 0.8):
    d = diagonal(A)
    dinv = 1.0 / jnp.where(d == 0, 1.0, d)
    return Neumann(A=A, dinv=dinv, omega=float(omega), degree=int(degree))
