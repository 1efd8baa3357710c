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
    the standard three-term recurrence (one SpMV per degree).

    When ``datawin`` is present (built by ``chebyshev(..., fused=True)`` or
    automatically on TPU), the whole degree-p recurrence runs as ONE
    time-tiled Pallas kernel (``ops/pallas_poly.py``) — ~p× less HBM
    traffic than p chained SpMVs."""

    A: object
    lmin: float  # static
    lmax: float  # static
    degree: int  # static
    datawin: object = None  # (grid_n, ndiag, Wb, 128) or None
    block_rows: int = 65536  # static
    interpret: bool = False  # static (CPU test path)

    _static = ("lmin", "lmax", "degree", "block_rows", "interpret")

    def __call__(self, v):
        theta = 0.5 * (self.lmax + self.lmin)
        delta = 0.5 * (self.lmax - self.lmin)
        sigma = theta / delta
        if self.datawin is not None:
            from ..ops.pallas_poly import cheb_apply_fused

            return cheb_apply_fused(
                self.datawin, self.A.offsets, self.A.wrap, v.shape[0],
                self.degree, theta, delta, sigma, v,
                block_rows=self.block_rows, interpret=self.interpret)
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
    p(A) = ω Σ_{i<degree} (I − ω D⁻¹A)^i D⁻¹.

    With ``datawin``/``dinvwin`` present, the whole series runs as one
    time-tiled Pallas kernel (see ``Chebyshev``)."""

    A: object
    dinv: jnp.ndarray
    omega: float  # static
    degree: int  # static
    datawin: object = None
    dinvwin: object = None
    block_rows: int = 65536  # static
    interpret: bool = False  # static

    _static = ("omega", "degree", "block_rows", "interpret")

    def __call__(self, v):
        if self.datawin is not None:
            from ..ops.pallas_poly import neumann_apply_fused

            return neumann_apply_fused(
                self.datawin, self.dinvwin, self.A.offsets, self.A.wrap,
                v.shape[0], self.degree, self.omega, v,
                block_rows=self.block_rows, interpret=self.interpret)
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


@_register
@dataclasses.dataclass(frozen=True)
class SkewNormalChebyshev:
    """Polynomial approximate inverse for shifted-skew systems A = aI − K
    with K skew(-adjoint in some inner product) — the swe midpoint operator
    A = I/dt − S/2 (models/swe.py; reference swe/swe.py:61-66 builds the
    same Crank–Nicolson form, and swe/TimedSolve.py:23-24 pairs it with
    SuperLU spilu, which has no TPU-native analogue).

    Identity: A·(2aI − A) = a²I − K² =: N is SPD in the skewness inner
    product with spectrum ⊂ [a², a² + ρ(K)²] — a SHORT interval whose
    condition κ = 1 + (ρ(K)/a)² stays O(1) across the reference sweep.  So

        A⁻¹ = (2aI − A) · N⁻¹ ≈ (2aI − A) · q(N)

    with q the degree-``degree`` Chebyshev approximation of the inverse on
    [lmin, lmax].  Each N-apply is two A-SpMVs; the whole preconditioner is
    a fixed chain of 2·degree+1 SpMVs — fully fused by XLA, no triangular
    solves, M-robust where the truncated Neumann series diverges for
    ρ(dt·S/2) > 1 (M ≳ 283 on the reference swe grid)."""

    A: object
    a: float  # static — the shift: A = aI − K
    lmin: float  # static: lower spectral bound of N (≈ a²)
    lmax: float  # static: upper bound (a² + ρ(K)² with margin)
    degree: int  # static

    _static = ("a", "lmin", "lmax", "degree")

    def _N(self, v):
        # N v = A (2a v − A v) = (a²I − K²) v
        return self.A @ (2.0 * self.a * v - self.A @ v)

    def __call__(self, v):
        theta = 0.5 * (self.lmax + self.lmin)
        delta = 0.5 * (self.lmax - self.lmin)
        sigma = theta / delta
        rho = 1.0 / sigma
        x = v / theta
        r = v - self._N(x)
        d = (2.0 * rho / delta) * r
        for _ in range(self.degree - 1):
            x = x + d
            r = r - self._N(d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * r
            rho = rho_new
        u = x + d if self.degree >= 1 else x
        return 2.0 * self.a * u - self.A @ u

    def solve(self, v):
        return self(v)


def skew_normal_chebyshev(A, a: float, rho_k: Optional[float] = None,
                          degree: Optional[int] = None,
                          target: float = 0.03) -> SkewNormalChebyshev:
    """Build a SkewNormalChebyshev for A = aI − K (K skew).

    ``rho_k`` (spectral radius of K) is estimated by power iteration on
    K = aI − A if not given.  ``degree=None`` auto-selects the smallest
    degree whose Chebyshev min-max error on [a², a² + ρ(K)²] is ≤ ``target``
    — preconditioned GMRES then contracts the residual by ~``target`` per
    iteration regardless of M."""
    import math

    if rho_k is None:
        # power iteration on K can under-converge when skew eigenvalue
        # pairs cluster (advisor r4 #3): take the MAX over the last norm
        # ratios instead of the final one, and widen the margin to 1.1 —
        # lmax < λmax(N) would make the Chebyshev polynomial AMPLIFY
        # exterior modes, while a mild overestimate only costs a slightly
        # flatter polynomial
        n = A.shape[0]
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal(n), diagonal(A).dtype)
        v = v / jnp.linalg.norm(v)
        est = 0.0
        for it in range(30):
            w = a * v - A @ v  # K v
            nw = float(jnp.linalg.norm(w))
            if it >= 25:
                est = max(est, nw)
            v = w / nw
        rho_k = 1.1 * est
    lmin = float(a) ** 2
    lmax = lmin + float(rho_k) ** 2
    if degree is None:
        kappa = lmax / lmin
        factor = (math.sqrt(kappa) - 1.0) / (math.sqrt(kappa) + 1.0)
        if factor <= 0:
            degree = 1
        else:
            degree = max(1, math.ceil(math.log(2.0 / target)
                                      / math.log(1.0 / factor)))
    return SkewNormalChebyshev(A=A, a=float(a), lmin=lmin, lmax=lmax,
                               degree=int(degree))


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


def _fuse_block_rows(A, degree: int, fused: Optional[bool], block_rows: int):
    """Fused-kernel gate: returns the VMEM-fitted block size (0 = unfused).
    Explicit ``fused`` wins; auto requires a TPU backend, a DIA operator in
    f32, degree ≥ 2 (else nothing to fuse), a halo that stays a small
    fraction of the tile, and the working set inside scoped VMEM."""
    from ..ops.pallas_poly import fit_block_rows
    from ..ops.sparse import DIA
    from ..ops.stencil import Stencil

    if fused is False:
        return 0
    # Stencil proxies .data/.offsets/.wrap, so the fused windowed kernel
    # builds identically from either form
    if not isinstance(A, (DIA, Stencil)) or A.data.dtype != jnp.float32 \
            or degree < 2:
        return 0
    br = fit_block_rows(A.shape[0], A.offsets, degree, block_rows)
    # halo per side = degree·max(lo,hi)+128 (ops/pallas_poly._plan); the two
    # halos must stay within one tile's worth of overlap
    span = max(max(A.offsets), 0, -min(min(A.offsets), 0))
    if br == 0 or 2 * (degree * span + 128) > br:
        return 0
    if fused:
        return br
    from .. import config

    return br if (A.shape[0] >= 262144 and config.is_tpu()) else 0


def chebyshev(A, lmin: Optional[float] = None, lmax: Optional[float] = None,
              degree: int = 8, scale_by_diag: bool = True,
              fused: Optional[bool] = None, block_rows: int = 131072,
              interpret: bool = False):
    """Build a Chebyshev preconditioner; bounds estimated if not given.

    For diagonally-scaled operation, compose with Jacobi outside; here we
    precondition A itself using estimated bounds of A's spectrum (via the
    Rayleigh quotient growth of plain power iteration).  ``fused=None``
    auto-selects the time-tiled one-pass Pallas apply on TPU backends."""
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
    datawin = None
    br = _fuse_block_rows(A, degree, fused, block_rows)
    if br:
        from ..ops.pallas_poly import window_data

        datawin = window_data(A, int(degree), br)
        block_rows = br
    return Chebyshev(A=A, lmin=float(lmin), lmax=float(lmax),
                     degree=int(degree), datawin=datawin,
                     block_rows=int(block_rows), interpret=bool(interpret))


def neumann(A, degree: int = 4, omega: float = 0.8,
            fused: Optional[bool] = None, block_rows: int = 131072,
            interpret: bool = False):
    d = diagonal(A)
    dinv = 1.0 / jnp.where(d == 0, 1.0, d)
    datawin = dinvwin = None
    br = _fuse_block_rows(A, degree, fused, block_rows)
    if br:
        from ..ops.pallas_poly import window_data, window_vector

        datawin = window_data(A, int(degree), br)
        dinvwin = window_vector(dinv, A.offsets, A.wrap, int(degree), br)
        block_rows = br
    return Neumann(A=A, dinv=dinv, omega=float(omega), degree=int(degree),
                   datawin=datawin, dinvwin=dinvwin,
                   block_rows=int(block_rows), interpret=bool(interpret))
