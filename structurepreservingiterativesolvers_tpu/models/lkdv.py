"""1-D linear KdV test problem (u_t + u_x + u_xxx = 0, periodic).

Capability parity with the reference problem module (reference
``lkdv/lkdv.py``): mixed 3-field (u, v, w) formulation on DG/CG degree q with
a Crank–Nicolson-type midpoint step.  The weak form (lkdv/lkdv.py:88-105)

    F1 = (u1−u0)/dt·φ + G v1
    F2 = (v1 − ½(u1+u0))·ψ − ½G(w1+w0)
    F3 = w1·χ − G u1

assembles into the 3×3 block system

    A = [[ M/dt ,  G  ,  0   ]        b = [ M/dt·u0            ]
         [ −½M  ,  M  , −½G  ]            [ ½M·u0 + ½G·w0      ]
         [ −G   ,  0  ,  M   ]]           [ 0                  ]

with invariants  mass = ω·u,  momentum = ½uᵀMu,  energy = ½wᵀMw − ½uᵀMu
(reference lkdv/lkdv.py:122-146; the constraint matrices of
lkdv/LinearSolver.py:28-44).  No Firedrake: assembly is the pure-numpy
stencil builder in ``fem1d``, and the operators land on device in DIA/ELL
form.  Invariant evaluation (the reference's ``compute_invariants``,
lkdv/lkdv.py:154-166) is the corresponding quadratic form on device — the
assembled integrals are identical quantities.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import default_dtype
from ..constraints.quadratic import MatComb, QuadraticConstraint
from ..ops.sparse import from_scipy
from ..ops.stencil import maybe_stencil
from .fem1d import Space1D

MLENGTH = 40.0


@dataclasses.dataclass
class Problem:
    """Problem parameters (mirror of reference lkdv/lkdv.py:15-37)."""

    N: int = 100
    M: int = 50
    degree: int = 1
    space: str = "DG"
    T: float = 1.0
    mlength: float = MLENGTH
    dim: int = 3

    def fem(self) -> Space1D:
        return Space1D(self.M, self.mlength, self.degree, self.space)

    def exact(self, x: np.ndarray, t: float) -> np.ndarray:
        """Travelling-wave initial condition (lkdv/lkdv.py:29-37)."""
        alpha = 4.0
        beta = alpha * 2.0 * np.pi / self.mlength
        return np.sin(beta * (x - (1.0 - beta**2) * t)) + 1.0


@dataclasses.dataclass
class System:
    """Assembled linear system + invariant data, device-resident."""

    A: object
    b: jnp.ndarray
    z0: jnp.ndarray
    Mmat: object  # scalar-space mass matrix (device)
    Gmat: object  # antisymmetric derivative operator (device)
    omega: jnp.ndarray  # scalar-space integration vector (device)
    m0: jnp.ndarray
    mo0: jnp.ndarray
    e0: jnp.ndarray
    prob: Problem
    n0: int  # scalar-space dim
    # host-side CSR kept for oracles (direct solve / scipy cross-checks)
    A_csr: sp.csr_matrix = dataclasses.field(repr=False, default=None)

    def constraints(self):
        """[mass, momentum, energy] — ordered as the reference conlist
        (lkdv/LinearSolver.py:47)."""
        n0 = self.n0
        dt = self.b.dtype
        zeros_v = None
        omega_full = jnp.zeros(3 * n0, dt).at[:n0].set(self.omega)
        mass = QuadraticConstraint(M=None, v=omega_full, c=-self.m0, name="mass")
        momentum = QuadraticConstraint(
            M=_BlockDiag3(self.Mmat, (1.0, 0.0, 0.0)), v=zeros_v, c=-self.mo0,
            name="momentum",
        )
        energy = QuadraticConstraint(
            M=_BlockDiag3(self.Mmat, (-1.0, 0.0, 1.0)), v=zeros_v, c=-self.e0,
            name="energy",
        )
        return [mass, momentum, energy]

    def compute_invariants(self, z: jnp.ndarray) -> dict:
        u, v, w = jnp.split(z, 3)
        return {
            "mass": jnp.dot(self.omega, u),
            "momentum": 0.5 * jnp.dot(u, self.Mmat @ u),
            "energy": 0.5 * jnp.dot(w, self.Mmat @ w) - 0.5 * jnp.dot(u, self.Mmat @ u),
        }

    def step_update(self, z_prev: jnp.ndarray) -> "System":
        """Next-step system from a previous solution — device-side re-seed of
        b and the invariant targets, with A/M/G reused (replaces the
        reference's full Firedrake reassembly per step, lkdv/Evolve.py:57-59).
        Jit-compatible: all updated fields are traced arrays."""
        n0 = self.n0
        dt_step = self.prob.T / self.prob.N
        u0, _, w0 = jnp.split(z_prev, 3)
        b = jnp.concatenate(
            [
                (self.Mmat @ u0) / dt_step,
                0.5 * (self.Mmat @ u0) + 0.5 * (self.Gmat @ w0),
                jnp.zeros(n0, z_prev.dtype),
            ]
        )
        return dataclasses.replace(
            self,
            b=b,
            z0=z_prev,
            m0=jnp.dot(self.omega, u0),
            mo0=0.5 * jnp.dot(u0, self.Mmat @ u0),
            e0=0.5 * jnp.dot(w0, self.Mmat @ w0) - 0.5 * jnp.dot(u0, self.Mmat @ u0),
        )


@dataclasses.dataclass(frozen=True)
class _BlockDiag3:
    """blockdiag(c0·M, c1·M, c2·M) as an operator on the 3-field vector."""

    Mmat: object
    coeffs: tuple

    def __matmul__(self, x):
        parts = jnp.split(x, 3, axis=0)
        return jnp.concatenate(
            [c * (self.Mmat @ p) if c else jnp.zeros_like(p)
             for c, p in zip(self.coeffs, parts)],
            axis=0,
        )

    def todense(self):
        Md = jnp.asarray(self.Mmat.todense())
        n0 = Md.shape[0]
        out = jnp.zeros((3 * n0, 3 * n0), Md.dtype)
        for f, c in enumerate(self.coeffs):
            if c:
                out = out.at[f * n0:(f + 1) * n0, f * n0:(f + 1) * n0].set(c * Md)
        return out

    def dd_matvec(self, x):
        """Double-f32 matvec (constraints/quadratic.py::_dd_matvec protocol)."""
        from ..constraints.quadratic import _dd_matvec
        from ..ops import dd as _dd

        his = jnp.split(x.hi, 3)
        los = jnp.split(x.lo, 3)
        outs = []
        for c, h, l in zip(self.coeffs, his, los):
            if not c:
                outs.append(_dd.DD(jnp.zeros_like(h), jnp.zeros_like(l)))
                continue
            u = _dd_matvec(self.Mmat, _dd.DD(h, l))
            if c != 1.0:
                u = _dd.mul(_dd.from_f64_scalar(float(c), h.shape), u)
            outs.append(u)
        return _dd.DD(
            jnp.concatenate([o.hi for o in outs]),
            jnp.concatenate([o.lo for o in outs]),
        )


import jax.tree_util as _tu

_tu.register_pytree_node(
    _BlockDiag3,
    lambda o: ((o.Mmat,), o.coeffs),
    lambda aux, ch: _BlockDiag3(ch[0], aux),
)


def linforms(
    N: int = 100,
    M: int = 50,
    degree: int = 1,
    T: float = 1.0,
    space: str = "DG",
    zinit: Optional[np.ndarray] = None,
    dtype=None,
) -> System:
    """Assemble the lkdv step system (reference lkdv/lkdv.py:46-148).

    ``zinit`` (flat 3-field vector) re-seeds u0/w0 from a previous step, as
    the reference's Evolve loop does (lkdv/Evolve.py:57-59).
    """
    dtype = dtype or default_dtype()
    prob = Problem(N=N, M=M, degree=degree, space=space, T=float(T))
    fem = prob.fem()
    n0 = fem.ndof
    dt_step = prob.T / prob.N

    Mh = fem.mass()
    Gh = fem.gfunc()
    omega_h = fem.omega()

    if zinit is None:
        u0 = fem.project(lambda x: prob.exact(x, 0.0))
        import scipy.sparse.linalg as spla

        w0 = spla.spsolve(Mh, Gh @ u0)  # gfuncproject (lkdv/lkdv.py:62-69)
        v0 = np.zeros(n0)
    else:
        zinit = np.asarray(zinit)
        u0, v0, w0 = np.split(zinit, 3)
        # reference re-seeds only u and w (lkdv/lkdv.py:80-82); v is rebuilt
        # by the solve itself
        v0 = np.zeros(n0)

    Z = sp.csr_matrix((n0, n0))
    A_csr = sp.bmat(
        [
            [Mh / dt_step, Gh, Z],
            [-0.5 * Mh, Mh, -0.5 * Gh],
            [-Gh, Z, Mh],
        ],
        format="csr",
    )
    b = np.concatenate([Mh @ u0 / dt_step, 0.5 * (Mh @ u0) + 0.5 * (Gh @ w0), np.zeros(n0)])

    m0 = omega_h @ u0
    mo0 = 0.5 * u0 @ (Mh @ u0)
    e0 = 0.5 * w0 @ (Mh @ w0) - 0.5 * u0 @ (Mh @ u0)

    z0 = np.concatenate([u0, v0, w0])
    return System(
        A=maybe_stencil(from_scipy(A_csr, dtype=dtype)),
        b=jnp.asarray(b, dtype),
        z0=jnp.asarray(z0, dtype),
        Mmat=from_scipy(Mh, dtype=dtype),
        Gmat=from_scipy(Gh, dtype=dtype),
        omega=jnp.asarray(omega_h, dtype),
        m0=jnp.asarray(m0, dtype),
        mo0=jnp.asarray(mo0, dtype),
        e0=jnp.asarray(e0, dtype),
        prob=prob,
        n0=n0,
        A_csr=A_csr,
    )
