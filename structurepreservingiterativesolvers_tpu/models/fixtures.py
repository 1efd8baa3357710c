"""Portable pre-assembled system fixtures (.npz).

SURVEY §2.4's plan: the reference's Firedrake-assembled systems become
portable CSR fixtures so solves are reproducible anywhere without a FEM
stack.  A fixture stores the CSR operator, right-hand side, initial vector,
invariant seeds and constraint data; ``load`` reconstitutes a solve-ready
``(A, b, constraints, meta)`` tuple with device operators.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import default_dtype
from ..constraints.quadratic import QuadraticConstraint
from ..ops.sparse import from_scipy


def _csr_fields(prefix: str, A: sp.csr_matrix) -> dict:
    A = sp.csr_matrix(A)
    return {
        f"{prefix}_data": A.data,
        f"{prefix}_indices": A.indices,
        f"{prefix}_indptr": A.indptr,
        f"{prefix}_shape": np.asarray(A.shape),
    }


def _csr_read(prefix: str, f) -> sp.csr_matrix:
    return sp.csr_matrix(
        (f[f"{prefix}_data"], f[f"{prefix}_indices"], f[f"{prefix}_indptr"]),
        shape=tuple(f[f"{prefix}_shape"]),
    )


def save_fixture(path: str, system, problem: str) -> None:
    """Persist an assembled model ``System`` (lkdv/heat/swe/lkdvrk)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fields = _csr_fields("A", system.A_csr)
    fields["b"] = np.asarray(system.b)
    fields["z0"] = np.asarray(system.z0)
    fields["problem"] = np.asarray(problem)
    cons = system.constraints()
    fields["n_constraints"] = np.asarray(len(cons))
    for i, c in enumerate(cons):
        fields[f"con{i}_name"] = np.asarray(c.name)
        fields[f"con{i}_c"] = np.asarray(c.c)
        if c.v is not None:
            fields[f"con{i}_v"] = np.asarray(c.v)
        M = c.M
        if M is not None:
            # materialise the constraint operator as CSR (fixtures are for
            # portability, not peak speed); operators must provide todense
            if not hasattr(M, "todense"):
                raise NotImplementedError(
                    f"constraint operator {type(M).__name__} cannot be "
                    "materialised; save the model parameters instead"
                )
            Mh = sp.csr_matrix(np.asarray(M.todense()))
            fields.update(_csr_fields(f"con{i}_M", Mh))
    np.savez_compressed(path, **fields)


def load_fixture(path: str, dtype=None):
    """Load a fixture → (A_device, b, z0, constraints, A_csr)."""
    dtype = dtype or default_dtype()
    with np.load(path, allow_pickle=False) as f:
        A_csr = _csr_read("A", f)
        b = jnp.asarray(f["b"], dtype)
        z0 = jnp.asarray(f["z0"], dtype)
        cons = []
        for i in range(int(f["n_constraints"])):
            v = jnp.asarray(f[f"con{i}_v"], dtype) if f"con{i}_v" in f else None
            M = (
                from_scipy(_csr_read(f"con{i}_M", f), dtype=dtype)
                if f"con{i}_M_data" in f
                else None
            )
            cons.append(
                QuadraticConstraint(
                    M=M, v=v, c=jnp.asarray(f[f"con{i}_c"], dtype),
                    name=str(f[f"con{i}_name"]),
                )
            )
    return from_scipy(A_csr, dtype=dtype), b, z0, tuple(cons), A_csr
