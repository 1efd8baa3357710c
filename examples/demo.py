"""End-to-end demo: all four reference problems, GMRES vs CGMRES.

Run: python examples/demo.py   (CPU or TPU; ~1 min on CPU)
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from structurepreservingiterativesolvers_tpu import models, precond, solvers


def show(label, system, k, tol, pre=None):
    xg, gi = solvers.gmres(system.A, system.b, k=k, tol=tol, pre=pre)
    xc, ci = solvers.cgmres(system.A, system.b, k=k, tol=tol,
                            constraints=system.constraints(), pre=pre)
    ig, ic = system.compute_invariants(xg), system.compute_invariants(xc)
    print(f"\n=== {label} (n={system.b.shape[0]}) ===")
    print(f"  gmres : steps {gi['steps']:3d}  res {gi['res'][-1]:.2e}")
    print(f"  cgmres: steps {ci['steps']:3d}  res {ci['res'][-1]:.2e}  "
          f"safety={ci['safety']}")
    for name in ig:
        tgt = {"mass": "m0", "momentum": "mo0", "energy": "e0"}[name]
        t = float(getattr(system, tgt))
        print(f"  {name:9s} deviation: gmres {float(ig[name])-t: .2e}   "
              f"cgmres {float(ic[name])-t: .2e}")


def main():
    show("1D linear KdV (DG3)", models.lkdv.linforms(M=100, degree=3), k=50, tol=1e-6)

    rk = models.lkdvrk.linforms(N=10, M=50, degree=3, tstages=2, T=1.0)
    show("1D linear KdV, 2-stage Gauss-Legendre", rk, k=60, tol=1e-6,
         pre=models.lkdvrk.element_block_preconditioner(rk))

    heat = models.heat.linforms(M=64)
    show("2D heat (P1)", heat, k=30, tol=1e-7,
         pre=precond.chebyshev(heat.A, degree=8))

    show("2D rotating shallow water (C-grid)", models.swe.linforms(M=32),
         k=20, tol=1e-7)


if __name__ == "__main__":
    main()
