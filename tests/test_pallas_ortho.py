"""Fused CGS2 pass kernel (ops/pallas_ortho.py): exactness vs the plain
two-sweep form, and solver-level equivalence when forced on."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from structurepreservingiterativesolvers_tpu.ops.pallas_ortho import (
    fused_update_matvec,
)

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("k1,n", [(21, 1000), (21, 8192), (9, 70000)])
def test_fused_update_matvec_matches_plain(k1, n):
    Q = jnp.asarray(RNG.standard_normal((k1, n)), jnp.float32)
    w = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    h = jnp.asarray(RNG.standard_normal(k1), jnp.float32)
    w1, u2 = fused_update_matvec(Q, w, h, interpret=True)
    w1_ref = w - h @ Q
    u2_ref = Q @ w1_ref
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w1_ref),
                               rtol=1e-5, atol=1e-6)
    scale = float(jnp.max(jnp.abs(u2_ref))) + 1e-30
    np.testing.assert_allclose(np.asarray(u2) / scale,
                               np.asarray(u2_ref) / scale,
                               rtol=0, atol=1e-5)


def test_gmres_with_fused_ortho_matches(monkeypatch):
    """Forcing the kernel (interpret mode on CPU) must reproduce the plain
    CGS2 solve — same steps, same solution to f32 roundoff."""
    monkeypatch.setenv("SPIS_ORTHO_ENGINE", "pallas")
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import gmres
    from structurepreservingiterativesolvers_tpu.solvers.gmres import (
        _build_core,
    )

    _build_core.cache_clear()
    s = heat.linforms(M=24, dtype=jnp.float32)
    x_f, i_f = gmres(s.A, s.b, k=25, tol=1e-5)
    monkeypatch.setenv("SPIS_ORTHO_ENGINE", "xla")
    _build_core.cache_clear()
    x_p, i_p = gmres(s.A, s.b, k=25, tol=1e-5)
    _build_core.cache_clear()
    assert i_f["steps"] == i_p["steps"]
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_p),
                               rtol=2e-4, atol=1e-6)
