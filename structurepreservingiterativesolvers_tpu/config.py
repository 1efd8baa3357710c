"""Global configuration for the framework.

The reference code (reference ``solvers.py:138``) needs constraint deviations
at the 1e-12 level, which requires float64 accumulation.  On CPU (tests,
fixture generation) we enable x64 globally.  On TPU, f64 is emulated and slow,
so the device compute path is dtype-parameterised: kernels accept f32 inputs
with f64 (or compensated-f32) accumulation where it matters.  ``default_dtype``
resolves what the current backend should use.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Enable x64 unless the user explicitly opted out.  On TPU backends jax keeps
# f32 as the practical compute type; x64 support there is emulated, so solver
# entry points take an explicit ``dtype`` argument that defaults via
# ``default_dtype()``.
if os.environ.get("SPIS_DISABLE_X64", "0") != "1":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: through the axon remote-compile tunnel every
# program costs 1-4 minutes to compile, per process.  The on-disk cache is
# verified to work across processes with the axon backend (9.7 s → 0.3 s);
# it turns per-process sweep/bench compile walls into one-time costs.
if os.environ.get("SPIS_DISABLE_COMPILE_CACHE", "0") != "1":
    _cache_dir = os.environ.get(
        "SPIS_COMPILE_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     ".jax_cache"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except (OSError, AttributeError):  # read-only install dir / old jax
        pass


def backend() -> str:
    return jax.default_backend()


def is_tpu() -> bool:
    # The axon tunnel reports platform 'axon' for a real TPU chip.
    plat = jax.devices()[0].platform
    return plat in ("tpu", "axon")


def default_dtype():
    """f64 where cheap (CPU), f32 on TPU hardware."""
    if os.environ.get("SPIS_FORCE_DTYPE"):
        return jnp.dtype(os.environ["SPIS_FORCE_DTYPE"])
    if is_tpu():
        return jnp.dtype("float32")
    return jnp.dtype("float64") if jax.config.jax_enable_x64 else jnp.dtype("float32")


# Tolerance of the constraint-enforcement minimisation problem; mirrors the
# reference's hard-coded ctol (reference solvers.py:138).
CTOL = 1e-12
