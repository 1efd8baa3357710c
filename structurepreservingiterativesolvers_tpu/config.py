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

def enable_compile_cache(cache_dir: str = None) -> bool:
    """Turn on the persistent compilation cache (TPU entry points only).

    Through the axon remote-compile tunnel every program costs 1-4 minutes
    to compile, per process; the on-disk cache is verified to work across
    processes with the axon backend (9.7 s → 0.3 s).  NOT enabled globally:
    serialising CPU executables with the axon plugin loaded segfaults
    (observed in the round-5 test suite), so bench/sweep/probe scripts call
    this explicitly after their health gate."""
    if os.environ.get("SPIS_DISABLE_COMPILE_CACHE", "0") == "1":
        return False
    cache_dir = cache_dir or os.environ.get(
        "SPIS_COMPILE_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     ".jax_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except (OSError, AttributeError):  # read-only install dir / old jax
        return False


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
