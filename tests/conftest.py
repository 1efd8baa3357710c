"""Test configuration: force CPU with an 8-device virtual mesh and x64.

Multi-chip sharding paths are exercised on virtual CPU devices (the driver
validates the real multi-chip path separately via ``__graft_entry__``).
These env vars must be set before jax is imported by any test module.
"""

import os

# The axon site-package forces JAX_PLATFORMS=axon; the config.update below
# (not the env var) is what actually wins, but set both for good measure.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
