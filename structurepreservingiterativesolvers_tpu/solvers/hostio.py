"""Host↔device traffic minimisation for the solver wrappers.

Through the axon remote-TPU tunnel every host→device put and device→host
fetch is a ~30–55 ms RPC round trip, while a fully device-resident k=30
GMRES solve executes in well under a millisecond (scripts/tpu_probe9.py).
The reference solver pays nothing analogous — its numpy state lives on the
host (reference ``solvers.py:58-127``) — so the TPU wrappers must keep
per-call host traffic to the bare minimum:

* ``dscalar`` caches device-resident scalar operands (tolerances), so the
  put happens once per distinct value instead of once per solve;
* result fetches are batched into a single ``jax.device_get`` per solve.

On locally-attached TPU hardware these round trips are microseconds and
this module is merely tidy; through the tunnel it is a ~100 ms/solve saving.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp


@lru_cache(maxsize=1024)
def _device_scalar(value: float, dtype_name: str):
    return jnp.asarray(value, jnp.dtype(dtype_name))


def dscalar(value, dtype):
    """Device scalar for ``value`` with a process-lifetime put cache."""
    return _device_scalar(float(value), jnp.dtype(dtype).name)
