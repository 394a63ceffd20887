"""Device synchronization that actually works on every backend.

The experimental axon TPU backend's block_until_ready returns before device
execution completes; a tiny device->host readback is the only reliable fence.
All timing utilities in this repo go through sync() for that reason.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree):
    """Block until every array in the pytree has finished computing."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    for x in leaves:
        flat = jnp.ravel(x)
        np.asarray(jax.device_get(flat[:1]))
    return tree
