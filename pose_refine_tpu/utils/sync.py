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
    """Block until every array in the pytree has finished computing.

    One fused probe program reads the first element of EVERY leaf, then a
    single 1-element D2H fetch fences them all. (A per-leaf probe costs one
    ~30 ms tunnel round trip each - fencing a (poses, results) pair that way
    doubled the apparent pipeline latency.)"""
    leaves = [
        x for x in jax.tree.leaves(tree) if hasattr(x, "dtype") and x.size > 0
    ]  # size-0 leaves carry no computation to wait on
    if not leaves:
        return tree
    probe = _fence_probe(tuple(leaves))
    np.asarray(jax.device_get(probe))
    return tree


@jax.jit
def _fence_probe(leaves):
    return sum(jnp.real(jnp.ravel(x)[0]).astype(jnp.float32) * 0.0 for x in leaves)
