"""Raw framebuffer -> depth / mask conversions.

Equivalent of the reference's raw2depth_uint16 / raw2mask_uint8 /
raw2depth_mask output converters (renderer.cpp:300-366, renderer.cu:338-439),
returning batched arrays instead of per-pose cv::Mat lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def raw_to_depth_u16(raw):
    """(N, H, W) int32 mm -> uint16 depth (renderer.cu:354-376)."""
    return raw.astype(jnp.uint16)


@jax.jit
def raw_to_mask_u8(raw):
    """(N, H, W) int32 mm -> uint8 mask, 255 where rendered
    (renderer.cu:378-400)."""
    return jnp.where(raw > 0, jnp.uint8(255), jnp.uint8(0))


@jax.jit
def raw_to_depth_mask(raw):
    """Fused depth+mask conversion (raw2depth_mask_kernel, renderer.cu:402-407)."""
    return raw.astype(jnp.uint16), jnp.where(raw > 0, jnp.uint8(255), jnp.uint8(0))
