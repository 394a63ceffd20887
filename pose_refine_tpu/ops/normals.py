"""LINEMOD-style surface-normal estimation from a depth image.

A vectorized stencil re-expression of the reference's per-pixel
bilateral-weighted plane fit (scene/common.cpp:17-107): 8 neighbors at radius
r=5, inlier gate |d_neighbor - d| < 50 mm, center gate d < 2000 mm, 2x2
least-squares solve per pixel, normal = normalize(fx*ddx, fy*ddy, -det*d).

The reference is CPU-only here (README notes a GPU version as future work);
on TPU this is a pure elementwise/shift pipeline on the VPU - an easy win.
Integer accumulators fit int32 comfortably (|A| <= 8*r^2 = 200, |b| <=
8*r*threshold = 2000); the one product that can exceed int32 (det*d, up to
~2.6e9) is formed in float32 exactly as the reference casts to float there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_OFFSETS = ((-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1))


@functools.partial(
    jax.jit,
    static_argnames=("radius", "difference_threshold", "distance_threshold"),
)
def estimate_normals(
    depth,
    K,
    radius: int = 5,
    difference_threshold: int = 50,
    distance_threshold: int = 2000,
):
    """(H, W) int depth (mm) + K -> (H, W, 3) float32 normals; 0 where invalid.

    Matches get_normal (common.cpp:17-107) including its quirks: the center
    gate is d < distance_threshold (zero-depth pixels are NOT excluded,
    the reference's `l_d > 0` check is commented out), and the valid interior
    is rows/cols [r, dim - r - 2] (its loops stop at dim - r - 1, exclusive).
    """
    depth = jnp.asarray(depth).astype(jnp.int32)
    h, w = depth.shape
    K = jnp.asarray(K, jnp.float32)
    r = radius

    pad = jnp.pad(depth, r)  # zero padding; only the interior is kept anyway

    a0 = jnp.zeros((h, w), jnp.int32)
    a1 = jnp.zeros((h, w), jnp.int32)
    a3 = jnp.zeros((h, w), jnp.int32)
    b0 = jnp.zeros((h, w), jnp.int32)
    b1 = jnp.zeros((h, w), jnp.int32)

    for ox, oy in _OFFSETS:
        dx, dy = ox * r, oy * r
        neighbor = jax.lax.dynamic_slice(pad, (r + dy, r + dx), (h, w))
        delta = neighbor - depth
        f = (jnp.abs(delta) < difference_threshold).astype(jnp.int32)
        a0 = a0 + f * (dx * dx)
        a1 = a1 + f * (dx * dy)
        a3 = a3 + f * (dy * dy)
        b0 = b0 + f * dx * delta
        b1 = b1 + f * dy * delta

    det = a0 * a3 - a1 * a1
    ddx = a3 * b0 - a1 * b1
    ddy = -a1 * b0 + a0 * b1

    nx = K[0, 0] * ddx.astype(jnp.float32)
    ny = K[1, 1] * ddy.astype(jnp.float32)
    nz = -det.astype(jnp.float32) * depth.astype(jnp.float32)
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)

    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row >= r) & (row < h - r - 1) & (col >= r) & (col < w - r - 1)
    ok = (depth < distance_threshold) & (norm > 0) & interior

    inv = jnp.where(ok, 1.0 / jnp.where(norm > 0, norm, 1.0), 0.0)
    return jnp.stack([nx * inv, ny * inv, nz * inv], axis=-1)
