"""Projective data association: look the source point up in the scene depth
image via the camera intrinsics.

TPU-native re-expression of Scene_projective (depth_scene.h:7-49): the scene
is a pytree of dense (H, W, 3) point/normal images; ``query`` is a pure,
vectorized project->gather->gate. Because it is a pytree with a pure method,
the whole ICP loop jits and vmaps with the scene captured as an operand.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pose_refine_tpu import geometry
from pose_refine_tpu.ops.depth_to_cloud import depth_image_to_points
from pose_refine_tpu.ops.normals import estimate_normals


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneProjective:
    """Scene = dense point image + normal image + intrinsics.

    query semantics (depth_scene.h:29-48): project the source point with
    pcd2dep rounding, bounds-check the pixel, gate on scene z > 0 and
    |src.z - dst.z| <= max_dist_diff (0.1 m default, depth_scene.h:9).
    """

    pcd: jnp.ndarray      # (H, W, 3) float32, meters
    normal: jnp.ndarray   # (H, W, 3) float32
    K: jnp.ndarray        # (3, 3) float32
    max_dist_diff: jnp.ndarray  # () float32

    @classmethod
    def from_depth(cls, depth, K, max_dist_diff: float = 0.1) -> "SceneProjective":
        """Build from an (H, W) mm depth image: per-pixel dep2pcd + LINEMOD
        normals (init_Scene_projective_cpu behavior)."""
        pts, _mask = depth_image_to_points(depth, K)
        nrm = estimate_normals(depth, K)
        return cls(
            pcd=pts,
            normal=nrm,
            K=jnp.asarray(K, jnp.float32),
            max_dist_diff=jnp.float32(max_dist_diff),
        )

    def query(self, src):
        """(..., 3) source points -> (dst (...,3), normal (...,3), valid (...))."""
        h, w = self.pcd.shape[:2]
        xyd = geometry.pcd2dep(src, self.K)
        x, y = xyd[..., 0], xyd[..., 1]
        inb = (x >= 0) & (x < w) & (y >= 0) & (y < h)
        xc = jnp.clip(x, 0, w - 1)
        yc = jnp.clip(y, 0, h - 1)
        dst = self.pcd[yc, xc]
        nrm = self.normal[yc, xc]
        valid = inb & (dst[..., 2] > 0) & (
            jnp.abs(src[..., 2] - dst[..., 2]) <= self.max_dist_diff
        )
        return dst, nrm, valid
