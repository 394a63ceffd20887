"""Projective data association: look the source point up in the scene depth
image via the camera intrinsics.

TPU-native re-expression of Scene_projective (depth_scene.h:7-49): the scene
is a pytree holding one packed (H*W, 8) float32 table of
[point xyz | normal xyz | pad pad] rows, so the per-point query is a single
row gather (gathers are latency-bound on TPU - one 8-wide gather beats two
3-wide ones by 2x). ``query`` is a pure project->gather->gate; because the
scene is a pytree with a pure method, the whole ICP loop jits and vmaps with
the scene captured as an operand.
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
    """Scene = packed point+normal table + intrinsics.

    query semantics (depth_scene.h:29-48): project the source point with
    pcd2dep rounding, bounds-check the pixel, gate on scene z > 0 and
    |src.z - dst.z| <= max_dist_diff (0.1 m default, depth_scene.h:9).
    """

    table: jnp.ndarray          # (H*W, 8) float32: [pcd xyz, normal xyz, 0, 0]
    K: jnp.ndarray              # (3, 3) float32
    max_dist_diff: jnp.ndarray  # () float32
    height: int = dataclasses.field(metadata=dict(static=True), default=480)
    width: int = dataclasses.field(metadata=dict(static=True), default=640)

    @classmethod
    def from_depth(cls, depth, K, max_dist_diff: float = 0.1) -> "SceneProjective":
        """Build from an (H, W) mm depth image: per-pixel dep2pcd + LINEMOD
        normals (init_Scene_projective_cpu behavior)."""
        pts, _mask = depth_image_to_points(depth, K)
        nrm = estimate_normals(depth, K)
        h, w = pts.shape[:2]
        table = jnp.concatenate(
            [
                pts.reshape(-1, 3),
                nrm.reshape(-1, 3),
                jnp.zeros((h * w, 2), jnp.float32),
            ],
            axis=1,
        )
        return cls(
            table=table,
            K=jnp.asarray(K, jnp.float32),
            max_dist_diff=jnp.float32(max_dist_diff),
            height=int(h),
            width=int(w),
        )

    @property
    def pcd(self):
        """(H, W, 3) point image view (tests / visualization)."""
        return self.table[:, 0:3].reshape(self.height, self.width, 3)

    @property
    def normal(self):
        """(H, W, 3) normal image view."""
        return self.table[:, 3:6].reshape(self.height, self.width, 3)

    def query(self, src):
        """(..., 3) source points -> (dst (...,3), normal (...,3), valid (...))."""
        h, w = self.height, self.width
        xyd = geometry.pcd2dep(src, self.K)
        x, y = xyd[..., 0], xyd[..., 1]
        inb = (x >= 0) & (x < w) & (y >= 0) & (y < h)
        lin = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)
        rows = jnp.take(self.table, lin, axis=0)
        dst = rows[..., 0:3]
        nrm = rows[..., 3:6]
        valid = inb & (dst[..., 2] > 0) & (
            jnp.abs(src[..., 2] - dst[..., 2]) <= self.max_dist_diff
        )
        return dst, nrm, valid
