"""Pallas-kernel vs XLA-scatter raster parity ON REAL TPU HARDWARE.

Interpret-mode and scatter-vs-C++ parity are bit-exact (tests); on hardware
the kernel computes barycentrics from precomputed affine coefficients
(2 FMAs/pixel) while the XLA form evaluates the vertex expression directly -
algebraically identical, 1-ulp different at triangle-EDGE pixels, flipping
coverage on a handful of pixels per frame. This script measures the rate
(expect ~1e-5..1e-6 of pixels; depth diffs bounded by adjacent-triangle
depth gaps). Matching exactly would ~3x the kernel inner loop.
"""
import jax
import jax.numpy as jnp
import numpy as np

from _workload import setup

from pose_refine_tpu import geometry, mesh
import pose_refine_tpu.ops.rasterize as rz
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
from pose_refine_tpu.utils.sync import sync

model, tris_full, K, proj, truth, poses_np = setup(8)
poses = jax.device_put(jnp.asarray(poses_np))
dec = mesh.simplify_vertex_clustering(model, 2.0)
tris_dec = jnp.asarray(dec.tris[mesh.morton_order(dec.tris)])

for tag, tris, rs in (("full mesh, rs=1", tris_full, 1),
                      ("full mesh, rs=2", tris_full, 2),
                      ("decimated, rs=2", tris_dec, 2)):
    w, h = 640 // rs, 480 // rs
    K2 = K.copy(); K2[:2] /= rs
    p2 = geometry.compute_proj(K2, w, h)
    ref = np.asarray(sync(rz.rasterize_scatter(tris, poses, w, h, p2)))
    for variant in ("tile16", "tile32"):
        o = np.asarray(sync(rasterize_pallas(tris, poses, w, h, p2, variant=variant)))
        d = o.astype(np.int64) - ref.astype(np.int64)
        nd = (d != 0).sum()
        print(f"{tag} {variant} vs scatter: {nd} differing px "
              f"({nd/o.size*100:.5f}%), max |diff| {np.abs(d).max() if nd else 0}",
              flush=True)
