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
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
import pose_refine_tpu.ops.rasterize as rz
from pose_refine_tpu.utils.sync import sync

W, H, N = 640, 480, 8
model = mesh.load_benchmark_model()
tris_full = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
K = geometry.LINEMOD_K
proj = geometry.compute_proj(K, W, H)
R1 = np.array([[0.34768538, 0.93761126, 0.0],
               [0.70540612, -0.26157897, -0.65877056],
               [-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0,0,300], np.float32)))
rng = np.random.default_rng(0)
d_rot = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.17,0.17,(N,3)).astype(np.float32)))
poses = jax.device_put(jnp.asarray(np.asarray(geometry.pose_from_Rt(
    jnp.einsum("nij,jk->nik", d_rot, truth[:3,:3]),
    truth[:3,3] + rng.uniform(-20,20,(N,3)).astype(np.float32)))))

for tag, tris, rs in (("full mesh, rs=1", tris_full, 1), ("full mesh, rs=2", tris_full, 2)):
    w, h = W // rs, H // rs
    K2 = K.copy(); K2[:2] /= rs
    p2 = geometry.compute_proj(K2, w, h)
    ref = np.asarray(sync(rz.rasterize_scatter(tris, poses, w, h, p2)))
    for variant in ("tile16", "tile32"):
        o = np.asarray(sync(rasterize_pallas(tris, poses, w, h, p2, variant=variant)))
        d = o.astype(np.int64) - ref.astype(np.int64)
        nd = (d != 0).sum()
        print(f"{tag} {variant} vs scatter: {nd} differing px ({nd/o.size*100:.5f}%), "
              f"max |diff| {np.abs(d).max() if nd else 0}")
