"""Uncontended same-host C++ reference-baseline throughput (best-of-3).

Run WITHOUT TPU work in the process: the axon tunnel client contends for
this host's single core and inflates in-bench CPU timings 3-20x.
"""
import time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu import geometry, mesh, native
from pose_refine_tpu.ops.depth_to_cloud import depth_to_cloud
from pose_refine_tpu.ops.normals import estimate_normals
import pose_refine_tpu.ops.rasterize as rz
from pose_refine_tpu.scene.projective import SceneProjective

W, H = 640, 480
model = mesh.load_benchmark_model()
tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
K = geometry.LINEMOD_K
proj = geometry.compute_proj(K, W, H)
R1 = np.array([[0.34768538, 0.93761126, 0.0],
               [0.70540612, -0.26157897, -0.65877056],
               [-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0,0,300], np.float32)))
rng = np.random.default_rng(0)
d_rot = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.17,0.17,(16,3)).astype(np.float32)))
poses = np.asarray(geometry.pose_from_Rt(
    jnp.einsum("nij,jk->nik", d_rot, truth[:3,:3]),
    truth[:3,3] + rng.uniform(-20,20,(16,3)).astype(np.float32)))
scene_depth = np.asarray(rz.rasterize_scatter(tris, jnp.asarray(truth)[None], W, H, proj))[0]
scene = SceneProjective.from_depth(scene_depth, K)
print("threads:", native.cpu_threads())
best_r = best_i = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    dep = native.cpu_render_baseline(np.asarray(tris), poses, np.asarray(proj), W, H)
    best_r = min(best_r, time.perf_counter() - t0)
clouds, valids = [], []
for i in range(16):
    c, v, _ = depth_to_cloud(dep[i], K, max_points=32768)
    clouds.append(np.asarray(c)); valids.append(np.asarray(v))
for _ in range(3):
    t0 = time.perf_counter()
    T, _, _ = native.cpu_icp_baseline(np.stack(clouds), np.stack(valids),
                                      np.asarray(scene.pcd), np.asarray(scene.normal), K)
    best_i = min(best_i, time.perf_counter() - t0)
pp = (best_r + best_i) / 16
print(f"uncontended CPU baseline: render {best_r/16*1000:.1f} ms + icp {best_i/16*1000:.1f} ms "
      f"per pose = {1/pp:.1f} poses/sec")
