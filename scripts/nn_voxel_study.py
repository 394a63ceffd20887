"""NN-scene voxel downsampling: accuracy vs throughput on the bench workload.

Exact NN is O(queries x scene points) (PERF_NOTES: the flash kernel runs at
VPU issue rate - the cost IS the physics), so shrinking the scene cloud is
the honest lever for the NN pipeline. Voxel downsampling (centroid +
renormalized mean normal) is the standard practice the reference leaves to
its users. Gates: recovery, ADD-to-truth of recovered poses, and agreement
with the voxel=0 NN run.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
from pose_refine_tpu.utils.metrics import add_error, rotation_angle_deg
from pose_refine_tpu.utils.sync import sync

W, H, N = 640, 480, 256
model = mesh.load_benchmark_model()
tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
K = geometry.LINEMOD_K
proj = geometry.compute_proj(K, W, H)
R1 = np.array([[0.34768538, 0.93761126, 0.0],
               [0.70540612, -0.26157897, -0.65877056],
               [-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0, 0, 300], np.float32)))
rng = np.random.default_rng(0)
d_rot = np.asarray(geometry.euler_to_rotation(
    rng.uniform(-0.17, 0.17, (N, 3)).astype(np.float32)))
poses = np.asarray(geometry.pose_from_Rt(
    jnp.einsum("nij,jk->nik", d_rot, truth[:3, :3]),
    truth[:3, 3] + rng.uniform(-20, 20, (N, 3)).astype(np.float32)))
scene_depth = np.asarray(sync(rasterize_pallas(tris, jnp.asarray(truth)[None], W, H, proj)))[0]
poses_j = jax.device_put(jnp.asarray(poses))

base_ok = None
for vox in (0.0, 2.0, 3.0, 4.0, 6.0):
    refiner = prt.PoseRefiner(model, K=K, width=W, height=H, render_scale=2,
                              chunk_iters=64, window=128, stride=2,
                              max_points=2048, decimate_mm=2.0,
                              scene="nn_bruteforce", scene_voxel_mm=vox)
    refiner.set_scene_depth(scene_depth)
    n_scene = refiner.scene.points.shape[0]
    refined, res = refiner.refine(poses_j)
    sync((refined,))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        refined, res = refiner.refine(poses_j)
        sync((refined, res.fitness))
        times.append(time.perf_counter() - t0)
    wall = sorted(times)[1]
    refined = np.asarray(refined)
    rot = rotation_angle_deg(refined, truth)
    rec = rot < 3.0
    if base_ok is None:
        base_ok = rec
    adds = add_error(refined, truth, model.vertices)
    print(f"voxel {vox:3.1f} mm ({n_scene:6d} scene pts): wall {wall*1000:7.1f} ms "
          f"({N/wall:5.0f} poses/s) | recovered {rec.mean()*100:3.0f}% | agree vs vox0 "
          f"{(rec == base_ok).mean()*100:3.0f}% | ADD(recovered) mean "
          f"{adds[rec].mean():.3f} max {adds[rec].max():.3f} mm", flush=True)
