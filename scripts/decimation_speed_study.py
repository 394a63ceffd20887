"""Does decimating the HYPOTHESIS render mesh buy throughput at no accuracy?

The raster kernel's work scales with triangle blocks (31468 tris = 246
blocks); the reference's own loader advises simplifying >10k-face meshes
(renderer.cpp:50-57 "you may want tools like meshlab..."). We have a
built-in vertex-clustering decimator (mesh.simplify_vertex_clustering).
The SCENE stays full-resolution (it comes from the sensor); only the
rendered hypothesis clouds move by ~cell_size/2, which must stay inside the
~0.6 mm depth-quantization floor to be free.

Gates: recovery, per-case verdict agreement vs the full-mesh TPU run,
ADD-to-truth of recovered poses.
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
# scene ALWAYS from the full mesh (it plays the sensor)
scene_depth = np.asarray(sync(rasterize_pallas(tris, jnp.asarray(truth)[None], W, H, proj)))[0]
poses_j = jax.device_put(jnp.asarray(poses))

base_ok = None
for cell in (0.0, 2.0, 3.0, 4.0, 6.0):
    m = model if cell == 0.0 else mesh.simplify_vertex_clustering(model, cell_size=cell)
    refiner = prt.PoseRefiner(m, K=K, width=W, height=H, render_scale=2,
                              chunk_iters=64, window=128, stride=2, max_points=2048)
    refiner.set_scene_depth(scene_depth)
    refined, res = refiner.refine(poses_j)
    sync((refined,))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        refined, res = refiner.refine(poses_j)
        sync((refined, res.fitness))
        times.append(time.perf_counter() - t0)
    wall = sorted(times)[2]
    refined = np.asarray(refined)
    rot = rotation_angle_deg(refined, truth)
    rec = rot < 3.0
    if base_ok is None:
        base_ok = rec
    adds = add_error(refined, truth, model.vertices)
    print(f"cell {cell:3.1f} mm ({m.tris.shape[0]:6d} tris): wall {wall*1000:6.1f} ms "
          f"({N/wall:5.0f} poses/s) | recovered {rec.mean()*100:3.0f}% | verdict agree "
          f"{(rec == base_ok).mean()*100:3.0f}% | ADD(recovered) mean "
          f"{adds[rec].mean():.3f} max {adds[rec].max():.3f} mm", flush=True)
