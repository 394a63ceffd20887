"""End-to-end TPU smoke check: drive the library's public API on the real
chip and assert render sanity, refinement quality and throughput.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_smoke.py
Passes on a v5e in ~2 min cold, ~40 s warm (compile cache).
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.utils.metrics import rotation_angle_deg
from pose_refine_tpu.utils.sync import sync

print("backend:", jax.default_backend())
model = mesh.load_benchmark_model()
proj = prt.compute_proj(prt.LINEMOD_K, 640, 480)
R = np.array([[0.34768538, 0.93761126, 0.0],
              [0.70540612, -0.26157897, -0.65877056],
              [-0.61767070, 0.22904489, -0.75234390]], np.float32)
pose = np.asarray(geometry.pose_from_Rt(R, np.array([0, 0, 300], np.float32)))

# 1. render sanity (expected stats for the obj_06 reference viewpoint)
d = np.asarray(sync(prt.render(model.tris, pose[None], 640, 480, proj)))[0]
cov = (d > 0).mean()
if model.tris.shape[0] == 31468:  # real obj_06 asset
    assert 0.07 < cov < 0.10 and 240 < d[d > 0].min() < 260, (cov, d[d > 0].min())
print(f"render: coverage {cov*100:.1f}%, depth {d[d>0].min()}..{d[d>0].max()} mm")

# 2. production-config refinement of 256 perturbed hypotheses
rng = np.random.default_rng(0)
dr = np.asarray(geometry.euler_to_rotation(
    rng.uniform(-0.17, 0.17, (256, 3)).astype(np.float32)))
bad = np.asarray(geometry.pose_from_Rt(
    np.einsum("nij,jk->nik", dr, pose[:3, :3]),
    pose[:3, 3] + rng.uniform(-20, 20, (256, 3)).astype(np.float32)))
refiner = prt.PoseRefiner(model, K=prt.LINEMOD_K, width=640, height=480,
                          render_scale=2, max_points=2048, window=128,
                          stride=2, chunk_iters=64, decimate_mm=2.0)
refiner.set_scene_depth(d)
out = refiner.refine(bad); sync((out[0], out[1].fitness))      # compile
t0 = time.perf_counter()
refined, res = refiner.refine(bad); sync((refined, res.fitness))
wall = time.perf_counter() - t0
err = rotation_angle_deg(np.asarray(refined), pose)
rec = float((err < 3.0).mean())
print(f"refine: batch 256 in {wall*1000:.0f} ms ({256/wall:.0f} poses/s), "
      f"recovered {rec*100:.0f}%, median err {np.median(err):.3f} deg")
assert rec > 0.8 and np.median(err) < 0.5

# 3. NN scene (auto backend + voxel downsample)
r_nn = prt.PoseRefiner(model, K=prt.LINEMOD_K, width=640, height=480,
                       render_scale=2, max_points=2048, window=128, stride=2,
                       chunk_iters=64, decimate_mm=2.0, scene="nn",
                       scene_voxel_mm=2.0)
r_nn.set_scene_depth(d)
refined, res = r_nn.refine(bad[:32]); sync((refined,))
err = rotation_angle_deg(np.asarray(refined), pose)
print(f"nn scene ({r_nn.scene.backend}, {r_nn.scene.points.shape[0]} pts): "
      f"recovered {(err < 3).mean()*100:.0f}%")
assert (err < 3).mean() > 0.9
print("TPU SMOKE OK")
