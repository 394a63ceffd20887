"""End-to-end TPU smoke check: drive the library's public API on the real
chip and assert render sanity, refinement quality and throughput.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_smoke.py
Passes on a v5e in ~2 min cold, ~40 s warm (compile cache).
"""
import time

import jax
import numpy as np

from _workload import setup

import pose_refine_tpu as prt
from pose_refine_tpu.utils.metrics import rotation_angle_deg
from pose_refine_tpu.utils.sync import sync

print("backend:", jax.default_backend())
model, tris, K, proj, truth, bad = setup(256)

# 1. render sanity (expected stats for the obj_06 reference viewpoint)
d = np.asarray(sync(prt.render(model.tris, truth[None], 640, 480, proj)))[0]
cov = (d > 0).mean()
if model.tris.shape[0] == 31468:  # real obj_06 asset
    assert 0.07 < cov < 0.10 and 240 < d[d > 0].min() < 260, (cov, d[d > 0].min())
print(f"render: coverage {cov*100:.1f}%, depth {d[d>0].min()}..{d[d>0].max()} mm")

# 2. production-config refinement of 256 perturbed hypotheses
refiner = prt.PoseRefiner(model, K=K, width=640, height=480,
                          render_scale=2, max_points=2048, window=128,
                          stride=2, chunk_iters=64, decimate_mm=4.0)
refiner.set_scene_depth(d)
out = refiner.refine(bad); sync((out[0], out[1].fitness))      # compile
t0 = time.perf_counter()
refined, res = refiner.refine(bad); sync((refined, res.fitness))
wall = time.perf_counter() - t0
err = rotation_angle_deg(np.asarray(refined), truth)
rec = float((err < 3.0).mean())
print(f"refine: batch 256 in {wall*1000:.0f} ms ({256/wall:.0f} poses/s), "
      f"recovered {rec*100:.0f}%, median err {np.median(err):.3f} deg")
assert rec > 0.8 and np.median(err) < 0.5

# 3. NN scene (auto backend + voxel downsample)
r_nn = prt.PoseRefiner(model, K=K, width=640, height=480,
                       render_scale=2, max_points=2048, window=128, stride=2,
                       chunk_iters=64, decimate_mm=2.0, scene="nn",
                       scene_voxel_mm=2.0)
r_nn.set_scene_depth(d)
refined, res = r_nn.refine(bad[:32]); sync((refined,))
err = rotation_angle_deg(np.asarray(refined), truth)
print(f"nn scene ({r_nn.scene.backend}, {r_nn.scene.points.shape[0]} pts): "
      f"recovered {(err < 3).mean()*100:.0f}%")
assert (err < 3).mean() > 0.9
print("TPU SMOKE OK")
