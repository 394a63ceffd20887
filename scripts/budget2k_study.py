"""Can the production point budget drop below 4096? (round-2 follow-up)

point_budget_study.py showed recovery/ADD flat down to ~2k points at full
resolution. ICP is gather-bound (cost ~ points x iters), so halving the
budget should cut ~75 ms off the 256-pose batch -- IF a sort-free lift
geometry exists at that budget and accuracy holds at render_scale=2.

Candidates (all sort-free unless noted):
  A  window 128 / stride 2 -> 4096 pts   (current production)
  B  window 128 / stride 3 -> 1849 pts   (same crop coverage, sparser)
  C  window  96 / stride 2 -> 2304 pts   (tighter crop, same density)
  D  window 128 / stride 2 -> top_k 2048 (sort cost vs gather saving)
Quality gates: recovery<3deg, ADD-to-truth of recovered poses, and
fixed-seed per-case verdict agreement vs config A.
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

configs = [
    ("A w128/s2 mp4096 (prod)", dict(window=128, stride=2, max_points=4096)),
    ("B w128/s3 mp1849", dict(window=128, stride=3, max_points=1849)),
    ("C w96/s2  mp2304", dict(window=96, stride=2, max_points=2304)),
    ("D w128/s2 topk2048", dict(window=128, stride=2, max_points=2048)),
]

base_ok = None
for name, cfg in configs:
    refiner = prt.PoseRefiner(model, K=K, width=W, height=H, render_scale=2,
                              chunk_iters=64, **cfg)
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
    print(f"{name}: wall {wall*1000:6.1f} ms ({N/wall:5.0f} poses/s) | "
          f"recovered {rec.mean()*100:3.0f}% | verdict agree vs A "
          f"{(rec == base_ok).mean()*100:3.0f}% | ADD(recovered) mean "
          f"{adds[rec].mean():.3f} max {adds[rec].max():.3f} mm", flush=True)
