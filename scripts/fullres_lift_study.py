"""Full-res (render_scale=1) lift geometry: stride/top_k trade-off study.

The w256/s2 window emits 16384 candidates, putting top_k on its ~120 ms
key-count floor; stride 3 emits 7396 at the same crop coverage. Measured
(TPU v5e, bench workload): s2/mp4096 521/s, s3/mp4096 580/s at 100%%
verdict agreement and identical ADD, s3/mp2048 690/s at 99%%.
"""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
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
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0,0,300], np.float32)))
rng = np.random.default_rng(0)
d_rot = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.17,0.17,(N,3)).astype(np.float32)))
poses_j = jax.device_put(jnp.asarray(np.asarray(geometry.pose_from_Rt(
    jnp.einsum("nij,jk->nik", d_rot, truth[:3,:3]),
    truth[:3,3] + rng.uniform(-20,20,(N,3)).astype(np.float32)))))
scene_depth = np.asarray(sync(rasterize_pallas(tris, jnp.asarray(truth)[None], W, H, proj)))[0]

base_ok = None
for name, cfg in (("fullres w256/s2 mp4096 (current)", dict(window=256, stride=2, max_points=4096)),
                  ("fullres w256/s3 mp4096", dict(window=256, stride=3, max_points=4096)),
                  ("fullres w256/s3 mp2048", dict(window=256, stride=3, max_points=2048))):
    refiner = prt.PoseRefiner(model, K=K, width=W, height=H, chunk_iters=64, **cfg)
    refiner.set_scene_depth(scene_depth)
    refined, res = refiner.refine(poses_j); sync((refined,))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        refined, res = refiner.refine(poses_j); sync((refined, res.fitness))
        ts.append(time.perf_counter() - t0)
    wall = sorted(ts)[2]
    refined = np.asarray(refined)
    rot = rotation_angle_deg(refined, truth); rec = rot < 3.0
    if base_ok is None: base_ok = rec
    adds = add_error(refined, truth, model.vertices)
    print(f"{name}: wall {wall*1000:6.1f} ms ({N/wall:5.0f}/s) | rec {rec.mean()*100:3.0f}% | "
          f"agree {(rec==base_ok).mean()*100:3.0f}% | ADD(rec) mean {adds[rec].mean():.3f} "
          f"max {adds[rec].max():.3f} mm", flush=True)
