"""Uncontended same-host C++ reference-baseline throughput (best-of-3).

Run WITHOUT TPU work in the process: the axon tunnel client contends for
this host's single core and inflates in-bench CPU timings 3-20x. Forces
the CPU backend so the jitted scene render does not touch the chip.

Poses are bench's first 16 cases (same 256-draw then slice, so the subset
matches bench.py's verdict-agreement cases exactly).
"""
import time

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from _workload import setup

from pose_refine_tpu import native
from pose_refine_tpu.ops.depth_to_cloud import depth_to_cloud
import pose_refine_tpu.ops.rasterize as rz
from pose_refine_tpu.scene.projective import SceneProjective

N_SUB = 16
model, tris, K, proj, truth, poses = setup(256)
poses = poses[:N_SUB]
import jax.numpy as jnp

scene_depth = np.asarray(rz.rasterize_scatter(tris, jnp.asarray(truth)[None], 640, 480, proj))[0]
scene = SceneProjective.from_depth(scene_depth, K)
print("threads:", native.cpu_threads())

best_r = best_i = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    dep = native.cpu_render_baseline(np.asarray(tris), poses, np.asarray(proj), 640, 480)
    best_r = min(best_r, time.perf_counter() - t0)
clouds, valids = [], []
for i in range(N_SUB):
    c, v, _ = depth_to_cloud(dep[i], K, max_points=32768)
    clouds.append(np.asarray(c))
    valids.append(np.asarray(v))
for _ in range(3):
    t0 = time.perf_counter()
    T, _, _ = native.cpu_icp_baseline(np.stack(clouds), np.stack(valids),
                                      np.asarray(scene.pcd), np.asarray(scene.normal), K)
    best_i = min(best_i, time.perf_counter() - t0)
pp = (best_r + best_i) / N_SUB
print(f"uncontended CPU baseline: render {best_r/N_SUB*1000:.1f} ms + icp "
      f"{best_i/N_SUB*1000:.1f} ms per pose = {1/pp:.1f} poses/sec")
