"""Stage split of the CURRENT production pipeline (r3 end state).

Times each stage as its own dispatch (each carries ~28-30 ms tunnel
overhead - subtract the measured null-dispatch; standalone stages ALSO
re-ship jit closure constants, so the fused total is the truth).
Production config: render_scale=2, decimate_mm=4 (tile32 per the bbox
rule), window 128 / stride 2, top_k 2048, 25 fused ICP iters
(max_iteration=24 per iter_budget_study).

Run: python scripts/profile_prod_r3.py   (TPU)
"""
import sys

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from _workload import scene_render, setup, time_median

import pose_refine_tpu as prt
from pose_refine_tpu import icp
from pose_refine_tpu.ops.depth_to_cloud import compact_topk, window_cloud_batched
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas

N = 256
model, tris_full, K, proj, truth, poses_np = setup(N)
scene_depth = scene_render(tris_full, truth, proj)
poses = jax.device_put(jnp.asarray(poses_np))

CRIT = icp.ICPConvergenceCriteria(max_iteration=24)
refiner = prt.PoseRefiner(model, K=K, width=640, height=480, render_scale=2,
                          window=128, stride=2, max_points=2048,
                          decimate_mm=4.0)
refiner.set_scene_depth(scene_depth)
tris = refiner.tris
scene = refiner.scene
roi = refiner.roi
K2 = jnp.asarray(refiner.K_render)
proj2 = refiner.proj
rw, rh = refiner.render_w, refiner.render_h


def timeit(name, fn, *args):
    wall, out = time_median(lambda: fn(*args))
    print(f"{name:34s} {wall*1000:7.1f} ms", flush=True)
    return out


timeit("null dispatch (1-elem add)", jax.jit(lambda x: x + 1), jnp.zeros(()))
depth = timeit("render 256 (4mm decim, rs=2, roi)",
               jax.jit(lambda t, p: rasterize_pallas(t, p, rw, rh, proj2, roi=roi)),
               tris, poses)


@jax.jit
def lift(d):
    clouds, valids, _ = window_cloud_batched(d, K2, window=128, stride=2,
                                             tl_x=roi[0], tl_y=roi[1])
    return jax.vmap(lambda p, v: compact_topk(p, v, 2048))(clouds, valids)


clouds, valids, _n = timeit("window lift + top_k 2048", lift, depth)


@jax.jit
def run_icp(c, v):
    return icp.icp_point_to_plane_batch(c, v, scene, CRIT, chunk_iters=25)


timeit("ICP 25 fused iters (2048 pts)", run_icp, clouds, valids)
wall, _ = time_median(lambda: refiner.refine(poses, criteria=CRIT))
print(f"{'FUSED total (the truth)':34s} {wall*1000:7.1f} ms  ({N/wall:.0f} poses/s)",
      flush=True)
