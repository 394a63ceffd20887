"""Correspondence-reuse study: re-associate every k-th ICP iteration.

The association gather is the row-count-bound cost of an iteration
(~200M rows/s, PERF_NOTES); the reduction/solve are matmul-cheap. k > 1
queries the scene every k-th iteration and rebuilds the normal equations
from the cached correspondences as the cloud moves between queries -
textbook correspondence reuse, exposed as PoseRefiner(reassociate_every=k)
(k=1 = the reference's every-iteration semantics).

Pick k dividing max_iteration (24) so the final scoring pass re-associates
fresh. Gates as always: fixed-seed per-case verdicts vs k=1, ADD, per-pose
drift vs the k=1 twin.

Run: python scripts/reassoc_study.py
BLOCKED ON TPU: the k > 1 nested-loop program HUNG the axon remote XLA
compile twice (chip wedged ~75 min each; see PERF_NOTES "Correspondence
reuse"). Until the toolchain moves, k > 1 is guarded off non-CPU backends
below - run the quality sweep on CPU (slow but safe), or re-enable the
guard deliberately on a future toolchain.
"""
import sys

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from _workload import scene_render, setup, time_median

import pose_refine_tpu as prt
from pose_refine_tpu.icp import ICPConvergenceCriteria
from pose_refine_tpu.utils.metrics import add_error, rotation_angle_deg

N = 256
model, tris, K, proj, truth, poses = setup(N)
scene_depth = scene_render(tris, truth, proj)
poses_j = jax.device_put(jnp.asarray(poses))
CRIT = ICPConvergenceCriteria(max_iteration=24)

ks = (1, 2, 3, 4)
if jax.default_backend() != "cpu":
    print("non-CPU backend: skipping k>1 (its compile wedges the axon "
          "toolchain - see module docstring)", flush=True)
    ks = (1,)

base_ok = None
base_T = None
for k in ks:
    refiner = prt.PoseRefiner(model, K=K, width=640, height=480,
                              render_scale=2, window=128, stride=2,
                              max_points=2048, decimate_mm=4.0,
                              reassociate_every=k)
    refiner.set_scene_depth(scene_depth)
    wall, (refined, res) = time_median(
        lambda: refiner.refine(poses_j, criteria=CRIT))
    refined = np.asarray(refined)
    rot = rotation_angle_deg(refined, truth)
    rec = rot < 3.0
    adds = add_error(refined, truth, model.vertices)
    if base_ok is None:
        base_ok, base_T = rec, refined
    drift = np.array([
        add_error(refined[i][None], base_T[i], model.vertices)[0]
        for i in range(N)
    ])
    flips = np.nonzero(rec != base_ok)[0]
    flip_txt = "" if not len(flips) else (
        " | flips: " + ", ".join(
            f"{i}({'RECOVERS' if rec[i] else 'FAILS'})" for i in flips))
    print(f"reassoc k={k}: wall {wall*1e3:6.1f} ms ({N/wall:5.0f}/s) | "
          f"recovered {rec.mean()*100:3.0f}% | verdicts {(rec==base_ok).mean()*100:5.1f}% | "
          f"ADD(rec) mean {adds[rec].mean():.3f} max {adds[rec].max():.3f} mm | "
          f"drift-vs-k1(rec) max {drift[rec].max():.3f} mm{flip_txt}", flush=True)
