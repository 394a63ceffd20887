"""NN tile-bound pruning study (VERDICT r3 #8): does the per-query-tile
NN-distance upper bound (nn_pallas._kernel_gated pass 1) lift raw-cloud NN
serving from ~100 to >= 200 poses/s?

Arms:
  kernel-level  - nn_flash_gated with/without use_tile_bound on the bench
                  workload's real query/scene distribution (one pose's
                  lifted cloud vs the raw 26k-pt scene), plus exactness.
  pipeline      - PoseRefiner(scene="nn_bruteforce") refine() at batch 256,
                  raw scene and 2 mm voxel scene (the production configs
                  bench.py reports).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/nn_tile_bound_study.py [smoke]
(smoke pins CPU and shrinks the workload - code-path validation only.)
"""
import sys
import time

import numpy as np

SMOKE = "smoke" in sys.argv[1:]
if SMOKE or "cpu" in sys.argv[1:]:
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.utils.metrics import rotation_angle_deg
from pose_refine_tpu.utils.sync import sync

W, H = (320, 240) if SMOKE else (640, 480)
N_POSES = 8 if SMOKE else 256
INTERP = jax.default_backend() == "cpu"


def _morton_xyz(p, bits=10):
    """Morton codes of quantized xyz (host numpy) - orders the standalone
    query sample the way the production lift orders cloud rows."""
    q = ((p - p.min(0)) / max(np.ptp(p, 0).max(), 1e-9)
         * ((1 << bits) - 1)).astype(np.uint64)
    code = np.zeros(len(p), np.uint64)
    for b in range(bits):
        for a in range(3):
            code |= ((q[:, a] >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + a)
    return code


def main():
    model = mesh.load_benchmark_model()
    K = geometry.LINEMOD_K.copy()
    if SMOKE:
        K[:2] *= 0.5
    proj = geometry.compute_proj(K, W, H)
    R_ren = np.array([[0.34768538, 0.93761126, 0.0],
                      [0.70540612, -0.26157897, -0.65877056],
                      [-0.61767070, 0.22904489, -0.75234390]], np.float32)
    truth = np.asarray(geometry.pose_from_Rt(
        R_ren, np.array([0, 0, 300], np.float32)))
    rng = np.random.default_rng(0)
    d_rot = np.asarray(geometry.euler_to_rotation(
        rng.uniform(-0.17, 0.17, (N_POSES, 3)).astype(np.float32)))
    poses = np.asarray(geometry.pose_from_Rt(
        jnp.einsum("nij,jk->nik", d_rot, truth[:3, :3]),
        truth[:3, 3] + rng.uniform(-20, 20, (N_POSES, 3)).astype(np.float32)))

    use_pallas = jax.default_backend() != "cpu"
    r = prt.PoseRenderer(model, K=K, width=W, height=H,
                         backend="pallas" if use_pallas else "dense")
    scene_depth = np.asarray(r.render_depth(truth))[0].astype(np.int32)

    # ---- kernel-level A/B on the real distribution ----
    # HOST-built scene + lift-shaped queries: no full-frame TPU scatter
    # (depth_to_cloud/compact_points wedged the tunnel on 2026-08-19 -
    # novel standalone compiles are a hazard; stay near production shapes)
    from pose_refine_tpu.ops.depth_to_cloud import window_cloud
    from pose_refine_tpu.scene.nn import SceneNN
    from pose_refine_tpu.scene.nn_pallas import (
        chunk_boxes, nn_flash_gated, nn_flash_packed, pack_scene)

    scene_host = SceneNN.from_depth(scene_depth, K, backend="bruteforce")
    sc = np.asarray(scene_host.points)
    table = pack_scene(jnp.asarray(sc))
    boxes = chunk_boxes(table)
    q_depth = np.asarray(r.render_depth(poses[0]))[0].astype(np.int32)
    qc, qv, _ = window_cloud(jnp.asarray(q_depth), K,
                             window=256 if not SMOKE else 96, stride=2)
    q = np.asarray(qc)[np.asarray(qv)]
    # a few tiles' worth of REAL query distribution (Morton-ordered like
    # the production lift), modest size - huge standalone shapes are novel
    # compiles, and the pipeline arms below measure the production shape
    q = q[np.argsort(_morton_xyz(q))]
    reps = 1 if SMOKE else max(1, 65536 // len(q))
    Q = jnp.asarray(np.tile(q, (reps, 1)))
    print(f"kernel A/B: {Q.shape[0]} queries vs {len(sc)} scene points "
          f"({boxes.shape[0]} chunks)", flush=True)

    def run_kernel(tag, **kw):
        print(f"  compiling {tag}...", flush=True)
        f = lambda: nn_flash_gated(Q, table, boxes, 0.1, interpret=INTERP, **kw)
        out = f(); sync(out)
        t0 = time.perf_counter(); out = f(); sync(out)
        wall = time.perf_counter() - t0
        print(f"  {tag:>14}: {wall*1000:7.2f} ms "
              f"({Q.shape[0]/wall/1e6:6.1f} Mq/s)", flush=True)
        return out

    arms = [("gate-only", dict(use_tile_bound=False))]
    # q_tile x ub_ball sweep (VERDICT r3 #8 follow-up): prune-rate modeling
    # (scripts/nn_prune_rate.py) says smaller tiles + finer pass-1 balls
    # both tighten pruning; this measures where per-tile fixed costs win
    tile_sweep = ((512, 128), (512, 32), (256, 32)) if SMOKE else (
        (512, 128), (512, 32), (256, 128), (256, 32), (128, 32))
    for qt, ub in tile_sweep:
        arms.append((f"bound T{qt}/b{ub}",
                     dict(use_tile_bound=True, q_tile=qt, ub_ball=ub)))
    # sub-tile pruning bands (round 5): small-band prune rates (44-58% at
    # 128 per scripts/nn_prune_rate.py) at big-tile per-grid-step fixed
    # costs - the structure that should beat both T512 (weak pruning) and
    # T128 (4x grid steps) from the round-4 wall-time study
    sub_sweep = ((512, 128, 32),) if SMOKE else (
        (512, 256, 32), (512, 128, 32), (512, 64, 32),
        (512, 128, 16), (1024, 128, 32))
    for qt, st, ub in sub_sweep:
        arms.append((f"sub T{qt}/s{st}/b{ub}",
                     dict(use_tile_bound=True, q_tile=qt, sub_tile=st,
                          ub_ball=ub)))
    outs = [(tag, run_kernel(tag, **kw)) for tag, kw in arms]
    print("  compiling plain reference kernel...", flush=True)
    i_ref, d_ref = nn_flash_packed(Q, table, interpret=INTERP)
    inside = np.asarray(d_ref) < 0.1 * 0.1
    for tag, (ii, dd) in outs:
        ok_i = (np.asarray(ii)[inside] == np.asarray(i_ref)[inside]).all()
        ok_d = (np.asarray(dd)[inside] == np.asarray(d_ref)[inside]).all()
        print(f"  {tag} exact vs plain (in-gate): idx {ok_i} dist {ok_d}")
        assert ok_i and ok_d

    # ---- pipeline-level ----
    CFG = dict(render_scale=2, max_points=2048, window=128, stride=2,
               decimate_mm=4.0) if not SMOKE else dict(
                   max_points=2048, window=96, stride=2)
    from pose_refine_tpu.icp import ICPConvergenceCriteria

    CRIT = ICPConvergenceCriteria(max_iteration=24)
    poses_dev = jax.device_put(jnp.asarray(poses))

    for vox, tag in ((0.0, "raw cloud"), (2.0, "voxel 2mm")):
        print(f"pipeline {tag}: building + compiling...", flush=True)
        ref = prt.PoseRefiner(model, K=K, width=W, height=H,
                              use_pallas=use_pallas, scene="nn_bruteforce",
                              scene_voxel_mm=vox, **CFG)
        ref.set_scene_depth(scene_depth)
        f = lambda: ref.refine(poses_dev, criteria=CRIT)
        out = f(); sync((out[0], out[1].fitness))
        t0 = time.perf_counter(); out = f(); sync((out[0], out[1].fitness))
        wall = time.perf_counter() - t0
        rot = rotation_angle_deg(np.asarray(out[0]), truth)
        print(f"pipeline {tag:>10}: scene {ref.scene.points.shape[0]:6d} pts | "
              f"{N_POSES/wall:6.1f} poses/s ({wall*1000:.0f} ms) | "
              f"recovered {(rot < 3.0).mean()*100:3.0f}%")


if __name__ == "__main__":
    main()
