"""NN serving loop study: per-frame scene rebuild cost + fused NN tracking.

The reference rebuilds Scene_nn on the host every frame (normals +
compaction + kd build + upload, pcd_scene.cpp:4-37). This measures, on the
real TPU:

  1. the HOST rebuild breakdown (SceneNN.from_depth): fused device
     lift/normals program + one readback, voxel downsample, kd build (native
     C++), flash-table pack + upload - alongside the projective warm
     re-init (~3-10 ms) for comparison;
  2. the FUSED device build (SceneNN.from_depth_device) as used by
     track(): cost of one full tracking step vs the unfused
     set_scene_depth + refine loop, at scene_stride 1/2/3, batch 256,
     with recovery quality.

Run: python scripts/nn_rebuild_study.py   (TPU via the axon env)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402

import pose_refine_tpu as prt  # noqa: E402
from pose_refine_tpu import geometry, mesh  # noqa: E402
from pose_refine_tpu.scene.nn import SceneNN, _depth_scene_arrays  # noqa: E402
from pose_refine_tpu.utils.metrics import rotation_angle_deg  # noqa: E402
from pose_refine_tpu.utils.sync import sync  # noqa: E402

W, H, N = 640, 480, 256
CFG = dict(render_scale=2, max_points=2048, window=128, stride=2, decimate_mm=4.0)


def med(fn, iters=5):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    K = geometry.LINEMOD_K
    proj = geometry.compute_proj(K, W, H)
    model = mesh.load_benchmark_model()
    tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
    R_ren = np.array(
        [[0.34768538, 0.93761126, 0.0],
         [0.70540612, -0.26157897, -0.65877056],
         [-0.61767070, 0.22904489, -0.75234390]], np.float32)
    truth = np.asarray(geometry.pose_from_Rt(R_ren, np.array([0, 0, 300], np.float32)))
    rng = np.random.default_rng(0)
    d_rot = np.asarray(geometry.euler_to_rotation(
        rng.uniform(-0.17, 0.17, (N, 3)).astype(np.float32)))
    d_t = rng.uniform(-20, 20, (N, 3)).astype(np.float32)
    poses = np.asarray(geometry.pose_from_Rt(
        np.einsum("nij,jk->nik", d_rot, truth[:3, :3]), truth[:3, 3] + d_t))
    poses_dev = jax.device_put(jnp.asarray(poses))

    from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
    depth = np.asarray(sync(rasterize_pallas(
        tris, jnp.asarray(truth)[None], W, H, proj)))[0]
    depth_dev = jax.device_put(jnp.asarray(depth))

    # ---- 1. host rebuild breakdown ----
    Kj = jnp.asarray(K, np.float32)
    t_dev = med(lambda: jax.device_get(_depth_scene_arrays(depth_dev, Kj)))
    pts, nrm, mask = jax.device_get(_depth_scene_arrays(depth_dev, Kj))
    m_ = mask.reshape(-1)
    p_ = pts.reshape(-1, 3)[m_]
    n_ = nrm.reshape(-1, 3)[m_]
    from pose_refine_tpu.scene.nn import voxel_downsample
    t_vox = med(lambda: voxel_downsample(p_, n_, 0.002))
    pv, nv = voxel_downsample(p_, n_, 0.002)
    from pose_refine_tpu.scene.kdtree import build_kdtree
    t_kd_raw = med(lambda: build_kdtree(p_, n_))
    t_kd_vox = med(lambda: build_kdtree(pv, nv))
    t_full_raw = med(lambda: SceneNN.from_depth(depth, K, backend="bruteforce"))
    t_full_vox = med(lambda: SceneNN.from_depth(
        depth, K, backend="bruteforce", voxel_mm=2.0))
    print(f"host rebuild: device lift+normals+readback {t_dev*1e3:6.1f} ms", flush=True)
    print(f"              voxel 2mm ({len(p_)} -> {len(pv)} pts) {t_vox*1e3:6.1f} ms", flush=True)
    print(f"              kd build raw {t_kd_raw*1e3:6.1f} ms / voxeled {t_kd_vox*1e3:6.1f} ms", flush=True)
    print(f"              TOTAL from_depth raw {t_full_raw*1e3:6.1f} ms / voxel 2mm {t_full_vox*1e3:6.1f} ms", flush=True)

    # ---- 2. fused device-built NN tracking (cheapest scene first so
    # partial results land even if the stride-1 monster compiles slowly) ----
    for sstride in (3, 2, 1):
        ref = prt.PoseRefiner(model, K=K, width=W, height=H,
                              scene="nn_bruteforce", scene_stride=sstride, **CFG)
        t0 = time.perf_counter()
        tracked, res = ref.track(depth, poses_dev)
        sync((tracked, res.fitness))
        compile_s = time.perf_counter() - t0
        t = med(lambda: sync(ref.track(depth, poses_dev)[0]))
        rot = rotation_angle_deg(np.asarray(tracked), truth)
        print(f"fused NN track scene_stride={sstride}: {t*1e3:7.1f} ms/frame "
              f"({N/t:7.1f} poses/s), recovered<3deg {(rot<3).mean()*100:.0f}%, "
              f"compile {compile_s:.0f}s", flush=True)

    # unfused comparison: rebuild host scene + refine each frame
    for vox, tag in ((2.0, "voxel 2mm"), (0.0, "raw")):
        ref = prt.PoseRefiner(model, K=K, width=W, height=H,
                              scene="nn_bruteforce", scene_voxel_mm=vox, **CFG)

        def frame():
            ref.set_scene_depth(depth)
            r_, res_ = ref.refine(poses_dev)
            sync((r_,))
        t = med(frame, iters=3)
        print(f"unfused NN loop ({tag}): {t*1e3:7.1f} ms/frame ({N/t:7.1f} poses/s)", flush=True)

    # projective fused track for context
    refp = prt.PoseRefiner(model, K=K, width=W, height=H, **CFG)
    tp = med(lambda: sync(refp.track(depth, poses_dev)[0]))
    print(f"projective fused track: {tp*1e3:7.1f} ms/frame ({N/tp:7.1f} poses/s)", flush=True)


if __name__ == "__main__":
    main()
