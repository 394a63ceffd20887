"""Chunk-prune-rate effect of anchored parking in from_depth_device scenes.

SceneNN.from_depth_device parks a mixed chunk's invalid pixels at the
chunk's first valid point (round 5; previously at a shared 1e6 m far
point). A single far row blows that chunk's bbox/ball to 1e6 m, making it
unprunable on the high side of the gated kernel's tile-bound test - on
hole-y frames (every real depth camera) most Morton grid chunks are mixed,
so the far park largely disabled the pruning for track() NN scenes.

This study replays the kernel's exact prune geometry (scripts/
nn_prune_rate.py machinery) on device-built scenes from the bench frame at
several hole rates, comparing the shipped ANCHORED parking against the old
FAR parking (emulated here from the same frame). Pure numpy, CPU-only.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/device_scene_prune_study.py [smoke]
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
import jax.numpy as jnp

import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from scripts.nn_prune_rate import GATE, S_CHUNK, analyze


def main():
    smoke = "smoke" in sys.argv[1:]
    W, H = (160, 120) if smoke else (640, 480)
    K = geometry.LINEMOD_K.copy()
    if smoke:
        K[:2] *= 0.25
    model = (mesh.make_bumpy_sphere(radius=50.0, subdivisions=3)
             if smoke else mesh.load_benchmark_model())
    R_ren = np.array([[0.34768538, 0.93761126, 0.0],
                      [0.70540612, -0.26157897, -0.65877056],
                      [-0.61767070, 0.22904489, -0.75234390]], np.float32)
    truth = np.asarray(geometry.pose_from_Rt(
        R_ren, np.array([0, 0, 300], np.float32)))
    r = prt.PoseRenderer(model, K=K, width=W, height=H, backend="dense")
    depth = np.asarray(r.render_depth(truth))[0].astype(np.int32)

    # query clouds: jittered hypothesis lifts, like the tracking loop's
    rng = np.random.default_rng(0)
    n_poses = 2 if smoke else 8
    queries = []
    for _ in range(n_poses):
        d_rot = np.asarray(geometry.euler_to_rotation(
            rng.uniform(-0.17, 0.17, 3).astype(np.float32)))
        p = np.asarray(geometry.pose_from_Rt(
            d_rot @ truth[:3, :3],
            truth[:3, 3] + rng.uniform(-20, 20, 3).astype(np.float32)))
        dq = np.asarray(r.render_depth(p))[0].astype(np.int32)
        from pose_refine_tpu.scene.nn import SceneNN
        s = SceneNN.from_depth_device(dq, K)
        pts = np.asarray(s.points)
        pts = pts[(np.abs(pts) < 1.0e5).all(axis=1)]
        queries.append(pts[: (2048 if not smoke else 512)])

    from pose_refine_tpu.scene.nn import SceneNN

    # hole rates: the bench frame is object-only (background == invalid),
    # plus synthetic dropout to model sensor holes ON the object
    for dropout in (0.0, 0.2, 0.4):
        d = depth.copy()
        if dropout:
            d = d * (rng.random(d.shape) > dropout).astype(np.int32)
        scene = SceneNN.from_depth_device(d, K)
        pts = np.asarray(scene.points)
        mixed = None
        for tag, sc in (("anchored", pts), ("far-park", None)):
            if sc is None:
                # emulate the old behavior: same grid rows, far-filled
                from pose_refine_tpu.ops.depth_to_cloud import (
                    depth_image_to_points)
                from pose_refine_tpu.ops.normals import estimate_normals
                from pose_refine_tpu.scene.nn import _grid_morton_perm
                p_img, m_img = depth_image_to_points(jnp.asarray(d), K)
                perm = np.asarray(_grid_morton_perm(*m_img.shape))
                p_flat = np.asarray(p_img).reshape(-1, 3)[perm]
                m_flat = np.asarray(m_img).reshape(-1)[perm]
                sc = np.where(m_flat[:, None], p_flat, 1.0e6).astype(
                    np.float32)
            valid_frac = float(
                ((np.abs(sc) < 1.0e5).all(axis=1)).mean())
            nc = len(sc) // S_CHUNK
            ch = sc[: nc * S_CHUNK].reshape(nc, S_CHUNK, 3)
            near = (np.abs(ch) < 1.0e5).all(axis=2)
            mixed = float((near.any(axis=1) & ~near.all(axis=1)).mean())
            print(f"dropout {dropout:.1f} [{tag}]: rows {len(sc)} "
                  f"(valid {valid_frac * 100:.0f}%), mixed chunks "
                  f"{mixed * 100:.0f}%")
            analyze(queries, sc, tile_sizes=(512,),
                    ball_sizes=(32,), tag=f"drop{dropout:.1f}-{tag}")
    print("done")


if __name__ == "__main__":
    main()
