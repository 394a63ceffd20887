import jax
import numpy as np
import pytest

import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.parallel import make_mesh, refine_poses_sharded, shard_pose_batch
from tests.test_icp import reference_demo_poses

W, H = 160, 120


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh


def test_sharded_refine_matches_single_device():
    K = geometry.LINEMOD_K.copy()
    K[:2] *= 0.25
    m = mesh.make_bumpy_sphere(radius=50.0, subdivisions=3)
    pose1, pose2, _ = reference_demo_poses()

    r = prt.PoseRenderer(m, K=K, width=W, height=H, backend="dense")
    scene_depth = np.asarray(r.render_depth(pose2))[0].astype(np.int32)
    scene = prt.SceneProjective.from_depth(scene_depth, K)

    # 8 hypotheses (one per device): jittered copies of pose1
    rng = np.random.default_rng(5)
    poses = []
    for i in range(8):
        d = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.05, 0.05, 3).astype(np.float32)))
        poses.append(np.asarray(geometry.pose_from_Rt(d @ pose1[:3, :3], pose1[:3, 3])))
    poses = np.stack(poses)

    tris = m.tris[mesh.morton_order(m.tris)]
    proj = geometry.compute_proj(K, W, H)

    dev_mesh = make_mesh()
    refined_sh, res_sh = refine_poses_sharded(
        tris, poses, scene, proj, K, W, H, max_points=4096, mesh=dev_mesh
    )
    # the result is actually sharded over the pose axis
    assert len(refined_sh.sharding.device_set) == 8

    from pose_refine_tpu.pipeline import refine_poses_jit
    import pose_refine_tpu.icp as icp_mod

    refined_1, res_1 = refine_poses_jit(
        tris, poses, scene, proj, K, W, H, 4096, icp_mod.ICPConvergenceCriteria(), False
    )
    np.testing.assert_allclose(
        np.asarray(refined_sh), np.asarray(refined_1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.fitness), np.asarray(res_1.fitness), atol=1e-5
    )


def test_shard_pose_batch_layout():
    dev_mesh = make_mesh()
    poses = np.tile(np.eye(4, dtype=np.float32), (16, 1, 1))
    sharded = shard_pose_batch(dev_mesh, poses)
    assert sharded.shape == (16, 4, 4)
    assert len(sharded.sharding.device_set) == 8


def test_sharded_per_pose_tris():
    """Multi-model batches (per-pose (N, T, 3, 3) triangle tables) shard
    with their poses over the mesh and match the single-device result."""
    K = geometry.LINEMOD_K.copy()
    K[:2] *= 0.25
    m1 = mesh.make_bumpy_sphere(radius=50.0, subdivisions=3)
    m2 = mesh.make_bumpy_sphere(radius=40.0, subdivisions=3)
    pose1, pose2, _ = reference_demo_poses()

    r = prt.PoseRenderer(m1, K=K, width=W, height=H, backend="dense")
    scene_depth = np.asarray(r.render_depth(pose2))[0].astype(np.int32)
    scene = prt.SceneProjective.from_depth(scene_depth, K)

    rng = np.random.default_rng(6)
    poses = []
    for i in range(8):
        d = np.asarray(geometry.euler_to_rotation(
            rng.uniform(-0.05, 0.05, 3).astype(np.float32)))
        poses.append(np.asarray(geometry.pose_from_Rt(d @ pose1[:3, :3], pose1[:3, 3])))
    poses = np.stack(poses)

    t1 = m1.tris[mesh.morton_order(m1.tris)]
    t2 = m2.tris[mesh.morton_order(m2.tris)]
    assert t1.shape == t2.shape
    tris_pp = np.stack([t1, t2, t1, t2, t1, t2, t1, t2])  # (8, T, 3, 3)
    proj = geometry.compute_proj(K, W, H)

    dev_mesh = make_mesh()
    refined_sh, res_sh = refine_poses_sharded(
        tris_pp, poses, scene, proj, K, W, H, max_points=4096, mesh=dev_mesh
    )
    assert len(refined_sh.sharding.device_set) == 8

    from pose_refine_tpu.pipeline import refine_poses_jit
    import pose_refine_tpu.icp as icp_mod

    refined_1, res_1 = refine_poses_jit(
        tris_pp, poses, scene, proj, K, W, H, 4096,
        icp_mod.ICPConvergenceCriteria(), False,
    )
    np.testing.assert_allclose(np.asarray(refined_sh), np.asarray(refined_1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_sh.fitness), np.asarray(res_1.fitness), atol=1e-5)
