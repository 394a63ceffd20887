"""Point-to-point ICP estimation (beyond parity).

The reference implements only point-to-plane and cross-checks against Open3D
(test.cpp:96-126), whose other estimator is point-to-point. Anchors here are
INDEPENDENT of this repo's code: the Kabsch/Umeyama closed-form alignment
(plain numpy SVD, re-derived inline) gives the exact optimum for
known-correspondence point-to-point registration.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu import icp as icp_mod
import pose_refine_tpu.ops.rasterize as R
from pose_refine_tpu.ops.depth_to_cloud import depth_to_cloud
from tests.test_icp import reference_demo_poses

W, H = 160, 120


def _kabsch(src, dst):
    """Closed-form rigid alignment minimizing sum |R p + t - q|^2 (Kabsch /
    Umeyama, textbook SVD form - independent of the library under test)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    Hm = (src - mu_s).T @ (dst - mu_d)
    U, _S, Vt = np.linalg.svd(Hm)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    Rm = Vt.T @ D @ U.T
    t = mu_d - Rm @ mu_s
    T = np.eye(4, dtype=np.float64)
    T[:3, :3], T[:3, 3] = Rm, t
    return T


def _fixed_correspondence_query(target, normals=None):
    """query_fn with correspondences fixed by index (dst independent of the
    moving cloud) - makes the GN problem exactly the Kabsch problem."""
    tgt = jnp.asarray(target, jnp.float32)
    nrm = (
        jnp.asarray(normals, jnp.float32)
        if normals is not None
        else jnp.ones_like(tgt) / np.sqrt(3.0)
    )

    def query(src):
        return tgt, nrm, jnp.ones(src.shape[0], bool)

    return query


def test_p2p_matches_kabsch_closed_form(rng):
    """Exact-correspondence p2p ICP must land on the Kabsch optimum."""
    pts = rng.uniform(-0.1, 0.1, size=(400, 3)).astype(np.float32)
    pts[:, 2] += 0.5
    truth = np.asarray(
        geometry.twist_to_mat4(
            np.array([0.05, -0.03, 0.06, 0.012, -0.02, 0.017], np.float32)
        )
    )
    target = (pts @ truth[:3, :3].T + truth[:3, 3]).astype(np.float32)

    result, _cloud = icp_mod.icp_point_to_point(
        pts,
        np.ones(len(pts), bool),
        _fixed_correspondence_query(target),
        icp_mod.ICPConvergenceCriteria(max_iteration=50),
    )
    T = np.asarray(result.transformation, np.float64)
    T_kabsch = _kabsch(pts.astype(np.float64), target.astype(np.float64))

    # rotation agreement (degrees) and translation agreement (meters)
    R_err = T[:3, :3] @ T_kabsch[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang < 0.02, f"rotation off Kabsch by {ang} deg"
    np.testing.assert_allclose(T[:3, 3], T_kabsch[:3, 3], atol=5e-5)
    assert float(result.fitness) == 1.0
    assert float(result.inlier_rmse) < 1e-4


def test_p2p_ignores_scene_normals(rng):
    """The estimator must be bitwise independent of the normals the scene
    returns (they only matter to the association gate, which is the scene's
    business)."""
    pts = rng.uniform(-0.1, 0.1, size=(256, 3)).astype(np.float32)
    pts[:, 2] += 0.4
    truth = np.asarray(
        geometry.twist_to_mat4(np.array([0.02, 0.01, -0.03, 0.01, 0.0, -0.01], np.float32))
    )
    target = (pts @ truth[:3, :3].T + truth[:3, 3]).astype(np.float32)
    good_n = rng.normal(size=(256, 3)).astype(np.float32)
    good_n /= np.linalg.norm(good_n, axis=1, keepdims=True)
    garbage_n = np.full((256, 3), 7.25, np.float32)  # not even unit length

    valid = np.ones(len(pts), bool)
    crit = icp_mod.ICPConvergenceCriteria(max_iteration=20)
    r1, c1 = icp_mod.icp_point_to_point(
        pts, valid, _fixed_correspondence_query(target, good_n), crit
    )
    r2, c2 = icp_mod.icp_point_to_point(
        pts, valid, _fixed_correspondence_query(target, garbage_n), crit
    )
    np.testing.assert_array_equal(
        np.asarray(r1.transformation), np.asarray(r2.transformation)
    )
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    # ... and point-to-plane with those garbage normals would NOT recover
    r3, _ = icp_mod.icp_point_to_plane(
        pts, valid, _fixed_correspondence_query(target, garbage_n), crit
    )
    err_p2p = np.abs(np.asarray(r1.transformation) - truth).max()
    err_p2l = np.abs(np.asarray(r3.transformation) - truth).max()
    assert err_p2p < 1e-3
    assert err_p2l > 10 * err_p2p


@pytest.mark.slow
def test_p2p_golden_recovery_nn_obj06():
    """The reference acceptance recipe (test.cpp:29-44) driven by the p2p
    estimator with NEAREST-NEIGHBOR association on the real obj_06 asset:
    recover 10 deg/axis + 20 mm to sub-degree accuracy.

    Two deliberate workload choices, both textbook p2p behavior (measured
    in this repo): (a) NN association, because projective association
    yields ray-aligned residuals on which p2p diverges (see
    icp_point_to_point docstring); (b) an asymmetric object, because p2p
    has no tangential grip - on near-rotationally-symmetric meshes (e.g.
    the bumpy sphere) it slides into an off-axis equilibrium that
    point-to-plane's normals would forbid. Tighter criteria than the
    default: p2p's slow tail otherwise trips the dRMSE<1e-5 latch early."""
    path = mesh.find_reference_ply()
    if path is None:
        pytest.skip("reference obj_06.ply not mounted")
    m = mesh.simplify_vertex_clustering(
        mesh.Model.load(path, verbose=False), 4.0
    )
    wide, high = 320, 240
    K = geometry.LINEMOD_K.copy()
    K[:2] *= 0.5
    proj = geometry.compute_proj(K, wide, high)
    pose1, pose2, ang = reference_demo_poses()

    depth = np.asarray(
        R.rasterize_dense(m.tris, np.stack([pose1, pose2]), wide, high, proj)
    )
    cloud, valid, _n = depth_to_cloud(depth[0], K, max_points=16384)
    from pose_refine_tpu.scene.nn import SceneNN

    scene = SceneNN.from_depth(depth[1], K)
    result, _cloud = icp_mod.icp_point_to_point(
        cloud, valid, scene.query,
        icp_mod.ICPConvergenceCriteria(1e-6, 1e-7, 120),
        chunk_iters=121,
    )
    T = np.asarray(result.transformation)
    euler = np.asarray(geometry.rotation_to_euler(T[:3, :3]))
    err_deg = np.abs(euler - ang) / np.pi * 180.0
    assert (err_deg < 0.7).all(), f"per-axis angle error {err_deg} deg"
    assert float(result.fitness) > 0.9
    assert float(result.inlier_rmse) < 0.002


def test_p2p_chunked_matches_fused(rng):
    pts = rng.uniform(-0.08, 0.08, size=(300, 3)).astype(np.float32)
    pts[:, 2] += 0.45
    truth = np.asarray(
        geometry.twist_to_mat4(np.array([0.03, 0.0, -0.02, 0.008, 0.01, 0.0], np.float32))
    )
    target = (pts @ truth[:3, :3].T + truth[:3, 3]).astype(np.float32)
    q = _fixed_correspondence_query(target)
    valid = np.ones(len(pts), bool)
    crit = icp_mod.ICPConvergenceCriteria(max_iteration=25)

    r_fused, c_fused = icp_mod.icp_point_to_point(pts, valid, q, crit, chunk_iters=26)
    r_chunk, c_chunk = icp_mod.icp_point_to_point(pts, valid, q, crit, chunk_iters=4)
    np.testing.assert_allclose(
        np.asarray(r_fused.transformation), np.asarray(r_chunk.transformation),
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(c_fused), np.asarray(c_chunk), atol=1e-6)


def test_p2p_robust_delta_downweights_outliers(rng):
    """A gross outlier correspondence shifts the plain LS solution; Huber
    weighting on the residual norm bounds its influence."""
    pts = rng.uniform(-0.1, 0.1, size=(200, 3)).astype(np.float32)
    pts[:, 2] += 0.5
    target = pts.copy()
    target[:, 0] += 0.01  # truth: 10 mm x-shift
    target[0] += np.array([0.0, 0.5, 0.0], np.float32)  # one 0.5 m outlier

    q = _fixed_correspondence_query(target)
    valid = np.ones(len(pts), bool)
    crit = icp_mod.ICPConvergenceCriteria(max_iteration=30)
    r_plain, _ = icp_mod.icp_point_to_point(pts, valid, q, crit)
    r_rob, _ = icp_mod.icp_point_to_point(pts, valid, q, crit, robust_delta=0.02)

    t_plain = np.asarray(r_plain.transformation)[:3, 3]
    t_rob = np.asarray(r_rob.transformation)[:3, 3]
    expect = np.array([0.01, 0.0, 0.0])
    assert np.linalg.norm(t_rob - expect) < 0.2 * np.linalg.norm(t_plain - expect)
    np.testing.assert_allclose(t_rob, expect, atol=5e-4)


def test_p2p_pose_information_translation_block(rng):
    """Analytic property of the p2p information matrix: with unit weights
    the translation block of J^T J is exactly count * I3."""
    pts = rng.uniform(-0.1, 0.1, size=(128, 3)).astype(np.float32)
    pts[:, 2] += 0.5
    q = _fixed_correspondence_query(pts)  # residuals zero
    info, sigma2, count = icp_mod.pose_information(
        pts, np.ones(len(pts), bool), q, estimation="point_to_point"
    )
    info = np.asarray(info)
    np.testing.assert_allclose(
        info[3:, 3:], float(count) * np.eye(3), rtol=1e-5
    )
    assert float(sigma2) < 1e-10
    # cross block = sum of -[p]x (skew-symmetric) - its transpose is its
    # negative
    np.testing.assert_allclose(info[3:, :3], -info[3:, :3].T, atol=1e-4)


@pytest.mark.slow
def test_refiner_estimation_kwarg():
    """PoseRefiner(estimation='point_to_point', scene='nn_bruteforce')
    end-to-end on obj_06: recovers the scene pose through the fused
    pipeline (measured 0.53 deg / 0.28 mm)."""
    path = mesh.find_reference_ply()
    if path is None:
        pytest.skip("reference obj_06.ply not mounted")
    m = mesh.Model.load(path, verbose=False)
    wide, high = 320, 240
    K = geometry.LINEMOD_K.copy()
    K[:2] *= 0.5
    pose1, pose2, _ = reference_demo_poses()

    r = prt.PoseRenderer(m, K=K, width=wide, height=high, backend="dense")
    scene_depth = np.asarray(r.render_depth(pose2))[0].astype(np.int32)

    refiner = prt.PoseRefiner(
        m, K=K, width=wide, height=high, max_points=16384, use_pallas=False,
        scene="nn_bruteforce", decimate_mm=4.0, estimation="point_to_point",
    )
    refiner.set_scene_depth(scene_depth)
    refined, results = refiner.refine(
        pose1, criteria=icp_mod.ICPConvergenceCriteria(1e-6, 1e-7, 120)
    )
    R_err = np.asarray(refined)[:3, :3] @ pose2[:3, :3].T
    ang_err = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang_err < 1.5, f"refined rotation off by {ang_err} deg"
    t_err = np.abs(np.asarray(refined)[:3, 3] - pose2[:3, 3]).max()
    assert t_err < 3.0, f"translation off by {t_err} mm"
    assert float(results.fitness) > 0.9


def test_estimation_validation_and_projective_warning(caplog):
    """Bad estimation values are rejected; the ill-posed p2p+projective
    combination warns loudly (it is measured to diverge - see
    icp_point_to_point docstring)."""
    import logging

    K = geometry.LINEMOD_K.copy()
    K[:2] *= 0.25
    m = mesh.make_icosphere(radius=40.0, subdivisions=1)
    with pytest.raises(ValueError, match="estimation"):
        prt.PoseRefiner(m, K=K, width=W, height=H, estimation="icp")

    with caplog.at_level(logging.WARNING, logger="pose_refine_tpu"):
        prt.PoseRefiner(
            m, K=K, width=W, height=H, estimation="point_to_point"
        )  # default scene is projective
    assert any("ill-posed" in rec.message for rec in caplog.records)

    # NN scenes do not warn
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="pose_refine_tpu"):
        prt.PoseRefiner(
            m, K=K, width=W, height=H, scene="nn_bruteforce",
            estimation="point_to_point",
        )
    assert not any("ill-posed" in rec.message for rec in caplog.records)
