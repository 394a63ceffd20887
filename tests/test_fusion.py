"""SE(3) pose fusion filter (utils/fusion.py, beyond parity).

Anchors are analytic: the exp/log maps check against their defining series
and each other; the filter checks against scalar-Kalman closed forms
(variance 1/N shrink, per-axis weighting) that 6x6 block structure must
reproduce.
"""

import numpy as np
import pytest

from pose_refine_tpu import geometry
from pose_refine_tpu import icp as icp_mod
from pose_refine_tpu.utils import fusion
from pose_refine_tpu.utils.fusion import PoseTracker, se3_exp, se3_log


def test_se3_exp_log_roundtrip(rng):
    for _ in range(20):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        # log inverts exp only below pi - sample angles up to 3.0 rad
        w = axis * rng.uniform(0.0, 3.0)
        xi = np.concatenate([w, rng.uniform(-1.0, 1.0, 3)])
        np.testing.assert_allclose(se3_log(se3_exp(xi)), xi, atol=1e-9)
    # small-angle branch
    xi = np.array([1e-9, -2e-9, 1e-9, 0.01, -0.02, 0.03])
    np.testing.assert_allclose(se3_log(se3_exp(xi)), xi, atol=1e-12)


def test_se3_exp_is_rigid_and_matches_euler_to_first_order(rng):
    xi = np.array([0.01, -0.02, 0.015, 0.003, 0.001, -0.002])
    T = se3_exp(xi)
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(R) - 1.0) < 1e-12
    # agrees with the solver's Euler composition to second order
    T_euler = np.asarray(geometry.twist_to_mat4(xi.astype(np.float32)))
    np.testing.assert_allclose(T, T_euler, atol=5e-4)


def test_se3_log_rejects_pi_rotation():
    T = np.eye(4)
    T[:3, :3] = np.diag([1.0, -1.0, -1.0])  # 180 deg about x
    with pytest.raises(ValueError, match="180"):
        se3_log(T)


def _random_pose_mm(rng):
    w = rng.uniform(-0.5, 0.5, 3)
    T = se3_exp(np.concatenate([w, np.zeros(3)]))
    T[:3, 3] = rng.uniform(-50, 50, 3) + np.array([0, 0, 300.0])
    return T.astype(np.float32)


def test_static_fusion_variance_shrinks_as_1_over_n(rng):
    """With Q=0 and identical R the filter is a running average: after N
    updates P == R/N (exact for the linear error-state; tiny curvature
    slack allowed) and the pose error beats a single measurement."""
    truth = _random_pose_mm(rng)
    std_rot, std_t = np.radians(1.0), 0.004
    R = np.diag([std_rot**2] * 3 + [std_t**2] * 3)
    tracker = PoseTracker(truth, init_cov=R, process_noise=np.zeros((6, 6)))
    # init at the truth + one measurement-noise draw, like a first frame
    n_meas = 15
    errs = []
    for _ in range(n_meas):
        xi = np.concatenate(
            [rng.normal(0, std_rot, 3), rng.normal(0, std_t, 3)]
        )
        meas = (se3_exp(xi) @ tracker._to_m(truth))
        meas[:3, 3] *= 1000.0
        errs.append(np.linalg.norm(xi))
        assert tracker.update(meas.astype(np.float32), R)
    expect_P = R / (n_meas + 1)  # prior counts as one measurement
    np.testing.assert_allclose(tracker.P, expect_P, rtol=0.05)
    fused_err = np.linalg.norm(
        se3_log(tracker._to_m(tracker.pose_mm) @ np.linalg.inv(tracker._to_m(truth)))
    )
    assert fused_err < np.mean(errs) * 0.6


def test_anisotropic_measurement_weights_per_axis(rng):
    """A measurement that is tight in translation but useless in rotation
    must update translation variance only - the 6x6 filter reduces to
    independent scalar Kalman updates for diagonal matrices."""
    truth = _random_pose_mm(rng)
    P0 = np.diag([np.radians(5.0) ** 2] * 3 + [0.02**2] * 3)
    R = np.diag([1e6] * 3 + [0.001**2] * 3)  # rotation-blind, mm-tight
    tracker = PoseTracker(truth, init_cov=P0, process_noise=np.zeros((6, 6)))
    assert tracker.update(truth, R, gate_chi2=None)
    # translation variance collapses to ~R_t (prior 20 mm >> meas 1 mm)
    assert np.all(np.diag(tracker.P)[3:] < 1.1 * 0.001**2)
    # rotation variance keeps the prior (measurement carries no info)
    np.testing.assert_allclose(
        np.diag(tracker.P)[:3], np.diag(P0)[:3], rtol=1e-3
    )


def test_innovation_gate_rejects_wrong_basin(rng):
    truth = _random_pose_mm(rng)
    R = np.diag([np.radians(0.5) ** 2] * 3 + [0.002**2] * 3)
    tracker = PoseTracker(truth, init_cov=R, process_noise=np.zeros((6, 6)))
    # an ICP that latched 30 degrees off
    bad = se3_exp(np.array([0.5, 0.0, 0.2, 0.05, 0.0, 0.0])) @ tracker._to_m(truth)
    bad[:3, 3] *= 1000.0
    before = tracker.pose_mm.copy()
    assert not tracker.update(bad.astype(np.float32), R)
    assert tracker.n_rejected == 1
    np.testing.assert_array_equal(tracker.pose_mm, before)
    # a sane measurement still fuses
    assert tracker.update(truth, R)


def test_predict_grows_uncertainty_and_applies_motion(rng):
    truth = _random_pose_mm(rng)
    tracker = PoseTracker(
        truth, process_noise=(np.radians(2.0), 0.01)
    )
    P0 = tracker.P.copy()
    tracker.predict()
    np.testing.assert_allclose(
        np.diag(tracker.P - P0),
        [np.radians(2.0) ** 2] * 3 + [0.01**2] * 3,
        rtol=1e-9,
    )
    # external motion increment: pure +z 10 mm camera-frame shift
    shift = np.eye(4, dtype=np.float32)
    shift[2, 3] = 10.0
    before = tracker.pose_mm.copy()
    tracker.predict(T_motion_mm=shift)
    np.testing.assert_allclose(
        tracker.pose_mm[:3, 3], before[:3, 3] + [0, 0, 10.0], atol=1e-3
    )


def test_hypotheses_sampling(rng):
    truth = _random_pose_mm(rng)
    tracker = PoseTracker(truth)
    hyp = tracker.hypotheses(8, seed=0)
    assert hyp.shape == (8, 4, 4)
    np.testing.assert_allclose(hyp[0], truth, atol=1e-3)
    # spread tracks the belief: wider P -> wider samples
    spread1 = np.std(hyp[1:, :3, 3], axis=0).mean()
    tracker.P *= 25.0
    hyp2 = tracker.hypotheses(8, seed=0)
    spread2 = np.std(hyp2[1:, :3, 3], axis=0).mean()
    assert spread2 > 3.0 * spread1
    # rotations stay valid
    for T in hyp2:
        R = T[:3, :3].astype(np.float64)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_fusion_consumes_pose_covariance(rng):
    """End-to-end with the uncertainty API: refine a synthetic cloud, take
    pose_information -> pose_covariance as the measurement noise, fuse.
    The fused pose must stay at the refined optimum and the filter
    variance must not exceed the measurement's."""
    pts = rng.uniform(-0.1, 0.1, size=(512, 3)).astype(np.float32)
    pts[:, 2] += 0.5
    normals = rng.normal(size=(512, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    truth_xi = np.array([0.02, -0.01, 0.03, 0.01, -0.015, 0.01], np.float32)
    truth = np.asarray(geometry.twist_to_mat4(truth_xi))
    target = (pts @ truth[:3, :3].T + truth[:3, 3]).astype(np.float32)
    target += rng.normal(0, 5e-4, target.shape).astype(np.float32)

    import jax.numpy as jnp

    def query(src):
        return jnp.asarray(target), jnp.asarray(normals), jnp.ones(len(src), bool)

    valid = np.ones(len(pts), bool)
    result, moved = icp_mod.icp_point_to_plane(
        pts, valid, query, icp_mod.ICPConvergenceCriteria(max_iteration=40)
    )
    info, s2, _cnt = icp_mod.pose_information(moved, valid, query)
    R = np.asarray(icp_mod.pose_covariance(info, s2), np.float64)

    meas_mm = np.asarray(result.transformation).copy()
    meas_mm[:3, 3] *= 1000.0
    tracker = PoseTracker(meas_mm, init_cov=4.0 * R,
                          process_noise=np.zeros((6, 6)))
    assert tracker.update(meas_mm, R)
    # fused stays at the optimum; posterior tighter than the measurement
    np.testing.assert_allclose(tracker.pose_mm, meas_mm, atol=1e-3)
    assert np.trace(tracker.P) < np.trace(R)
