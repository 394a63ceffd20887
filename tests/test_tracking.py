"""TrackingSession: the productized per-frame loop (predict -> belief
hypotheses -> fused track(with_covariance=True) -> rank -> gated fusion).

Mirrors the reference's acceptance loop shape (test.cpp:29-44: jitter
hypotheses around the last estimate, refine, keep the best) with the
filter layered on top."""

import numpy as np
import pytest

import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from tests.test_icp import reference_demo_poses

W, H = 160, 120


@pytest.fixture(scope="module")
def setup():
    K = geometry.LINEMOD_K.copy()
    K[:2] *= 0.25
    m = mesh.make_bumpy_sphere(radius=50.0, subdivisions=3)
    r = prt.PoseRenderer(m, K=K, width=W, height=H, backend="dense")
    return m, K, r


def _refiner(m, K):
    return prt.PoseRefiner(m, K=K, width=W, height=H, max_points=4096,
                           use_pallas=False, window=64, stride=1)


def _drift(truth, rng, rot=0.02, trans=3.0):
    d = np.asarray(geometry.euler_to_rotation(
        rng.uniform(-rot, rot, 3).astype(np.float32)))
    return np.asarray(geometry.pose_from_Rt(
        d @ truth[:3, :3],
        truth[:3, 3] + rng.uniform(-trans, trans, 3).astype(np.float32)))


def test_session_tracks_drifting_object(setup):
    m, K, r = setup
    _, pose2, _ = reference_demo_poses()
    session = prt.TrackingSession(_refiner(m, K), pose2, n_hypotheses=3,
                                  seed=1)
    rng = np.random.default_rng(7)
    truth = pose2.copy()
    for frame in range(5):
        truth = _drift(truth, rng)
        depth = np.asarray(r.render_depth(truth))[0].astype(np.int32)
        step = session.step(depth)
        assert step.accepted, f"frame {frame}: clean frame rejected"
        assert step.fitness > 0.7
        assert step.refined.shape == (3, 4, 4)
        assert step.covariance.shape == (6, 6)
        t_err = np.abs(step.pose[:3, 3] - truth[:3, 3]).max()
        assert t_err < 6.0, f"frame {frame}: lost track ({t_err} mm)"
    assert session.n_frames == 5 and session.n_rejected == 0
    np.testing.assert_array_equal(session.pose, step.pose)


def test_session_rejects_corrupt_frame(setup):
    """A dropout-corrupted frame must fail the fitness gate and leave the
    estimate at the prediction (random walk: the pre-step pose)."""
    m, K, r = setup
    _, pose2, _ = reference_demo_poses()
    session = prt.TrackingSession(_refiner(m, K), pose2, n_hypotheses=2,
                                  seed=2)
    rng = np.random.default_rng(11)
    truth = pose2.copy()
    depth = np.asarray(r.render_depth(truth))[0].astype(np.int32)
    assert session.step(depth).accepted

    before = session.pose.copy()
    corrupt = depth * (rng.random(depth.shape) < 0.03).astype(np.int32)
    step = session.step(corrupt)
    assert not step.accepted
    assert step.fitness < 0.6
    assert session.n_rejected == 1
    # random-walk prediction leaves the mean untouched on rejection
    np.testing.assert_array_equal(step.pose, before)

    # the loop recovers on the next clean frame
    assert session.step(depth).accepted


def test_session_resume_bit_exact(setup):
    """state_dict/from_state resumes the exact loop: same frames in, same
    poses out, bit for bit (incl. the hypothesis rng stream)."""
    m, K, r = setup
    _, pose2, _ = reference_demo_poses()
    refiner = _refiner(m, K)
    rng = np.random.default_rng(3)
    truth = pose2.copy()
    frames = []
    for _ in range(5):
        truth = _drift(truth, rng)
        frames.append(np.asarray(r.render_depth(truth))[0].astype(np.int32))

    session = prt.TrackingSession(refiner, pose2, n_hypotheses=3, seed=5,
                                  max_innovation=(0.5, 0.05))
    for f in frames[:3]:
        session.step(f)
    state = session.state_dict()
    ref_poses = [session.step(f).pose for f in frames[3:]]

    resumed = prt.TrackingSession.from_state(refiner, state)
    assert resumed.n_frames == 3
    assert resumed.max_innovation == (0.5, 0.05)
    for f, want in zip(frames[3:], ref_poses):
        got = resumed.step(f).pose
        np.testing.assert_array_equal(got, want)


def test_session_constant_velocity_mode(setup):
    """constant_velocity keeps tracking fast smooth motion (the regime the
    fusion study measured random walk degrading in)."""
    m, K, r = setup
    _, pose2, _ = reference_demo_poses()
    session = prt.TrackingSession(_refiner(m, K), pose2, n_hypotheses=3,
                                  motion="constant_velocity", seed=4)
    truth = pose2.copy()
    for frame in range(5):
        truth = np.asarray(geometry.pose_from_Rt(
            truth[:3, :3], truth[:3, 3] + np.float32([4.0, 3.0, 0.0])))
        depth = np.asarray(r.render_depth(truth))[0].astype(np.int32)
        step = session.step(depth)
        t_err = np.abs(step.pose[:3, 3] - truth[:3, 3]).max()
        assert t_err < 6.0, f"frame {frame}: lost track ({t_err} mm)"


def test_session_multi_model(setup):
    """MultiModelRefiner sessions pin every hypothesis to one model id."""
    m, K, r = setup
    _, pose2, _ = reference_demo_poses()
    refiner = prt.MultiModelRefiner([m, m], K=K, width=W, height=H,
                                    max_points=4096, use_pallas=False,
                                    window=64, stride=1)
    session = prt.TrackingSession(refiner, pose2, n_hypotheses=2, seed=6)
    depth = np.asarray(r.render_depth(pose2))[0].astype(np.int32)
    with pytest.raises(ValueError, match="model_id"):
        session.step(depth)
    step = session.step(depth, model_id=1)
    assert step.accepted and step.fitness > 0.7


def test_session_validation(setup):
    m, K, _ = setup
    _, pose2, _ = reference_demo_poses()
    with pytest.raises(ValueError, match="motion"):
        prt.TrackingSession(_refiner(m, K), pose2, motion="warp")
    with pytest.raises(ValueError, match="n_hypotheses"):
        prt.TrackingSession(_refiner(m, K), pose2, n_hypotheses=0)
    session = prt.TrackingSession(_refiner(m, K), pose2)
    with pytest.raises(ValueError, match="model_id"):
        session.step(np.zeros((H, W), np.int32), model_id=0)
