"""End-to-end SMPL-T fitting test on synthetic data: generate GT keypoints
from a known pose trajectory, perturb the init, and check the fitter
recovers the 2D reprojection and reduces the loss monotonically-ish."""
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.core import smpl as S
from vistracker_tpu.core.landmarks import BodyLandmarks
from vistracker_tpu.core.priors import MahalanobisPrior, HandPrior
from vistracker_tpu.fit.smplt import (SMPLTFitConfig, SMPLTParams, fit_smplt,
                                      project_pixels, init_trans_from_bbox,
                                      JOINT_ACCEL_WEIGHTS)
from vistracker_tpu.core.smpl import lbs_forward


def _toy_setup(rng, B=6, V=96):
    model = S.random_smpl_model(0, num_joints=52, num_verts=V)
    reg = rng.rand(25, V).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    landmarks = BodyLandmarks(body25=jnp.asarray(reg),
                              face=jnp.asarray(reg[:1]),
                              hand=jnp.asarray(reg[:1]))
    body_prior = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hand_prior = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                           rhand_prec=jnp.eye(45) * 0.1)
    return model, landmarks, body_prior, hand_prior


def test_joint_accel_weights_layout():
    assert JOINT_ACCEL_WEIGHTS.shape == (66,)
    np.testing.assert_allclose(JOINT_ACCEL_WEIGHTS[:3], 1.0)     # root
    np.testing.assert_allclose(JOINT_ACCEL_WEIGHTS[3:6], 10.0)   # L upper leg
    np.testing.assert_allclose(JOINT_ACCEL_WEIGHTS[36:39], (5.0, 10.0, 10.0))
    np.testing.assert_allclose(JOINT_ACCEL_WEIGHTS[63:66], 1.0)  # R wrist


def test_init_trans_from_bbox():
    cfg = SMPLTFitConfig()
    centers = np.array([[cfg.cx, cfg.cy]], np.float32)
    t = init_trans_from_bbox(centers, cfg)
    np.testing.assert_allclose(t, [[0.0, 0.0, 2.2]], atol=1e-6)


def test_fit_recovers_keypoints(rng):
    model, landmarks, body_prior, hand_prior = _toy_setup(rng)
    B = 6
    # GT: a smooth pose trajectory near zero pose, at depth 2.2
    t = np.linspace(0, 1, B).astype(np.float32)
    pose_gt = np.zeros((B, 156), np.float32)
    pose_gt[:, 3:66] = 0.2 * np.sin(t)[:, None] * rng.randn(63)[None] * 0.3
    betas_gt = np.zeros((B, 10), np.float32)
    trans_gt = np.stack([0.1 * t, 0.05 * t, 2.2 + 0.1 * t], -1)

    cfg = SMPLTFitConfig(global_iters=2, max_iters=12)
    verts, _, _, _ = lbs_forward(model, jnp.asarray(pose_gt),
                                 jnp.asarray(betas_gt), jnp.asarray(trans_gt))
    joints = landmarks.body_joints(verts)
    kpts2d = np.asarray(project_pixels(joints, cfg))
    kpts = np.concatenate([kpts2d, np.ones((B, 25, 1), np.float32)], -1)

    # init: perturbed translation + zero pose
    init = SMPLTParams.from_full(
        jnp.zeros((B, 156)), jnp.zeros((B, 10)),
        jnp.asarray(trans_gt + np.array([0.15, -0.1, 0.2], np.float32)))

    params, losses = fit_smplt(model, landmarks, body_prior, hand_prior,
                               jnp.asarray(kpts), init, cfg)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])

    # reprojection error in pixels should be small after fitting
    verts_f, _, _, _ = lbs_forward(model, params.pose, params.betas, params.trans)
    proj = np.asarray(project_pixels(landmarks.body_joints(verts_f), cfg))
    err = np.abs(proj - kpts2d).mean()
    assert err < 20.0, err  # pixels (image is 2048 wide)

    # hand pose must not move in either phase (stays at init)
    np.testing.assert_allclose(np.asarray(params.hand_pose), 0.0, atol=1e-7)
