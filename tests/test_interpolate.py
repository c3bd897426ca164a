"""Slerp infilling baseline + angle evaluator + SMPL-H generator tests."""
import numpy as np
import jax.numpy as jnp

from vistracker_tpu.fit.interpolate import slerp_fill, occluded_intervals
from vistracker_tpu.eval.evaluator import rotation_errors_deg
from vistracker_tpu.core.rotations import axis_angle_to_rotmat
from vistracker_tpu.core.smpl_generator import smplh_params


def test_occluded_intervals():
    vis = np.array([1, 1, 0, 0, 1, 0, 1, 0, 0], bool)
    assert occluded_intervals(vis) == [(2, 4), (5, 6), (7, 9)]


def test_slerp_fill_midpoint(rng):
    T = 5
    aa = np.zeros((T, 3), np.float32)
    aa[-1] = [0.0, 1.0, 0.0]  # rotate 1 rad about y at the end
    rots = np.asarray(axis_angle_to_rotmat(jnp.asarray(aa)))
    trans = np.zeros((T, 3), np.float32)
    trans[-1] = [1.0, 0.0, 0.0]
    occ = np.array([1.0, 0, 0, 0, 1.0], np.float32)  # frames 1-3 occluded
    r_f, t_f = slerp_fill(rots, trans, occ, thres=0.5)
    # midpoint frame 2: half rotation, half translation
    exp_mid = np.asarray(axis_angle_to_rotmat(jnp.asarray([[0, 0.5, 0]])))[0]
    err = rotation_errors_deg(r_f[2:3], exp_mid[None])
    assert err[0] < 0.1, err
    np.testing.assert_allclose(t_f[2], [0.5, 0, 0], atol=1e-5)
    # anchors untouched
    np.testing.assert_allclose(r_f[0], rots[0], atol=1e-6)
    np.testing.assert_allclose(r_f[-1], rots[-1], atol=1e-6)


def test_slerp_fill_leading_trailing(rng):
    T = 6
    rots = np.asarray(axis_angle_to_rotmat(
        jnp.asarray((rng.randn(T, 3) * 0.3).astype(np.float32))))
    trans = rng.randn(T, 3).astype(np.float32)
    occ = np.array([0, 0, 1, 1, 0, 0], np.float32)
    r_f, t_f = slerp_fill(rots, trans, occ)
    np.testing.assert_allclose(r_f[0], rots[2], atol=1e-5)  # copy right
    np.testing.assert_allclose(r_f[5], rots[3], atol=1e-5)  # copy left
    np.testing.assert_allclose(t_f[1], trans[2], atol=1e-6)


def test_rotation_errors_deg():
    r0 = np.broadcast_to(np.eye(3), (3, 3, 3)).copy()
    aa = np.array([[0, 0, 0], [np.pi / 2, 0, 0], [0, np.pi, 0]], np.float32)
    r1 = np.asarray(axis_angle_to_rotmat(jnp.asarray(aa)))
    errs = rotation_errors_deg(r1, r0)
    np.testing.assert_allclose(errs, [0.0, 90.0, 180.0], atol=0.1)


def test_smplh_params_padding(rng):
    pose72 = rng.randn(4, 72).astype(np.float32)
    mean_hands = rng.randn(90).astype(np.float32)
    p = smplh_params(pose72, rng.randn(4, 10).astype(np.float32),
                     rng.randn(4, 3).astype(np.float32),
                     mean_hands=mean_hands)
    full = np.asarray(p.pose)
    assert full.shape == (4, 156)
    np.testing.assert_array_equal(full[:, :66], pose72[:, :66])
    np.testing.assert_allclose(full[:, 66:],
                               np.tile(mean_hands, (4, 1)), atol=1e-6)
