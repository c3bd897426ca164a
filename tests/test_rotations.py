"""Rotation conversion parity tests.

Cross-checked against torch implementations built independently in-test
(torch CPU is available in the image) and against round-trip identities.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vistracker_tpu.core import rotations as R


def _torch_rot6d_to_rotmat(x):
    x = x.view(-1, 3, 2)
    a1, a2 = x[:, :, 0], x[:, :, 1]
    b1 = F.normalize(a1)
    b2 = F.normalize(a2 - torch.einsum("bi,bi->b", b1, a2).unsqueeze(-1) * b1)
    b3 = torch.cross(b1, b2, dim=-1)
    return torch.stack((b1, b2, b3), dim=-1)


def _random_rotmats(rng, n):
    # uniform-ish random rotations via QR
    a = rng.randn(n, 3, 3)
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q.astype(np.float32)


def test_axis_angle_to_rotmat_matches_rodrigues(rng):
    theta = rng.randn(64, 3).astype(np.float32)
    ours = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(theta)))
    # independent Rodrigues formula
    angle = np.linalg.norm(theta, axis=-1, keepdims=True)
    axis = theta / np.maximum(angle, 1e-12)
    K = np.zeros((64, 3, 3), np.float64)
    K[:, 0, 1], K[:, 0, 2] = -axis[:, 2], axis[:, 1]
    K[:, 1, 0], K[:, 1, 2] = axis[:, 2], -axis[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -axis[:, 1], axis[:, 0]
    a = angle[..., None]
    expected = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_rot6d_roundtrip_and_torch_parity(rng):
    x = rng.randn(128, 6).astype(np.float32)
    ours = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x)))
    theirs = _torch_rot6d_to_rotmat(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # roundtrip: R -> 6d -> R
    mats = _random_rotmats(np.random.RandomState(1), 64)
    six = R.rotmat_to_rot6d(jnp.asarray(mats))
    back = np.asarray(R.rot6d_to_rotmat(six))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_rot6d_layout_matches_reference_convention(rng):
    # rot6d is the first two columns flattened row-major: [r00,r01,r10,r11,r20,r21]
    mats = _random_rotmats(rng, 8)
    six = np.asarray(R.rotmat_to_rot6d(jnp.asarray(mats)))
    expected = mats[:, :, :2].reshape(8, 6)
    np.testing.assert_allclose(six, expected, atol=0)


def test_quat_rotmat_roundtrip(rng):
    mats = _random_rotmats(rng, 256)
    q = R.rotmat_to_quat(jnp.asarray(mats))
    back = np.asarray(R.quat_to_rotmat(q))
    np.testing.assert_allclose(back, mats, atol=1e-4)


def test_axis_angle_roundtrip(rng):
    theta = (rng.randn(128, 3) * 0.8).astype(np.float32)
    mats = R.axis_angle_to_rotmat(jnp.asarray(theta))
    back = np.asarray(R.rotmat_to_axis_angle(mats))
    np.testing.assert_allclose(back, theta, atol=1e-4)


def test_zero_rotation_stable():
    theta = jnp.zeros((4, 3))
    m = np.asarray(R.axis_angle_to_rotmat(theta))
    np.testing.assert_allclose(m, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
    aa = np.asarray(R.rotmat_to_axis_angle(jnp.broadcast_to(jnp.eye(3), (4, 3, 3))))
    np.testing.assert_allclose(aa, 0.0, atol=1e-5)


def test_slerp_endpoints_and_midpoint(rng):
    mats = _random_rotmats(rng, 16)
    q0 = R.rotmat_to_quat(jnp.asarray(mats[:8]))
    q1 = R.rotmat_to_quat(jnp.asarray(mats[8:]))
    s0 = np.asarray(R.quat_slerp(q0, q1, jnp.zeros((8,))))
    s1 = np.asarray(R.quat_slerp(q0, q1, jnp.ones((8,))))
    # compare as rotations (sign-insensitive)
    np.testing.assert_allclose(np.abs(np.sum(s0 * np.asarray(q0), -1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(s1 * np.asarray(q1), -1)), 1.0, atol=1e-5)
    # midpoint is equidistant
    sm = R.quat_slerp(q0, q1, jnp.full((8,), 0.5))
    m0 = np.asarray(R.rotation_angle_deg(R.quat_to_rotmat(sm), R.quat_to_rotmat(q0)))
    m1 = np.asarray(R.rotation_angle_deg(R.quat_to_rotmat(sm), R.quat_to_rotmat(q1)))
    np.testing.assert_allclose(m0, m1, atol=1e-2)


def test_project_so3(rng):
    noisy = _random_rotmats(rng, 32) + rng.randn(32, 3, 3).astype(np.float32) * 0.05
    p = np.asarray(R.project_so3(jnp.asarray(noisy)))
    eye = np.einsum("bij,bkj->bik", p, p)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(p), 1.0, atol=1e-5)
