"""Rotation representation conversions as pure JAX functions.

Capability parity with the reference rotation utilities
(/root/reference/utils/geometry_utils.py, interp/lib/quaternions.py,
lib_smpl/smplpytorch/.../rodrigues_layer.py) but written batched-first so
every conversion vectorizes over arbitrary leading axes and fuses under jit.

Conventions (matching the reference so its checkpoints / packed files work):
  * quaternions are (w, x, y, z)
  * rot6d is the first two COLUMNS of R, flattened row-major from R[..., :2]:
    [r00, r01, r10, r11, r20, r21]   (geometry_utils.py:rotmat_to_6d)
  * rot6d -> R follows Zhou et al. CVPR'19 Gram-Schmidt with b1, b2, b3
    stacked as columns (geometry_utils.py:rot6d_to_rotmat)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def axis_angle_to_quat(theta: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> unit quaternion (..., 4), (w, x, y, z).

    Mirrors the reference numerics (geometry_utils.py:axis_to_quat), which
    computes the angle as ||theta + 1e-8|| so the zero rotation is well-defined.
    """
    angle = jnp.linalg.norm(theta + _EPS, axis=-1, keepdims=True)
    normalized = theta / angle
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Unit-normalizes and converts quaternion (..., 4) -> rotmat (..., 3, 3)."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3])
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def axis_angle_to_rotmat(theta: jax.Array) -> jax.Array:
    """Rodrigues: axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    return quat_to_rotmat(axis_angle_to_quat(theta))


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """6D rotation (..., 6) -> rotmat (..., 3, 3), Zhou et al. Gram-Schmidt.

    The 6 numbers are interpreted as a (3, 2) matrix whose columns are the
    raw first two basis vectors (parity: geometry_utils.py:rot6d_to_rotmat).
    """
    m = x.reshape(x.shape[:-1] + (3, 2))
    a1, a2 = m[..., 0], m[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2u = a2 - a2_proj
    b2 = b2u / jnp.maximum(jnp.linalg.norm(b2u, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(rot: jax.Array) -> jax.Array:
    """Rotmat (..., 3, 3) -> 6D (..., 6): first two columns, row-major flat."""
    return rot[..., :, :2].reshape(rot.shape[:-2] + (6,))


def rotmat_to_quat(rot: jax.Array) -> jax.Array:
    """Rotmat (..., 3, 3) -> unit quaternion (..., 4), (w, x, y, z).

    Branch-free Shepperd-style selection of the numerically best of the four
    candidate formulations, expressed with jnp.where so it jits cleanly.
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # candidate 0: trace-dominant
    s0 = _safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    # candidate 1: m00-dominant
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    # candidate 2: m11-dominant
    s2 = _safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    # candidate 3: m22-dominant
    s3 = _safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_axis_angle(quat: jax.Array) -> jax.Array:
    """Quaternion (..., 4) -> axis-angle (..., 3)."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    # canonicalize to w >= 0 so the returned angle lies in [0, pi]
    quat = jnp.where(quat[..., 0:1] < 0.0, -quat, quat)
    w = quat[..., 0]
    xyz = quat[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # Near zero rotation, axis*angle ~= 2*xyz (sin(t/2) ~ t/2).
    small = sin_half < 1e-6
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, sin_half))
    return xyz * scale[..., None]


def rotmat_to_axis_angle(rot: jax.Array) -> jax.Array:
    """Rotmat (..., 3, 3) -> axis-angle (..., 3)."""
    return quat_to_axis_angle(rotmat_to_quat(rot))


def axis_angle_to_rot6d(theta: jax.Array) -> jax.Array:
    return rotmat_to_rot6d(axis_angle_to_rotmat(theta))


def rot6d_to_axis_angle(x: jax.Array) -> jax.Array:
    return rotmat_to_axis_angle(rot6d_to_rotmat(x))


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Shortest-arc spherical interpolation between unit quaternions.

    q0, q1: (..., 4); t: broadcastable to (...,). Parity with the reference
    slerp (interp/lib/quaternions.py:38-66) for dot(q0, q1) > 0 — the only
    regime its callers reach after remove_quat_discontinuities. Documented
    deviation for dot < 0: the reference flips q1 but keeps the original
    obtuse half-angle in the sin weights (a non-geodesic path); we take the
    true shortest arc (abs(dot)). Near-parallel we lerp; the reference
    returns q0 only at |dot| >= 1 exactly.
    """
    q0 = q0 / jnp.linalg.norm(q0, axis=-1, keepdims=True)
    q1 = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)

    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == q0.ndim - 1 else jnp.asarray(t)
    use_lerp = dot > 0.9995
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def project_so3(mat: jax.Array) -> jax.Array:
    """Project (..., 3, 3) matrices onto SO(3) via SVD with det fix.

    Parity target: recon/pca_util.py:project_so3 (U @ Vt with a sign flip on
    the last column when det < 0 so the result is a proper rotation).
    """
    u, _, vt = jnp.linalg.svd(mat)
    hi = jax.lax.Precision.HIGHEST
    det = jnp.linalg.det(jnp.matmul(u, vt, precision=hi))
    d = jnp.ones(mat.shape[:-2] + (3,), mat.dtype).at[..., -1].set(det)
    return jnp.matmul(u * d[..., None, :], vt, precision=hi)


def rotation_angle_deg(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Geodesic angle in degrees between rotation matrices (..., 3, 3)."""
    rel = jnp.matmul(r1, jnp.swapaxes(r2, -1, -2),
                     precision=jax.lax.Precision.HIGHEST)
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))
