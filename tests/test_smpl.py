"""SMPL-H LBS parity: pointer-doubling JAX forward vs a straightforward
per-joint numpy reference implementation (classic SMPL paper math)."""
import numpy as np
import jax.numpy as jnp

from vistracker_tpu.core import smpl as S


def _np_rodrigues(theta):
    angle = np.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    axis = theta / angle
    half = angle * 0.5
    q = np.concatenate([np.cos(half), np.sin(half) * axis], -1)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.stack([
        w*w + x*x - y*y - z*z, 2*x*y - 2*w*z, 2*w*y + 2*x*z,
        2*w*z + 2*x*y, w*w - x*x + y*y - z*z, 2*y*z - 2*w*x,
        2*x*z - 2*w*y, 2*w*x + 2*y*z, w*w - x*x - y*y + z*z], -1)
    return R.reshape(theta.shape[:-1] + (3, 3))


def _np_lbs(model, pose, betas, trans, offsets=None, scale=1.0):
    v_template = np.asarray(model.v_template)
    shapedirs = np.asarray(model.shapedirs)
    posedirs = np.asarray(model.posedirs)
    j_reg = np.asarray(model.j_regressor)
    weights = np.asarray(model.weights)
    parents = model.parents
    B = pose.shape[0]
    J = len(parents)
    R = _np_rodrigues(pose.reshape(B, J, 3))
    v_shaped = v_template + np.einsum("vks,bs->bvk", shapedirs[:, :, :betas.shape[-1]], betas)
    joints0 = np.einsum("jv,bvk->bjk", j_reg, v_shaped)
    pose_map = (R[:, 1:] - np.eye(3)).reshape(B, -1)
    v_posed = v_shaped + np.einsum("vkp,bp->bvk", posedirs, pose_map)
    if offsets is not None:
        v_posed = v_posed + offsets

    G = np.zeros((B, J, 4, 4))
    for j in range(J):
        A = np.zeros((B, 4, 4))
        A[:, :3, :3] = R[:, j]
        A[:, 3, 3] = 1.0
        if j == 0:
            A[:, :3, 3] = joints0[:, 0]
            G[:, 0] = A
        else:
            A[:, :3, 3] = joints0[:, j] - joints0[:, parents[j]]
            G[:, j] = G[:, parents[j]] @ A
    jtr = G[:, :, :3, 3].copy()

    verts = np.zeros((B, v_posed.shape[1], 3))
    for b in range(B):
        T = np.zeros((J, 4, 4))
        for j in range(J):
            Gs = G[b, j].copy()
            Gs[:3, 3] -= Gs[:3, :3] @ joints0[b, j]
            T[j] = Gs
        Tv = np.einsum("vj,jrc->vrc", weights, T)
        vh = np.concatenate([v_posed[b], np.ones((v_posed.shape[1], 1))], -1)
        verts[b] = np.einsum("vrc,vc->vr", Tv, vh)[:, :3]
    verts = verts * scale + trans[:, None]
    jtr = jtr * scale + trans[:, None]
    return verts, jtr, v_posed


def test_lbs_matches_numpy_reference_smplh(rng):
    model = S.random_smpl_model(0, num_joints=52, num_verts=128)
    B = 3
    pose = (rng.randn(B, 156) * 0.3).astype(np.float32)
    betas = rng.randn(B, 10).astype(np.float32)
    trans = rng.randn(B, 3).astype(np.float32)
    v_ref, j_ref, vp_ref = _np_lbs(model, pose, betas, trans)
    v, j, vp, naked = S.lbs_forward(model, jnp.asarray(pose), jnp.asarray(betas),
                                    jnp.asarray(trans))
    np.testing.assert_allclose(np.asarray(vp), vp_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j), j_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-4)


def test_lbs_matches_numpy_reference_smpl24_with_offsets_scale(rng):
    model = S.random_smpl_model(1, num_joints=24, num_verts=64)
    B = 2
    pose = (rng.randn(B, 72) * 0.4).astype(np.float32)
    betas = rng.randn(B, 2).astype(np.float32)  # top-2 betas only
    trans = rng.randn(B, 3).astype(np.float32)
    offsets = (rng.randn(B, 64, 3) * 0.01).astype(np.float32)
    v_ref, j_ref, _ = _np_lbs(model, pose, betas, trans, offsets, scale=1.3)
    v, j, _, _ = S.lbs_forward(model, jnp.asarray(pose), jnp.asarray(betas),
                               jnp.asarray(trans), offsets=jnp.asarray(offsets),
                               scale=1.3)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j), j_ref, atol=1e-4)


def test_root_joint_consistency(rng):
    model = S.random_smpl_model(2, num_joints=52, num_verts=64)
    B = 4
    pose = (rng.randn(B, 156) * 0.3).astype(np.float32)
    betas = rng.randn(B, 10).astype(np.float32)
    trans = rng.randn(B, 3).astype(np.float32)
    _, joints, _, _ = S.lbs_forward(model, jnp.asarray(pose), jnp.asarray(betas),
                                    jnp.asarray(trans))
    root = S.get_root_joint(model, jnp.asarray(pose), jnp.asarray(betas),
                            jnp.asarray(trans))
    np.testing.assert_allclose(np.asarray(root)[:, 0], np.asarray(joints)[:, 0],
                               atol=1e-5)


def test_zero_pose_is_template(rng):
    model = S.random_smpl_model(3, num_joints=24, num_verts=64)
    B = 1
    pose = np.zeros((B, 72), np.float32)
    betas = np.zeros((B, 10), np.float32)
    trans = np.zeros((B, 3), np.float32)
    v, _, _, naked = S.lbs_forward(model, jnp.asarray(pose), jnp.asarray(betas),
                                   jnp.asarray(trans))
    np.testing.assert_allclose(np.asarray(v), np.asarray(model.v_template)[None],
                               atol=1e-5)
