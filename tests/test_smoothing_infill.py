"""Smoothing + autoregressive infill runner tests."""
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.fit.smoothing import (smooth_smplt, smooth_objrot,
                                          smplh_to_smpl_pose)
from vistracker_tpu.fit.infill import make_infiller, prepare_streams
from vistracker_tpu.models.smoothnet import SmoothNet, SmoothNetSMPL
from vistracker_tpu.models.infiller import ConditionalMInfiller, InfillerConfig
from vistracker_tpu.core.rotations import axis_angle_to_rotmat, rotation_angle_deg


def test_smplh_to_smpl_pose_layout(rng):
    p = rng.randn(4, 156).astype(np.float32)
    out = smplh_to_smpl_pose(p)
    assert out.shape == (4, 72)
    np.testing.assert_array_equal(out[:, :69], p[:, :69])
    np.testing.assert_array_equal(out[:, 69:], p[:, 111:114])


def test_smooth_smplt_shapes(rng):
    T, W = 100, 64
    poses = (rng.randn(T, 156) * 0.2).astype(np.float32)
    betas = rng.randn(T, 10).astype(np.float32)
    trans = rng.randn(T, 3).astype(np.float32)
    model = SmoothNetSMPL(window_size=W, output_size=W)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 157, W)))
    out = smooth_smplt(params, poses, betas, trans, window=W)
    assert out["poses"].shape == (T, 72)
    assert out["betas"].shape == (T, 10)
    assert out["trans"].shape == (T, 3)
    assert np.isfinite(out["poses"]).all()


def test_smooth_smplt_short_sequence(rng):
    T, W = 20, 64  # shorter than the window: must pad and trim back
    model = SmoothNetSMPL(window_size=W, output_size=W)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 157, W)))
    out = smooth_smplt(params, (rng.randn(T, 72) * 0.2).astype(np.float32),
                       rng.randn(T, 10).astype(np.float32),
                       rng.randn(T, 3).astype(np.float32), window=W)
    assert out["poses"].shape == (T, 72)


def test_smooth_objrot_returns_valid_rotations(rng):
    T, W = 90, 64
    rots = np.asarray(axis_angle_to_rotmat(
        jnp.asarray((rng.randn(T, 3) * 0.3).astype(np.float32))))
    model = SmoothNet(window_size=W, output_size=W)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, W)))
    out = smooth_objrot(params, rots, window=W)
    assert out.shape == (T, 3, 3)
    # packed convention is transposed; the real rotations are valid
    real = out.transpose(0, 2, 1)
    np.testing.assert_allclose(np.linalg.det(real), 1.0, atol=1e-4)


def test_infill_autoregressive(rng):
    cfg = InfillerConfig(clip_len=60, window=10)
    model = ConditionalMInfiller(cfg)
    T = 95
    poses = (rng.randn(T, 72) * 0.2).astype(np.float32)
    trans = rng.randn(T, 3).astype(np.float32)
    rots = np.asarray(axis_angle_to_rotmat(
        jnp.asarray((rng.randn(T, 3) * 0.3).astype(np.float32))))
    occ = rng.rand(T).astype(np.float32)
    occ[:15] = 1.0  # first frames clearly visible (occ ratio HIGH = visible)

    ss, os_ = prepare_streams(poses, trans, rots)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.clip_len, 147)),
                        jnp.zeros((1, cfg.clip_len), bool),
                        jnp.zeros((1, cfg.clip_len, 6)),
                        jnp.zeros((1, cfg.clip_len), bool))
    run = make_infiller(model, cfg)
    out = run(params, poses, trans, rots, occ)
    assert out is not None and out.shape == (T, 3, 3)
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-4)


def test_infill_passthrough_when_unreliable(rng):
    cfg = InfillerConfig(clip_len=60, window=10)
    model = ConditionalMInfiller(cfg)
    T = 70
    poses = (rng.randn(T, 72) * 0.2).astype(np.float32)
    trans = rng.randn(T, 3).astype(np.float32)
    rots = np.broadcast_to(np.eye(3), (T, 3, 3)).copy()
    occ = np.zeros(T, np.float32)  # everything occluded -> no seeds
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.clip_len, 147)),
                        jnp.zeros((1, cfg.clip_len), bool),
                        jnp.zeros((1, cfg.clip_len, 6)),
                        jnp.zeros((1, cfg.clip_len), bool))
    run = make_infiller(model, cfg)
    assert run(params, poses, trans, rots, occ) is None


def test_infill_unconditional_motioninfiller(rng):
    """The same autoregression drives the UNCONDITIONAL MotionInfiller
    (one encoder over the concatenated 153-d stream,
    interp/test_infill_autoreg.py): context carry + rot6d->R conversion."""
    from vistracker_tpu.models.infiller import MotionInfiller
    cfg = InfillerConfig(clip_len=60, window=10)
    model = MotionInfiller(d_model=32, num_layers=1, num_heads=2,
                           dim_forward=64, hidden_dims=(16,))
    T = 95
    poses = (rng.randn(T, 72) * 0.2).astype(np.float32)
    trans = rng.randn(T, 3).astype(np.float32)
    rots = np.asarray(axis_angle_to_rotmat(
        jnp.asarray((rng.randn(T, 3) * 0.3).astype(np.float32))))
    occ = rng.rand(T).astype(np.float32)
    occ[:15] = 1.0
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.clip_len, 153)),
                        jnp.zeros((1, cfg.clip_len), bool))
    run = make_infiller(model, cfg)
    out = run(params, poses, trans, rots, occ)
    assert out is not None and out.shape == (T, 3, 3)
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-4)
