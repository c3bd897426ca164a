"""Multi-device SPMD tests on the virtual 8-device CPU mesh:
frame-axis-sharded SMPL-T fitting and data-parallel SIF-Net training."""
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.parallel.mesh import make_mesh, shard_leading, replicate
from vistracker_tpu.core import smpl as S
from vistracker_tpu.core.landmarks import BodyLandmarks
from vistracker_tpu.core.priors import MahalanobisPrior, HandPrior
from vistracker_tpu.fit.smplt import (SMPLTFitConfig, SMPLTParams, fit_smplt,
                                      project_pixels)
from vistracker_tpu.core.smpl import lbs_forward
from vistracker_tpu.models.sifnet import SIFNet, SIFNetConfig
from vistracker_tpu.fit.train import TrainConfig, init_train_state, make_train_step


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_smplt_fit_sharded_matches_single(rng):
    model = S.random_smpl_model(0, num_joints=52, num_verts=64)
    reg = rng.rand(25, 64).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    lms = BodyLandmarks(body25=jnp.asarray(reg), face=jnp.asarray(reg[:1]),
                        hand=jnp.asarray(reg[:1]))
    bp = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hp = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                   rhand_prec=jnp.eye(45) * 0.1)
    cfg = SMPLTFitConfig(global_iters=1, max_iters=3)

    B = 16  # 2 frames per device
    pose = np.zeros((B, 156), np.float32)
    trans = np.tile(np.array([0, 0, 2.2], np.float32), (B, 1))
    verts, _, _, _ = lbs_forward(model, jnp.asarray(pose), jnp.zeros((B, 10)),
                                 jnp.asarray(trans))
    kpts2d = np.asarray(project_pixels(lms.body_joints(verts), cfg))
    kpts = np.concatenate([kpts2d, np.ones((B, 25, 1), np.float32)], -1)
    init = SMPLTParams.from_full(
        jnp.zeros((B, 156)), jnp.zeros((B, 10)),
        jnp.asarray(trans + np.array([0.1, 0.05, 0.1], np.float32)))

    # single device
    p_single, l_single = fit_smplt(model, lms, bp, hp, jnp.asarray(kpts),
                                   init, cfg)

    # frame-axis sharded over 8 devices: same program, sharded inputs;
    # the temporal stencils become halo exchanges inserted by GSPMD
    mesh = make_mesh(8, "frames")
    kpts_s = shard_leading(mesh, jnp.asarray(kpts))
    init_s = shard_leading(mesh, init)
    model_r = replicate(mesh, model)
    p_shard, l_shard = fit_smplt(model_r, replicate(mesh, lms),
                                 replicate(mesh, bp), replicate(mesh, hp),
                                 kpts_s, init_s, cfg)
    np.testing.assert_allclose(np.asarray(l_shard), np.asarray(l_single),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_shard.trans),
                               np.asarray(p_single.trans), atol=1e-4)


def test_sifnet_train_step_data_parallel(rng):
    cfg = SIFNetConfig(num_stack=1, num_hourglass=1, hourglass_dim=32,
                       tmpx_dim=32, triplane_stack=1, triplane_hg_dim=32,
                       triplane_tmpx_dim=32, hidden_dim=16)
    model = SIFNet(cfg)
    B, H, W, N = 8, 32, 32, 16
    batch = dict(
        images=jnp.asarray(rng.rand(B, H, W, 8).astype(np.float32)),
        points=jnp.asarray((rng.randn(B, N, 3) * 0.5
                            + np.array([0, 0, 2.2])).astype(np.float32)),
        crop_center=jnp.tile(jnp.asarray([[1018.0, 779.0]]), (B, 1)),
        body_center=jnp.tile(jnp.asarray([[0.0, 0.0, 2.2]]), (B, 1)),
        df_h=jnp.abs(jnp.asarray(rng.randn(B, N).astype(np.float32))) * 0.1,
        df_o=jnp.abs(jnp.asarray(rng.randn(B, N).astype(np.float32))) * 0.1,
        parts=jnp.asarray(rng.randint(0, 14, (B, N)).astype(np.int32)),
        pca=jnp.asarray(rng.randn(B, N, 3, 3).astype(np.float32)),
        obj_center=jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1),
        visibility=jnp.asarray(rng.rand(B, N).astype(np.float32)),
    )
    tcfg = TrainConfig()
    state = init_train_state(model, jax.random.PRNGKey(0), batch, tcfg)
    step = make_train_step(model, tcfg)

    mesh = make_mesh(8, "data")
    batch_s = shard_leading(mesh, batch, "data")
    state_r = replicate(mesh, state)
    losses = []
    st = state_r
    for _ in range(8):
        st, loss, terms = step(st, batch_s)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # training on a fixed batch must make clear progress within a few steps
    assert min(losses[4:]) < losses[0], losses
