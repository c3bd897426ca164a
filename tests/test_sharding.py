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


def test_joint_fit_sharded_matches_single(rng):
    """Stage-6 object optimization (the metric-critical program) under
    frame-axis SPMD: the FULL optimize_object run (obj -> sil -> joint
    phases, incl. cross-frame temporal terms that become GSPMD halo
    permutes) on an 8-device mesh must match the single-device run.
    Analytic sphere scene from test_joint_fit; 2 frames per device."""
    from test_joint_fit import (sphere_query_fn, project_px, _sphere_mesh,
                                OBJ_CENTER_GT, HUM_CENTER, HUM_RADIUS)
    from vistracker_tpu.fit.joint import (JointFitConfig, SilRefs,
                                          make_object_optimizer)
    from vistracker_tpu.ops.rasterizer import soft_silhouette

    B = 16
    cfg = JointFitConfig(iter_obj=2, iter_sil=1, joint_max_iter=3,
                         sil_size=32, sil_sigma=1 / 16.0)
    opt = make_object_optimizer(sphere_query_fn, project_px, cfg)
    verts_t, faces_t = _sphere_mesh()
    roi = np.tile(np.array([[700.0, 500.0, 700.0]], np.float32), (B, 1))
    ref = soft_silhouette(
        jnp.asarray(2.0 * (np.asarray(project_px(points=jnp.asarray(
            verts_t + OBJ_CENTER_GT)[None]))[0] - roi[0, :2])
            / roi[0, 2] - 1.0),
        jnp.asarray(faces_t), cfg.sil_size, cfg.sil_sigma)
    sil = SilRefs(image_ref=jnp.broadcast_to(ref, (B,) + ref.shape),
                  keep_mask=jnp.ones((B, cfg.sil_size, cfg.sil_size)),
                  roi_xyb=jnp.asarray(roi))
    # per-frame distinct inits so the temporal terms are live
    drift = 0.05 * np.sin(np.arange(B, dtype=np.float32))[:, None] \
        * np.array([[1.0, -0.5, 0.3]], np.float32)
    obj_t = jnp.asarray(OBJ_CENTER_GT + np.array([0.1, -0.05, 0.08],
                                                 np.float32) + drift)
    args = dict(
        obj_r=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        obj_t=obj_t, obj_s=jnp.ones(B),
        obj_points=jnp.asarray(verts_t[None].repeat(B, 0)),
        smpl_verts=jnp.asarray(HUM_CENTER + HUM_RADIUS
                               * _sphere_mesh(r=1.0)[0][None].repeat(B, 0)),
        occ_ratios=jnp.asarray((rng.rand(B) > 0.3).astype(np.float32)),
        sil=sil,
        sil_verts=jnp.asarray(verts_t[None].repeat(B, 0)),
        sil_faces=jnp.asarray(faces_t))
    labels_h = np.full(args["smpl_verts"].shape[1], 11, np.int32)

    r1, t1, l1 = opt(args["obj_r"], args["obj_t"], args["obj_s"],
                     args["obj_points"], args["smpl_verts"], labels_h,
                     args["occ_ratios"], args["sil"], args["sil_verts"],
                     args["sil_faces"])

    mesh = make_mesh(8, "frames")
    sh = {k: shard_leading(mesh, v) for k, v in args.items()
          if k not in ("sil_faces",)}
    sh["sil_faces"] = replicate(mesh, args["sil_faces"])
    r2, t2, l2 = opt(sh["obj_r"], sh["obj_t"], sh["obj_s"],
                     sh["obj_points"], sh["smpl_verts"], labels_h,
                     sh["occ_ratios"], sh["sil"], sh["sil_verts"],
                     sh["sil_faces"])
    # first phase-1 losses are pre-dynamics: tight. The trajectory then
    # compounds f32 reduction-order differences (sharded means reduce in
    # a different order) through ~30 Adam steps — observed rel drift
    # ~2e-3 by the last iterations, growing smoothly from 1e-6, which is
    # accumulation, not a sharding-semantics mismatch.
    np.testing.assert_allclose(np.asarray(l2)[:2], np.asarray(l1)[:2],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               rtol=0, atol=2e-3)


def test_smpl_phase_sharded_matches_single(rng):
    """Stage-6a SMPL refinement under frame-axis SPMD: optimize_smpl
    (betas -> pose+kpts phases, temporal pose/trans smoothness stencils)
    sharded over 8 devices == single-device."""
    from test_joint_fit import sphere_query_fn, project_px
    from vistracker_tpu.fit.joint import (JointFitConfig,
                                          make_smpl_optimizer)

    model = S.random_smpl_model(0, num_joints=52, num_verts=64)
    reg = rng.rand(25, 64).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    lms = BodyLandmarks(body25=jnp.asarray(reg), face=jnp.asarray(reg[:1]),
                        hand=jnp.asarray(reg[:1]))
    bp = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hp = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                   rhand_prec=jnp.eye(45) * 0.1)
    part_labels = np.full(64, 11, np.int32)
    cfg = JointFitConfig(iter_betas=1, iter_pose=1, iter_kpts=1,
                         smpl_max_iter=2)

    def project_crop(ctx, pts):
        return project_px(points=pts) / 1000.0

    opt = make_smpl_optimizer(sphere_query_fn, project_crop, model, lms,
                              bp, hp, part_labels, cfg)
    B = 16
    pose = rng.randn(B, 156).astype(np.float32) * 0.02
    trans = np.tile(np.array([0, 0, 2.2], np.float32), (B, 1)) \
        + rng.randn(B, 3).astype(np.float32) * 0.01
    init = SMPLTParams.from_full(jnp.asarray(pose), jnp.zeros((B, 10)),
                                 jnp.asarray(trans))
    verts, _, _, _ = S.lbs_forward(model, jnp.asarray(pose),
                                   jnp.zeros((B, 10)), jnp.asarray(trans))
    kpts = jnp.concatenate(
        [project_crop(None, lms.body_joints(verts)),
         jnp.ones((B, 25, 1))], -1)

    p1, l1 = opt(init, kpts)

    mesh = make_mesh(8, "frames")
    p2, l2 = opt(shard_leading(mesh, init), shard_leading(mesh, kpts))
    # same tolerance rationale as test_joint_fit_sharded_matches_single:
    # tight pre-dynamics head, reduction-order drift bound on the rest
    np.testing.assert_allclose(np.asarray(l2)[:1], np.asarray(l1)[:1],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(p2.trans), np.asarray(p1.trans),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(p2.body_pose),
                               np.asarray(p1.body_pose),
                               rtol=0, atol=2e-3)
