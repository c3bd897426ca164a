"""Joint-optimization tests against an analytic scene: spheres stand in for
the neural distance fields so convergence is checkable in closed form."""
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.fit.joint import (JointFitConfig, SilRefs,
                                      make_object_optimizer,
                                      make_smpl_optimizer,
                                      transform_obj_verts,
                                      init_object_orientation)
from vistracker_tpu.fit.smplt import SMPLTParams
from vistracker_tpu.core import smpl as S
from vistracker_tpu.core.landmarks import BodyLandmarks
from vistracker_tpu.core.priors import MahalanobisPrior, HandPrior
from vistracker_tpu.core.rotations import axis_angle_to_rotmat, rotation_angle_deg
from vistracker_tpu.ops.rasterizer import soft_silhouette

B = 4
OBJ_CENTER_GT = np.array([0.4, 0.1, 2.3], np.float32)
OBJ_RADIUS = 0.25
HUM_CENTER = np.array([-0.1, 0.0, 2.2], np.float32)
HUM_RADIUS = 0.4


def sphere_query_fn(ctx, points):
    """Analytic scene: human sphere + object sphere distance fields."""
    d_h = jnp.abs(jnp.linalg.norm(points - HUM_CENTER, axis=-1) - HUM_RADIUS)
    d_o = jnp.abs(jnp.linalg.norm(points - OBJ_CENTER_GT, axis=-1) - OBJ_RADIUS)
    Bp, N = points.shape[:2]
    parts = jnp.zeros((Bp, N, 14)).at[..., 11].set(5.0)  # all torso
    return dict(df=jnp.stack([d_h, d_o], -1), parts=parts,
                pca=jnp.broadcast_to(jnp.eye(3), (Bp, N, 3, 3)),
                centers=jnp.zeros((Bp, N, 3)), vis=jnp.ones((Bp, N, 1)))


def _sphere_mesh(n_lat=8, n_lon=12, r=OBJ_RADIUS):
    """Small UV-sphere template mesh centered at origin."""
    vs, fs = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            vs.append([r * np.sin(th) * np.cos(ph),
                       r * np.cos(th),
                       r * np.sin(th) * np.sin(ph)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            fs.append([a, b, c])
            fs.append([b, d, c])
    return np.asarray(vs, np.float32), np.asarray(fs, np.int32)


def project_px(ctx=None, points=None):
    if points is None:
        points = ctx  # allow single-arg use in test setup

    fx, fy, cx, cy = 979.7844, 979.840, 1018.952, 779.486
    z = points[..., 2:3]
    return jnp.concatenate([points[..., 0:1] * fx / z + cx,
                            points[..., 1:2] * fy / z + cy], -1)


def test_transform_obj_verts_convention():
    v = jnp.asarray(np.random.RandomState(0).randn(1, 5, 3).astype(np.float32))
    r = axis_angle_to_rotmat(jnp.asarray([[0.3, -0.2, 0.5]]))
    t = jnp.asarray([[0.1, 0.2, 0.3]])
    s = jnp.asarray([2.0])
    out = transform_obj_verts(v, r, t, s)
    expected = (np.asarray(v) @ np.asarray(r) + np.asarray(t)[:, None]) * 2.0
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_init_object_orientation_recovers_rotation(rng):
    src = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    r_gt = axis_angle_to_rotmat(jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.5))
    tgt = jnp.matmul(jnp.linalg.inv(src), r_gt)  # src @ R = tgt
    r = init_object_orientation(tgt, src)
    ang = np.asarray(rotation_angle_deg(r, r_gt))
    np.testing.assert_allclose(ang, 0.0, atol=0.1)


def test_object_optimizer_converges_to_gt_center(rng):
    cfg = JointFitConfig(iter_obj=8, iter_sil=2, joint_max_iter=8,
                         sil_size=64, sil_sigma=1 / 32.0)
    verts_t, faces_t = _sphere_mesh()
    opt = make_object_optimizer(sphere_query_fn, project_px, cfg)

    # template points on the template sphere (centered)
    pts = verts_t[None].repeat(B, 0)
    obj_points = jnp.asarray(pts)
    sil_verts = jnp.asarray(pts)
    sil_faces = jnp.asarray(faces_t)

    # silhouette reference: GT sphere rendered through the same pipeline
    roi = np.tile(np.array([[700.0, 500.0, 700.0]], np.float32), (B, 1))
    gt_world = jnp.asarray(verts_t + OBJ_CENTER_GT)
    px = project_px(points=gt_world[None])[0]
    ndc = 2.0 * (px - roi[0, :2]) / roi[0, 2] - 1.0
    ref = soft_silhouette(ndc, sil_faces, cfg.sil_size, cfg.sil_sigma)
    sil = SilRefs(image_ref=jnp.broadcast_to(ref, (B,) + ref.shape),
                  keep_mask=jnp.ones((B, cfg.sil_size, cfg.sil_size)),
                  roi_xyb=jnp.asarray(roi))

    # init: translated off the GT, identity rotation
    obj_r = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    obj_t = jnp.asarray(np.tile(OBJ_CENTER_GT + np.array([0.15, -0.1, 0.1],
                                                         np.float32), (B, 1)))
    obj_s = jnp.ones((B,))
    smpl_verts = jnp.asarray(
        HUM_CENTER + HUM_RADIUS * _sphere_mesh(r=1.0)[0][None].repeat(B, 0))
    labels_h = np.full(smpl_verts.shape[1], 11, np.int32)  # torso
    occ = jnp.ones((B,))

    r_fin, t_fin, losses = opt(obj_r, obj_t, obj_s, obj_points, smpl_verts,
                               labels_h, occ, sil, sil_verts, sil_faces)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    err0 = np.linalg.norm(np.asarray(obj_t) - OBJ_CENTER_GT, axis=-1).mean()
    err1 = np.linalg.norm(np.asarray(t_fin) - OBJ_CENTER_GT, axis=-1).mean()
    assert err1 < err0 * 0.5, (err0, err1)
    # rotations stay valid
    det = np.linalg.det(np.asarray(r_fin))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)


def test_collision_term_live(rng):
    """The --collision SDF-grid penalty is reachable through the real
    optimizer factory: with interpenetrating meshes the joint-phase loss
    trajectory changes when the sdf_grid is supplied (reference term:
    recon_fit_base.py:736-765, weight 3^2 recon_fit_trivis_full.py:139)."""
    from vistracker_tpu.ops.sdf_grid import SDFGrid, penetration_loss
    from vistracker_tpu.utils.mesh import signed_distance_grid

    verts_t, faces_t = _sphere_mesh()
    vals, bmin, bmax = signed_distance_grid(verts_t, faces_t, 32)
    grid = SDFGrid(jnp.asarray(vals), jnp.asarray(bmin), jnp.asarray(bmax))
    # sanity: inside the template sphere penetrates, far outside does not
    assert float(penetration_loss(grid, jnp.zeros((1, 4, 3)))) > 0
    assert float(penetration_loss(grid, jnp.full((1, 4, 3), 5.0))) == 0.0

    cfg = JointFitConfig(iter_obj=2, iter_sil=1, joint_max_iter=4,
                         sil_size=32, sil_sigma=1 / 16.0, collision=True)
    opt = make_object_optimizer(sphere_query_fn, project_px, cfg)
    pts = verts_t[None].repeat(B, 0)
    roi = np.tile(np.array([[700.0, 500.0, 700.0]], np.float32), (B, 1))
    ref = soft_silhouette(
        jnp.asarray(2.0 * (np.asarray(project_px(points=jnp.asarray(
            verts_t + OBJ_CENTER_GT)[None]))[0] - roi[0, :2])
            / roi[0, 2] - 1.0),
        jnp.asarray(faces_t), cfg.sil_size, cfg.sil_sigma)
    sil = SilRefs(image_ref=jnp.broadcast_to(ref, (B,) + ref.shape),
                  keep_mask=jnp.ones((B, cfg.sil_size, cfg.sil_size)),
                  roi_xyb=jnp.asarray(roi))
    obj_t = jnp.asarray(np.tile(OBJ_CENTER_GT, (B, 1)))
    # human verts placed INSIDE the object sphere -> the collision term
    # must fire and change the optimization
    smpl_verts = jnp.asarray(
        OBJ_CENTER_GT + 0.3 * OBJ_RADIUS * _sphere_mesh(r=1.0)[0][None]
        .repeat(B, 0))
    args = (jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), obj_t, jnp.ones(B),
            jnp.asarray(pts), smpl_verts,
            np.full(smpl_verts.shape[1], 11, np.int32), jnp.ones(B), sil,
            jnp.asarray(pts), jnp.asarray(faces_t))
    _, t_with, loss_with = opt(*args, sdf_grid=grid)
    _, t_wo, loss_wo = opt(*args)  # cfg.collision=True but no grid -> off
    assert np.isfinite(np.asarray(loss_with)).all()
    # the live term adds positive loss and changes the final translation
    assert float(np.asarray(loss_with)[-1]) != float(np.asarray(loss_wo)[-1])
    assert not np.allclose(np.asarray(t_with), np.asarray(t_wo), atol=1e-6)


def test_smpl_optimizer_runs_and_improves(rng):
    model = S.random_smpl_model(0, num_joints=52, num_verts=96)
    reg = rng.rand(25, 96).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    lms = BodyLandmarks(body25=jnp.asarray(reg), face=jnp.asarray(reg[:1]),
                        hand=jnp.asarray(reg[:1]))
    bp = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hp = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                   rhand_prec=jnp.eye(45) * 0.1)
    cfg = JointFitConfig(iter_betas=1, iter_pose=1, iter_kpts=1,
                         smpl_max_iter=3)
    labels = rng.randint(0, 14, 96).astype(np.int32)

    def project_norm(ctx, joints):
        px = project_px(points=joints)
        cc = jnp.asarray([[1018.952, 779.486]])
        return 2.0 * (600.0 + px - cc[:, None, :]) / 1200.0 - 1.0

    opt = make_smpl_optimizer(sphere_query_fn, project_norm, model, lms, bp,
                              hp, labels, cfg)
    init = SMPLTParams.from_full(
        jnp.zeros((B, 156)), jnp.zeros((B, 10)),
        jnp.asarray(np.tile(HUM_CENTER + np.array([0.1, 0.0, 0.3], np.float32),
                            (B, 1))))
    kpts = jnp.concatenate(
        [jnp.zeros((B, 25, 2)), jnp.ones((B, 25, 1))], -1)
    params, losses = opt(init, kpts)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    # hand pose never optimized
    np.testing.assert_allclose(np.asarray(params.hand_pose), 0.0, atol=1e-7)


def test_early_stop_variant_converges(rng):
    """With early stopping enabled the optimizer still converges and the
    while_loop machinery runs under jit."""
    import dataclasses
    cfg = JointFitConfig(iter_obj=3, iter_sil=1, joint_max_iter=20,
                         sil_size=64, sil_sigma=1 / 32.0, early_stop=True,
                         early_stop_min_frac=0.1)
    verts_t, faces_t = _sphere_mesh()
    opt = make_object_optimizer(sphere_query_fn, project_px, cfg)
    pts = verts_t[None].repeat(B, 0)
    roi = np.tile(np.array([[700.0, 500.0, 700.0]], np.float32), (B, 1))
    ref = soft_silhouette(
        jnp.asarray(2.0 * (np.asarray(project_px(points=jnp.asarray(
            verts_t + OBJ_CENTER_GT)[None]))[0] - roi[0, :2]) / roi[0, 2] - 1.0),
        jnp.asarray(faces_t), cfg.sil_size, cfg.sil_sigma)
    sil = SilRefs(image_ref=jnp.broadcast_to(ref, (B,) + ref.shape),
                  keep_mask=jnp.ones((B, cfg.sil_size, cfg.sil_size)),
                  roi_xyb=jnp.asarray(roi))
    obj_t = jnp.asarray(np.tile(OBJ_CENTER_GT + np.array(
        [0.1, -0.05, 0.05], np.float32), (B, 1)))
    smpl_verts = jnp.asarray(
        HUM_CENTER + HUM_RADIUS * _sphere_mesh(r=1.0)[0][None].repeat(B, 0))
    r_fin, t_fin, losses = opt(
        jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), obj_t, jnp.ones(B),
        jnp.asarray(pts), smpl_verts,
        np.full(smpl_verts.shape[1], 11, np.int32), jnp.ones(B), sil,
        jnp.asarray(pts), jnp.asarray(faces_t))
    assert np.isfinite(np.asarray(losses)).all()
    err1 = np.linalg.norm(np.asarray(t_fin) - OBJ_CENTER_GT, axis=-1).mean()
    err0 = np.linalg.norm(np.asarray(obj_t) - OBJ_CENTER_GT, axis=-1).mean()
    assert err1 < err0, (err0, err1)


def test_smpl_query_subsampling(rng):
    """Subsampled-vertex smpl optimization still converges and is cheaper
    in traced query size."""
    model = S.random_smpl_model(0, num_joints=52, num_verts=96)
    reg = rng.rand(25, 96).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    lms = BodyLandmarks(body25=jnp.asarray(reg), face=jnp.asarray(reg[:1]),
                        hand=jnp.asarray(reg[:1]))
    bp = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hp = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                   rhand_prec=jnp.eye(45) * 0.1)
    cfg = JointFitConfig(iter_betas=1, iter_pose=1, iter_kpts=1,
                         smpl_max_iter=3, smpl_query_points=32)
    labels = rng.randint(0, 14, 96).astype(np.int32)
    seen = []

    def counting_query(ctx, points):
        seen.append(points.shape[1])
        return sphere_query_fn(ctx, points)

    def project_norm(ctx, joints):
        px = project_px(points=joints)
        cc = jnp.asarray([[1018.952, 779.486]])
        return 2.0 * (600.0 + px - cc[:, None, :]) / 1200.0 - 1.0

    opt = make_smpl_optimizer(counting_query, project_norm, model, lms, bp,
                              hp, labels, cfg)
    init = SMPLTParams.from_full(
        jnp.zeros((B, 156)), jnp.zeros((B, 10)),
        jnp.asarray(np.tile(HUM_CENTER + np.array([0.1, 0.0, 0.3], np.float32),
                            (B, 1))))
    kpts = jnp.concatenate([jnp.zeros((B, 25, 2)), jnp.ones((B, 25, 1))], -1)
    params, losses = opt(init, kpts)
    assert all(n == 32 for n in seen), seen  # only the subset queried
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sil_convergence_basin(rng):
    """Measured convergence basin of the soft-silhouette phase (the VERDICT
    round-1 concern that the 1-px sigma saturates for far-off inits): the
    min-edge-LINE sigmoid has long-range gradients (edge lines extend
    beyond the triangles), so a fixed release-sharpness sigma recovers
    inits ~2 object radii off — far outside mask overlap. Full sweep data
    in PERF_NOTES.md round 2 (0.45 m recovers, 0.6 m does not; stage-6
    inits come from the neural centers, centimeters off)."""
    verts_t, faces_t = _sphere_mesh()
    pts = jnp.asarray(verts_t[None].repeat(B, 0))
    sil_faces = jnp.asarray(faces_t)
    roi = np.tile(np.array([[700.0, 500.0, 700.0]], np.float32), (B, 1))
    gt_world = jnp.asarray(verts_t + OBJ_CENTER_GT)
    px = project_px(points=gt_world[None])[0]
    ndc = 2.0 * (px - roi[0, :2]) / roi[0, 2] - 1.0
    cfg = JointFitConfig(iter_obj=0, iter_sil=30, joint_max_iter=0,
                         sil_size=64, sil_sigma=1 / 32.0, w_trans=0.0)
    opt = make_object_optimizer(sphere_query_fn, project_px, cfg)
    ref = soft_silhouette(ndc, sil_faces, cfg.sil_size, cfg.sil_sigma)
    sil = SilRefs(image_ref=jnp.broadcast_to(ref, (B,) + ref.shape),
                  keep_mask=jnp.ones((B, cfg.sil_size, cfg.sil_size)),
                  roi_xyb=jnp.asarray(roi))
    smpl_verts = jnp.asarray(
        HUM_CENTER + HUM_RADIUS * _sphere_mesh(r=1.0)[0][None].repeat(B, 0))
    labels_h = np.full(smpl_verts.shape[1], 11, np.int32)
    # 0.45 m lateral offset = no silhouette overlap (radius 0.25 m)
    offset = np.array([0.32, -0.32, 0.0], np.float32)
    obj_t = jnp.asarray(np.tile(OBJ_CENTER_GT + offset, (B, 1)))
    obj_r = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    r_fin, t_fin, _ = opt(obj_r, obj_t, jnp.ones((B,)), pts, smpl_verts,
                          labels_h, jnp.ones((B,)), sil, pts, sil_faces)
    err = np.linalg.norm(np.asarray(t_fin)[:, :2] - OBJ_CENTER_GT[:2],
                         axis=-1).mean()
    assert err < 0.05, err
    np.testing.assert_allclose(np.linalg.det(np.asarray(r_fin)), 1.0,
                               atol=1e-4)


def _object_problem(rng, cfg):
    """Shared object-fit problem setup for the segmentation tests."""
    verts_t, faces_t = _sphere_mesh()
    pts = verts_t[None].repeat(B, 0)
    roi = np.tile(np.array([[700.0, 500.0, 700.0]], np.float32), (B, 1))
    ref = soft_silhouette(
        jnp.asarray(2.0 * (np.asarray(project_px(points=jnp.asarray(
            verts_t + OBJ_CENTER_GT)[None]))[0]
            - roi[0, :2]) / roi[0, 2] - 1.0),
        jnp.asarray(faces_t), cfg.sil_size, cfg.sil_sigma)
    sil = SilRefs(image_ref=jnp.broadcast_to(ref, (B,) + ref.shape),
                  keep_mask=jnp.ones((B, cfg.sil_size, cfg.sil_size)),
                  roi_xyb=jnp.asarray(roi))
    obj_t = jnp.asarray(np.tile(OBJ_CENTER_GT + np.array(
        [0.1, -0.05, 0.05], np.float32), (B, 1)))
    smpl_verts = jnp.asarray(
        HUM_CENTER + HUM_RADIUS * _sphere_mesh(r=1.0)[0][None].repeat(B, 0))
    args = (jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), obj_t, jnp.ones(B),
            jnp.asarray(pts), smpl_verts,
            np.full(smpl_verts.shape[1], 11, np.int32), jnp.ones(B), sil,
            jnp.asarray(pts), jnp.asarray(faces_t))
    return args


def test_object_optimizer_segmented_matches_single_program(rng):
    """segment_iters executes the SAME per-iteration math as the one-shot
    jit program (host-carried Adam state/decay/early-stop); results must
    match. This is the execution mode for full reference budgets on the
    axon tunnel, which kills multi-minute single device programs."""
    cfg = JointFitConfig(iter_obj=5, iter_sil=3, joint_max_iter=7,
                         sil_size=64, sil_sigma=1 / 32.0)
    args = _object_problem(rng, cfg)
    r1, t1, _ = make_object_optimizer(sphere_query_fn, project_px,
                                      cfg)(*args)
    # seg=2 does not divide any phase budget -> exercises partial segments
    r2, t2, _ = make_object_optimizer(sphere_query_fn, project_px, cfg,
                                      segment_iters=2)(*args)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-5)


def test_object_optimizer_segmented_early_stop(rng):
    """Early stopping inside the segmented runner stops at the same
    iteration as the while_loop program."""
    cfg = JointFitConfig(iter_obj=3, iter_sil=1, joint_max_iter=20,
                         sil_size=64, sil_sigma=1 / 32.0, early_stop=True,
                         early_stop_min_frac=0.1)
    args = _object_problem(rng, cfg)
    r1, t1, _ = make_object_optimizer(sphere_query_fn, project_px,
                                      cfg)(*args)
    r2, t2, _ = make_object_optimizer(sphere_query_fn, project_px, cfg,
                                      segment_iters=3)(*args)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-5)


def test_smpl_optimizer_segmented_matches_single_program(rng):
    model = S.random_smpl_model(0, num_joints=52, num_verts=96)
    reg = rng.rand(25, 96).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    lms = BodyLandmarks(body25=jnp.asarray(reg), face=jnp.asarray(reg[:1]),
                        hand=jnp.asarray(reg[:1]))
    bp = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hp = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                   rhand_prec=jnp.eye(45) * 0.1)
    cfg = JointFitConfig(iter_betas=1, iter_pose=1, iter_kpts=1,
                         smpl_max_iter=3)
    labels = rng.randint(0, 14, 96).astype(np.int32)

    def project_norm(ctx, joints):
        px = project_px(points=joints)
        cc = jnp.asarray([[1018.952, 779.486]])
        return 2.0 * (600.0 + px - cc[:, None, :]) / 1200.0 - 1.0

    init = SMPLTParams.from_full(
        jnp.zeros((B, 156)), jnp.zeros((B, 10)),
        jnp.asarray(np.tile(HUM_CENTER + np.array([0.1, 0.0, 0.3],
                                                  np.float32), (B, 1))))
    kpts = jnp.concatenate(
        [jnp.zeros((B, 25, 2)), jnp.ones((B, 25, 1))], -1)
    p1, _ = make_smpl_optimizer(sphere_query_fn, project_norm, model, lms,
                                bp, hp, labels, cfg)(init, kpts)
    p2, _ = make_smpl_optimizer(sphere_query_fn, project_norm, model, lms,
                                bp, hp, labels, cfg,
                                segment_iters=2)(init, kpts)
    np.testing.assert_allclose(np.asarray(p1.trans), np.asarray(p2.trans),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1.pose), np.asarray(p2.pose),
                               atol=2e-5)


def test_ocent_term_live(rng):
    """--ocent anchors the object centroid to its INITIAL translation (the
    stage-4 neural center): with a dominant weight the final translation
    stays at the init even though the df/sil losses pull toward the GT
    sphere; with weight 0 (reference release parity,
    recon_fit_trivis_full.py:141) the fit moves to the GT."""
    verts_t, faces_t = _sphere_mesh()
    pts = jnp.asarray(verts_t[None].repeat(B, 0))
    roi = np.tile(np.array([[700.0, 500.0, 700.0]], np.float32), (B, 1))
    ref = soft_silhouette(
        jnp.asarray(2.0 * (np.asarray(project_px(points=jnp.asarray(
            verts_t + OBJ_CENTER_GT)[None]))[0] - roi[0, :2])
            / roi[0, 2] - 1.0),
        jnp.asarray(faces_t), 32, 1 / 16.0)
    sil = SilRefs(image_ref=jnp.broadcast_to(ref, (B,) + ref.shape),
                  keep_mask=jnp.ones((B, 32, 32)),
                  roi_xyb=jnp.asarray(roi))
    t_init = OBJ_CENTER_GT + np.array([0.15, -0.1, 0.1], np.float32)
    args_common = (jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                   jnp.asarray(np.tile(t_init, (B, 1))), jnp.ones(B), pts,
                   jnp.asarray(HUM_CENTER + HUM_RADIUS
                               * _sphere_mesh(r=1.0)[0][None].repeat(B, 0)),
                   np.full(verts_t.shape[0], 11, np.int32), jnp.ones(B),
                   sil, pts, jnp.asarray(faces_t))
    kw = dict(iter_obj=8, iter_sil=2, joint_max_iter=8, sil_size=32,
              sil_sigma=1 / 16.0)
    t_off = np.asarray(make_object_optimizer(
        sphere_query_fn, project_px, JointFitConfig(**kw))(*args_common)[1])
    t_anchor = np.asarray(make_object_optimizer(
        sphere_query_fn, project_px,
        JointFitConfig(w_ocent=1e6, **kw))(*args_common)[1])
    d_off = np.linalg.norm(t_off - t_init, axis=-1).mean()
    d_anchor = np.linalg.norm(t_anchor - t_init, axis=-1).mean()
    assert d_off > 0.02, d_off          # parity path moves off the init
    assert d_anchor < d_off * 0.2, (d_off, d_anchor)  # anchor holds it


def test_term_probe_gradient_attribution(rng):
    """term_probe (the stage-6 translation-attribution diagnostic,
    scripts/ablate_stage6_terms.py): on the analytic sphere scene with the
    object displaced from GT, the df term's descent direction must point
    TOWARD the GT center (positive pull), and every reported gradient must
    match a finite-difference of its weighted term."""
    verts_t, faces_t = _sphere_mesh()
    pts = jnp.asarray(verts_t[None].repeat(B, 0))
    cfg = JointFitConfig(sil_size=32, sil_sigma=1 / 16.0)
    opt = make_object_optimizer(sphere_query_fn, project_px, cfg)

    roi = np.tile(np.array([[700.0, 500.0, 700.0]], np.float32), (B, 1))
    ref = soft_silhouette(
        jnp.asarray(2.0 * (np.asarray(project_px(points=jnp.asarray(
            verts_t + OBJ_CENTER_GT)[None]))[0] - roi[0, :2])
            / roi[0, 2] - 1.0),
        jnp.asarray(faces_t), 32, 1 / 16.0)
    sil = SilRefs(image_ref=jnp.broadcast_to(ref, (B,) + ref.shape),
                  keep_mask=jnp.ones((B, 32, 32)),
                  roi_xyb=jnp.asarray(roi))
    off = np.array([0.15, -0.1, 0.1], np.float32)
    params = {"obj_r": jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
              "obj_t": jnp.asarray(np.tile(OBJ_CENTER_GT + off, (B, 1)))}
    smpl_verts = jnp.asarray(HUM_CENTER + HUM_RADIUS
                             * _sphere_mesh(r=1.0)[0][None].repeat(B, 0))
    env = dict(obj_points=pts, obj_s=jnp.ones(B), occ=jnp.ones(B),
               ctx=None, smpl_verts=smpl_verts,
               labels_h=jnp.asarray(np.full(verts_t.shape[0], 11,
                                            np.int32)),
               labels_o=jnp.full(pts.shape[:2], 11, jnp.int32),
               mask_h=jnp.ones(smpl_verts.shape[:2], bool),
               mask_o=jnp.ones(pts.shape[:2], bool),
               sil=sil, sil_verts=pts, sil_faces=jnp.asarray(faces_t),
               ocent_target=params["obj_t"])
    res = opt.term_probe(params, env)
    assert {"object", "mask", "contact", "ocent"} <= set(res)
    d = -off / np.linalg.norm(off)  # unit direction toward GT
    val_obj, g_obj = res["object"]
    pull = -(np.asarray(g_obj) * d).sum(1)
    assert (pull > 0).all(), pull  # df descent points toward the GT sphere
    # ocent at the anchor point: zero value, zero gradient
    val_oc, g_oc = res["ocent"]
    np.testing.assert_allclose(np.asarray(g_oc), 0.0, atol=1e-6)
    # every grad matches a central finite difference of its term
    for name, (val, g) in res.items():
        e = np.zeros((B, 3), np.float32)
        e[0, 0] = 1e-3

        def term_at(t):
            env2 = dict(env)
            r2 = opt.term_probe({"obj_r": params["obj_r"],
                                 "obj_t": jnp.asarray(t)}, env2)
            return float(r2[name][0])

        t0 = np.asarray(params["obj_t"])
        fd = (term_at(t0 + e) - term_at(t0 - e)) / 2e-3
        np.testing.assert_allclose(float(np.asarray(g)[0, 0]), fd,
                                   rtol=0.05, atol=1e-4, err_msg=name)
