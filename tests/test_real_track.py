"""End-to-end real-data pipeline test on a fabricated BEHAVE-layout
sequence: exercises the frame readers, image preprocessing, every stage of
cli/real_track.py, and the packed output contract."""
import json
import os
import pickle

import numpy as np
import pytest
import jax.numpy as jnp

from vistracker_tpu.utils.mesh import save_ply


def _make_fake_smplh_pkl(path, rng, V=128, J=52):
    from vistracker_tpu.core.smpl import SMPLH_PARENTS
    kintree = np.zeros((2, J), np.int64)
    kintree[0] = np.asarray(SMPLH_PARENTS)
    kintree[0, 0] = 2 ** 32 - 1  # root marker like released models
    kintree[1] = np.arange(J)
    w = rng.rand(V, J) ** 4
    w /= w.sum(1, keepdims=True)
    jr = rng.rand(J, V)
    jr /= jr.sum(1, keepdims=True)
    data = dict(
        v_template=rng.randn(V, 3) * 0.3,
        shapedirs=rng.randn(V, 3, 16) * 0.01,
        posedirs=rng.randn(V, 3, 9 * (J - 1)) * 0.001,
        J_regressor=jr,
        weights=w,
        f=rng.randint(0, V, (2 * V, 3)),
        kintree_table=kintree,
        betas=np.zeros(16),
        gender="male",
    )
    with open(path, "wb") as f:
        pickle.dump(data, f)


def _make_fake_assets(root, rng, V=128):
    os.makedirs(os.path.join(root, "priors"), exist_ok=True)
    import scipy.sparse as sp
    for name, k in (("body25_regressor", 25), ("face_regressor", 70),
                    ("hand_regressor", 42)):
        reg = rng.rand(V, k)
        reg /= reg.sum(0, keepdims=True)
        with open(os.path.join(root, f"{name}.pkl"), "wb") as f:
            pickle.dump(sp.coo_matrix(reg), f)
    parts = {}
    ids = np.arange(V)
    for i, nm in enumerate(["head", "left_foot", "left_forearm", "left_leg",
                            "left_midarm", "left_upperarm", "right_foot",
                            "right_forearm", "right_leg", "right_midarm",
                            "right_upperarm", "torso", "upper_left_leg",
                            "upper_right_leg"]):
        parts[nm] = ids[ids % 14 == i]
    with open(os.path.join(root, "smpl_parts_dense.pkl"), "wb") as f:
        pickle.dump(parts, f)
    with open(os.path.join(root, "priors", "body_prior.pkl"), "wb") as f:
        pickle.dump(dict(mean=np.zeros(63), precision=np.eye(63) * 0.1), f)
    for nm in ("lh_prior.pkl", "rh_prior.pkl"):
        with open(os.path.join(root, "priors", nm), "wb") as f:
            pickle.dump(dict(mean=np.zeros(45), precision=np.eye(45) * 0.1), f)


def _make_fake_sequence(seq_dir, rng, T=4, img_hw=(96, 128), kid=1,
                        cat="boxsmall", kinects=(0, 1, 2, 3)):
    from PIL import Image
    os.makedirs(seq_dir, exist_ok=True)
    with open(os.path.join(seq_dir, "info.json"), "w") as f:
        json.dump(dict(cat=cat, gender="male", kinects=list(kinects),
                       config=None, empty=None, intrinsic=None,
                       beta=[0.0] * 10), f)
    H, W = img_hw
    for i in range(T):
        fd = os.path.join(seq_dir, f"t{i:04d}.000")
        os.makedirs(fd, exist_ok=True)
        rgb = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(fd, f"k{kid}.color.jpg"))
        pm = np.zeros((H, W), np.uint8)
        pm[H // 4:3 * H // 4, W // 4:W // 2] = 255
        Image.fromarray(pm).save(os.path.join(fd, f"k{kid}.person_mask.png"))
        om = np.zeros((H, W), np.uint8)
        om[H // 3:2 * H // 3, W // 2:3 * W // 4] = 255
        Image.fromarray(om).save(os.path.join(fd, f"k{kid}.obj_rend_mask.png"))
        kpts = np.concatenate(
            [rng.rand(25, 1) * W, rng.rand(25, 1) * H,
             np.ones((25, 1))], -1)
        with open(os.path.join(fd, f"k{kid}.color.json"), "w") as f:
            json.dump(dict(body_joints=kpts.reshape(-1).tolist()), f)
        with open(os.path.join(fd, f"k{kid}.mocap.json"), "w") as f:
            json.dump(dict(pose=(rng.randn(72) * 0.1).tolist(),
                           betas=np.zeros(10).tolist()), f)


def test_real_track_pipeline(tmp_path, rng):
    from vistracker_tpu.cli.main import build_parser
    from vistracker_tpu.cli.real_track import run_real_track
    from vistracker_tpu.data.packed import load_packed_recon
    from vistracker_tpu.cli.synthetic import box_mesh

    seq = str(tmp_path / "Date09_Sub99_boxsmall")
    _make_fake_sequence(seq, rng, T=4)
    assets = str(tmp_path / "assets")
    _make_fake_assets(assets, rng)
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    obj_root = str(tmp_path / "objects")
    os.makedirs(os.path.join(obj_root, "boxsmall"), exist_ok=True)
    bv, bf = box_mesh()
    save_ply(os.path.join(obj_root, "boxsmall", "boxsmall.ply"),
             bv + np.array([0.1, 0.0, 2.3], np.float32), bf)

    args = build_parser().parse_args([
        "track", "--seq", seq, "--out", str(tmp_path / "out"),
        "--smpl-model", smpl_pkl, "--assets", assets,
        "--objects-root", obj_root, "--sifnet-ckpt", "random",
        "--infiller-ckpt", "random", "--tiny-nets",
        "--chunk-size", "4", "--net-size", "32", "--crop-size", "96",
        # bf16 feature cache exercised end-to-end (models/sifnet.cast_cache)
        "--cache-dtype", "bfloat16",
        "--save-name", "smoke"])
    # shrink the optimization budgets: run_real_track resolves the config
    # classes at call time from their modules, so patching there works
    import functools
    import vistracker_tpu.fit.smplt as smplt_mod
    import vistracker_tpu.fit.joint as joint_mod
    import vistracker_tpu.fit.generator as gen_mod
    orig = (smplt_mod.SMPLTFitConfig, joint_mod.JointFitConfig,
            gen_mod.GeneratorConfig)
    try:
        smplt_mod.SMPLTFitConfig = lambda *a, **k: orig[0](
            global_iters=1, max_iters=2)
        joint_mod.JointFitConfig = functools.partial(
            orig[1], iter_betas=1, iter_pose=1, iter_kpts=1, smpl_max_iter=1,
            iter_obj=1, iter_sil=1, joint_max_iter=1, sil_size=32,
            sil_sigma=1 / 16.0)
        gen_mod.GeneratorConfig = functools.partial(
            orig[2], num_steps=2, num_rounds=1, samples_per_round=256,
            num_points=64)
        outfile = run_real_track(args)
    finally:
        smplt_mod.SMPLTFitConfig, joint_mod.JointFitConfig, \
            gen_mod.GeneratorConfig = orig

    rec = load_packed_recon(outfile)
    assert rec.num_frames == 4
    assert rec.poses.shape == (4, 156)
    assert rec.obj_angles.shape == (4, 3, 3)
    assert np.isfinite(rec.poses).all()
    assert np.isfinite(rec.obj_trans).all()
    det = np.linalg.det(rec.obj_angles)
    np.testing.assert_allclose(det, 1.0, atol=1e-3)
    assert rec.frames == [f"t{i:04d}.000" for i in range(4)]


def test_real_track_full_sequence_stages(tmp_path, rng):
    """Stages 2 and 5 must run over the WHOLE sequence, not per chunk:
    SmoothNet windows (smooth_base.py:45-72) and the HVOP-Net 30-frame
    autoregressive context (test_infill_autoreg.py:117-165) cross chunk
    boundaries in the reference. On a 3-chunk sequence each temporal stage
    must be invoked exactly once with all T frames, making the stage-2/5
    outputs independent of --chunk-size by construction."""
    from vistracker_tpu.cli.main import build_parser
    from vistracker_tpu.cli.real_track import run_real_track
    from vistracker_tpu.data.packed import load_packed_recon
    from vistracker_tpu.cli.synthetic import box_mesh

    T = 9
    seq = str(tmp_path / "Date09_Sub97_boxsmall")
    _make_fake_sequence(seq, rng, T=T)
    assets = str(tmp_path / "assets")
    _make_fake_assets(assets, rng)
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    obj_root = str(tmp_path / "objects")
    os.makedirs(os.path.join(obj_root, "boxsmall"), exist_ok=True)
    bv, bf = box_mesh()
    save_ply(os.path.join(obj_root, "boxsmall", "boxsmall.ply"),
             bv + np.array([0.1, 0.0, 2.3], np.float32), bf)

    args = build_parser().parse_args([
        "track", "--seq", seq, "--out", str(tmp_path / "out"),
        "--smpl-model", smpl_pkl, "--assets", assets,
        "--objects-root", obj_root, "--sifnet-ckpt", "random",
        "--infiller-ckpt", "random", "--smoothnet-smpl-ckpt", "random",
        "--smoothnet-objrot-ckpt", "random", "--tiny-nets",
        "--chunk-size", "3", "--net-size", "32", "--crop-size", "96",
        "--save-name", "fullseq"])

    import functools
    import vistracker_tpu.fit.smplt as smplt_mod
    import vistracker_tpu.fit.joint as joint_mod
    import vistracker_tpu.fit.generator as gen_mod
    import vistracker_tpu.fit.smoothing as smoothing_mod
    import vistracker_tpu.fit.infill as infill_mod
    calls = {"smooth_smplt": [], "smooth_objrot": [], "infill": []}
    orig = (smplt_mod.SMPLTFitConfig, joint_mod.JointFitConfig,
            gen_mod.GeneratorConfig, smoothing_mod.smooth_smplt,
            smoothing_mod.smooth_objrot, infill_mod.make_infiller)

    def rec_smooth_smplt(params, poses, betas, trans, **kw):
        calls["smooth_smplt"].append(len(poses))
        return orig[3](params, poses, betas, trans, **kw)

    def rec_smooth_objrot(params, rot, **kw):
        calls["smooth_objrot"].append(len(rot))
        return orig[4](params, rot, **kw)

    def rec_make_infiller(model, cfg):
        run = orig[5](model, cfg)

        def wrapped(params, poses, trans, rot, occ, **kw):
            calls["infill"].append(len(poses))
            return run(params, poses, trans, rot, occ, **kw)
        return wrapped

    try:
        smplt_mod.SMPLTFitConfig = lambda *a, **k: orig[0](
            global_iters=1, max_iters=1)
        joint_mod.JointFitConfig = functools.partial(
            orig[1], iter_betas=1, iter_pose=1, iter_kpts=1, smpl_max_iter=1,
            iter_obj=1, iter_sil=1, joint_max_iter=1, sil_size=32,
            sil_sigma=1 / 16.0)
        gen_mod.GeneratorConfig = functools.partial(
            orig[2], num_steps=2, num_rounds=1, samples_per_round=128,
            num_points=32)
        smoothing_mod.smooth_smplt = rec_smooth_smplt
        smoothing_mod.smooth_objrot = rec_smooth_objrot
        infill_mod.make_infiller = rec_make_infiller
        outfile = run_real_track(args)
    finally:
        (smplt_mod.SMPLTFitConfig, joint_mod.JointFitConfig,
         gen_mod.GeneratorConfig, smoothing_mod.smooth_smplt,
         smoothing_mod.smooth_objrot, infill_mod.make_infiller) = orig

    # each temporal stage ran ONCE over the full sequence (not per chunk)
    assert calls["smooth_smplt"] == [T], calls
    assert calls["smooth_objrot"] == [T], calls
    assert calls["infill"] == [T], calls
    rec = load_packed_recon(outfile)
    assert rec.num_frames == T
    assert np.isfinite(rec.poses).all()
    assert np.isfinite(rec.obj_trans).all()


def test_real_track_neural_only(tmp_path, rng):
    """--neural-only stops after stage 4 and packs neural outputs."""
    from vistracker_tpu.cli.main import build_parser
    from vistracker_tpu.cli.real_track import run_real_track
    from vistracker_tpu.data.packed import load_packed
    from vistracker_tpu.cli.synthetic import box_mesh

    seq = str(tmp_path / "Date09_Sub98_boxsmall")
    _make_fake_sequence(seq, rng, T=3)
    assets = str(tmp_path / "assets")
    _make_fake_assets(assets, rng)
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    obj_root = str(tmp_path / "objects")
    os.makedirs(os.path.join(obj_root, "boxsmall"), exist_ok=True)
    bv, bf = box_mesh()
    save_ply(os.path.join(obj_root, "boxsmall", "boxsmall.ply"),
             bv + np.array([0.1, 0.0, 2.3], np.float32), bf)

    args = build_parser().parse_args([
        "track", "--seq", seq, "--out", str(tmp_path / "out"),
        "--smpl-model", smpl_pkl, "--assets", assets,
        "--objects-root", obj_root, "--sifnet-ckpt", "random",
        "--infiller-ckpt", "random", "--tiny-nets", "--neural-only",
        "--chunk-size", "3", "--net-size", "32", "--crop-size", "96",
        "--save-name", "neural"])
    import functools
    import vistracker_tpu.fit.smplt as smplt_mod
    import vistracker_tpu.fit.generator as gen_mod
    orig = (smplt_mod.SMPLTFitConfig, gen_mod.GeneratorConfig)
    try:
        smplt_mod.SMPLTFitConfig = lambda *a, **k: orig[0](
            global_iters=1, max_iters=2)
        gen_mod.GeneratorConfig = functools.partial(
            orig[1], num_steps=2, num_rounds=1, samples_per_round=128,
            num_points=32)
        outfile = run_real_track(args)
    finally:
        smplt_mod.SMPLTFitConfig, gen_mod.GeneratorConfig = orig
    d = load_packed(outfile)
    assert np.asarray(d["neural_pca"]).shape == (3, 3, 3)
    assert np.asarray(d["neural_visibility"]).shape == (3,)
    assert np.isfinite(np.asarray(d["neural_trans"])).all()


def test_intercap_camera_parity():
    """intercap_camera must reproduce get_intercap_K (nr_utils.py:224-240)
    and the tri-icap.json camera_params exactly."""
    from vistracker_tpu.core.camera import intercap_camera
    cam = intercap_camera(kid=0, crop_size=800)
    # tri-icap.json camera_params (normalized by width 1920)
    # (the json values are themselves rounded; compare at their precision)
    assert abs(cam.fx - 0.4783633) < 1e-6
    assert abs(cam.fy - 0.478352604) < 1e-6
    assert abs(cam.cx - 0.498419) < 1e-6
    assert abs(cam.cy - 0.28955) < 1e-5
    assert cam.width == 1920 and cam.height == 1080
    assert cam.crop_size == 800
    # pixel-space projection: fx_px == the raw InterCap focal
    assert abs(cam.fx_px - 918.457763671875) < 1e-3
    pts = jnp.asarray([[[0.2, -0.1, 2.0]]])
    pix = np.asarray(cam.project_screen(pts))[0, 0]
    np.testing.assert_allclose(
        pix, [918.457763671875 * 0.1 + 956.9661865234375,
              918.4373779296875 * -0.05 + 555.944580078125], rtol=1e-5)
    # each kid has distinct intrinsics
    assert intercap_camera(kid=3).fx != cam.fx


def test_icap_config_camera_from_json(tmp_path):
    """camera_config_from_json maps tri-icap camera_params (chore.py:88-93
    dispatch: camera_params present -> InterCap, absent -> BEHAVE)."""
    from vistracker_tpu.config import camera_config_from_json
    icap = dict(loadSize=800, camera_params=dict(
        crop_size=800, fx=0.4783633, fy=0.478352604, cx=0.498419,
        cy=0.28955, image_width=1920, image_height=1080))
    cam = camera_config_from_json(icap)
    assert cam.width == 1920 and cam.crop_size == 800
    behave = dict(loadSize=1200)
    cam2 = camera_config_from_json(behave)
    assert cam2.width == 2048 and cam2.crop_size == 1200
    assert abs(cam2.fx - 979.7844 / 2048.0) < 1e-9


def test_real_track_intercap_pipeline(tmp_path, rng):
    """Config-switched InterCap tracking: ICap sequence naming, kid 0,
    InterCap camera, flat-template layout."""
    from vistracker_tpu.cli.main import build_parser
    from vistracker_tpu.cli.real_track import run_real_track
    from vistracker_tpu.data.packed import load_packed_recon
    from vistracker_tpu.cli.synthetic import box_mesh

    seq = str(tmp_path / "ICapS01_sub01_obj01_Seg_0")
    _make_fake_sequence(seq, rng, T=3, kid=0, cat="obj01",
                        kinects=(0, 1, 2, 3, 4, 5))
    assets = str(tmp_path / "assets")
    _make_fake_assets(assets, rng)
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    obj_root = str(tmp_path / "objects")
    os.makedirs(obj_root, exist_ok=True)
    bv, bf = box_mesh()
    # InterCap templates are flat files (behave/utils.py:126-139 layout)
    save_ply(os.path.join(obj_root, "obj01.ply"),
             bv + np.array([0.1, 0.0, 2.3], np.float32), bf)

    args = build_parser().parse_args([
        "track", "--seq", seq, "--out", str(tmp_path / "out"),
        "--smpl-model", smpl_pkl, "--assets", assets,
        "--objects-root", obj_root, "--sifnet-ckpt", "random",
        "--infiller-ckpt", "random", "--tiny-nets",
        "--dataset", "intercap", "--kid", "0",
        "--chunk-size", "3", "--net-size", "32", "--crop-size", "96",
        "--save-name", "icap"])
    import functools
    import vistracker_tpu.fit.smplt as smplt_mod
    import vistracker_tpu.fit.joint as joint_mod
    import vistracker_tpu.fit.generator as gen_mod
    orig = (smplt_mod.SMPLTFitConfig, joint_mod.JointFitConfig,
            gen_mod.GeneratorConfig)
    cams_used = []
    import vistracker_tpu.core.camera as cam_mod
    orig_icap = cam_mod.intercap_camera

    def rec_icap(**kw):
        cam = orig_icap(**kw)
        cams_used.append(cam)
        return cam

    try:
        smplt_mod.SMPLTFitConfig = lambda *a, **k: orig[0](
            global_iters=1, max_iters=1)
        joint_mod.JointFitConfig = functools.partial(
            orig[1], iter_betas=1, iter_pose=1, iter_kpts=1, smpl_max_iter=1,
            iter_obj=1, iter_sil=1, joint_max_iter=1, sil_size=32,
            sil_sigma=1 / 16.0)
        gen_mod.GeneratorConfig = functools.partial(
            orig[2], num_steps=2, num_rounds=1, samples_per_round=128,
            num_points=32)
        cam_mod.intercap_camera = rec_icap
        outfile = run_real_track(args)
    finally:
        (smplt_mod.SMPLTFitConfig, joint_mod.JointFitConfig,
         gen_mod.GeneratorConfig) = orig
        cam_mod.intercap_camera = orig_icap

    # the InterCap camera (kid 0) was selected by the config switch
    assert len(cams_used) == 1 and cams_used[0].width == 1920
    rec = load_packed_recon(outfile)
    assert rec.num_frames == 3
    assert np.isfinite(rec.poses).all()
    assert np.isfinite(rec.obj_trans).all()
    assert "obj01" in outfile


def test_real_track_shard_frames(tmp_path, rng):
    """--shard-frames runs every heavy stage with the chunk's frame axis
    sharded over the 8-device CPU mesh, including the pad-to-multiple path
    (T=4 chunks pad to 8). Numeric parity of the sharded fit programs is
    pinned separately by tests/test_sharding.py; this asserts the full
    pipeline wiring executes and produces a sane pack."""
    import functools
    import jax
    from vistracker_tpu.cli.main import build_parser
    from vistracker_tpu.cli.real_track import run_real_track
    from vistracker_tpu.data.packed import load_packed_recon
    from vistracker_tpu.cli.synthetic import box_mesh

    assert len(jax.devices()) == 8  # conftest forces the virtual mesh

    seq = str(tmp_path / "Date09_Sub96_boxsmall")
    _make_fake_sequence(seq, rng, T=4)
    assets = str(tmp_path / "assets")
    _make_fake_assets(assets, rng)
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    obj_root = str(tmp_path / "objects")
    os.makedirs(os.path.join(obj_root, "boxsmall"), exist_ok=True)
    bv, bf = box_mesh()
    save_ply(os.path.join(obj_root, "boxsmall", "boxsmall.ply"),
             bv + np.array([0.1, 0.0, 2.3], np.float32), bf)

    args = build_parser().parse_args([
        "track", "--seq", seq, "--out", str(tmp_path / "out"),
        "--smpl-model", smpl_pkl, "--assets", assets,
        "--objects-root", obj_root, "--sifnet-ckpt", "random",
        "--infiller-ckpt", "random", "--tiny-nets", "--shard-frames",
        "--chunk-size", "4", "--net-size", "32", "--crop-size", "96",
        "--save-name", "sharded"])
    import vistracker_tpu.fit.smplt as smplt_mod
    import vistracker_tpu.fit.joint as joint_mod
    import vistracker_tpu.fit.generator as gen_mod
    orig = (smplt_mod.SMPLTFitConfig, joint_mod.JointFitConfig,
            gen_mod.GeneratorConfig)
    try:
        smplt_mod.SMPLTFitConfig = lambda *a, **k: orig[0](
            global_iters=1, max_iters=2)
        joint_mod.JointFitConfig = functools.partial(
            orig[1], iter_betas=1, iter_pose=1, iter_kpts=1, smpl_max_iter=1,
            iter_obj=1, iter_sil=1, joint_max_iter=1, sil_size=32,
            sil_sigma=1 / 16.0)
        gen_mod.GeneratorConfig = functools.partial(
            orig[2], num_steps=2, num_rounds=1, samples_per_round=256,
            num_points=64)
        outfile = run_real_track(args)
    finally:
        smplt_mod.SMPLTFitConfig, joint_mod.JointFitConfig, \
            gen_mod.GeneratorConfig = orig

    rec = load_packed_recon(outfile)
    assert rec.num_frames == 4
    assert np.isfinite(rec.poses).all()
    assert np.isfinite(rec.obj_trans).all()
    np.testing.assert_allclose(np.linalg.det(rec.obj_angles), 1.0,
                               atol=1e-3)
