"""Offline-npz training data + TestData depth-rescale path
(data/offline.py vs train_data.py / test_data.py / boundary_sampler.py)."""
import json
import os
import pickle

import numpy as np
import pytest

from vistracker_tpu.data.offline import (MEAN_CROP_CENTER, offline_example,
                                         prepare_test_crop,
                                         save_boundary_npz)
from vistracker_tpu.data.sampling import FLIP_PARTS, MeshDistance
from vistracker_tpu.utils.mesh import save_ply


def _box(center, half, seed=0):
    from vistracker_tpu.cli.synthetic import box_mesh
    v, f = box_mesh()
    return (v * half * 2 + np.asarray(center, np.float32)).astype(
        np.float32), f


def _write_frame_images(fd, rng, H=64, W=80, kid=1):
    from PIL import Image
    os.makedirs(fd, exist_ok=True)
    rgb_file = os.path.join(fd, f"k{kid}.color.jpg")
    Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(rgb_file)
    pm = np.zeros((H, W), np.uint8)
    pm[H // 4:3 * H // 4, W // 8:W // 2] = 255
    Image.fromarray(pm).save(os.path.join(fd, f"k{kid}.person_mask.png"))
    om = np.zeros((H, W), np.uint8)
    om[H // 3:2 * H // 3, W // 2:7 * W // 8] = 255
    Image.fromarray(om).save(os.path.join(fd, f"k{kid}.obj_rend_mask.png"))
    return rgb_file


def _save_npzs(tmp_path, rng, rgb_file, sample_num=400):
    sv, sf = _box([0.0, 0.0, 2.2], 0.4)
    ov, of = _box([0.5, 0.0, 2.4], 0.15)
    parts = (np.arange(len(sv)) % 14).astype(np.uint8)
    out = str(tmp_path / "frame_0000.npz")
    kw = dict(smpl_verts=sv, smpl_faces=sf, obj_verts=ov, obj_faces=of,
              part_labels=parts, body_center=np.array([0.0, 0.0, 2.2]),
              body_kpts=rng.rand(25, 3).astype(np.float32),
              image_file=rgb_file, sample_num=sample_num,
              add_neighbours=True)
    save_boundary_npz(out, rng=np.random.RandomState(1), **kw)
    save_boundary_npz(str(tmp_path / "frame_0000_flip.npz"), flip=True,
                      rng=np.random.RandomState(1), **kw)
    return out, (sv, sf, ov, of, parts)


def test_boundary_npz_schema(tmp_path, rng):
    """The on-disk schema matches boundary_sample_all + the image_file key
    (train_data.py reads data['points'].item()['sigma<float>'] etc.)."""
    rgb_file = _write_frame_images(str(tmp_path / "t0000.000"), rng)
    out, (sv, sf, ov, of, parts) = _save_npzs(tmp_path, rng, rgb_file)
    data = np.load(out, allow_pickle=True)
    for key in ("points", "dist_h", "dist_o", "parts", "pca_axis",
                "smpl_center", "body_kpts", "obj_center", "image_file",
                "neighbours_h", "neighbours_o"):
        assert key in data.files
    total = 400
    for s, r in ((0.08, 0.01), (0.02, 0.49), (0.003, 0.5)):
        bucket = data["points"].item()[f"sigma{s}"]
        # get_sample_num floor: max(int(r*N), N//2), plus 1/16 grid samples
        n_surf = max(int(r * total), total // 2)
        assert bucket.shape == (n_surf + int(n_surf / 16.0), 3)
        assert data["parts"].item()[f"sigma{s}"].dtype == np.uint8
        # distances are exact unsigned mesh distances
        md = MeshDistance(sv, sf)
        d, _ = md.query(bucket)
        np.testing.assert_allclose(data["dist_h"].item()[f"sigma{s}"], d,
                                   atol=1e-5)
    assert data["pca_axis"].shape == (3, 3)
    assert str(data["image_file"]) == rgb_file


def test_offline_example_layout(tmp_path, rng):
    rgb_file = _write_frame_images(str(tmp_path / "t0000.000"), rng)
    out, _ = _save_npzs(tmp_path, rng, rgb_file)
    ex = offline_example(out, total_samples=200, crop_size=48, net_size=24,
                         rng=np.random.RandomState(3))
    assert ex["images"].shape == (24, 24, 5)
    n = 2 + 98 + 100  # int(200*r) per sigma bucket
    assert ex["points"].shape == (n, 3)
    assert ex["df_h"].shape == (n,) and ex["df_o"].shape == (n,)
    assert ex["parts"].shape == (n,) and ex["parts"].dtype == np.int32
    assert ex["pca"].shape == (n, 3, 3)
    # obj_center is relative to the body center (train_data.py:134-136)
    np.testing.assert_allclose(ex["obj_center"],
                               np.array([0.5, 0.0, 0.2]), atol=1e-5)
    assert ex["crop_center"].shape == (2,)


def test_offline_example_flip(tmp_path, rng):
    rgb_file = _write_frame_images(str(tmp_path / "t0000.000"), rng)
    out, _ = _save_npzs(tmp_path, rng, rgb_file)
    ex = offline_example(out, total_samples=200, crop_size=48, net_size=24,
                         rng=np.random.RandomState(3))
    exf = offline_example(out, total_samples=200, crop_size=48, net_size=24,
                          flip=True, rng=np.random.RandomState(3))
    # same subsample indices -> flipped npz differs only in the part map
    np.testing.assert_allclose(ex["points"], exf["points"])
    expect = ex["parts"].copy()
    for src, dst in FLIP_PARTS.items():
        expect[ex["parts"] == src] = dst
    np.testing.assert_array_equal(exf["parts"], expect)
    # image was flipped horizontally -> the person mask moves to the right
    pm, pmf = ex["images"][..., 3], exf["images"][..., 3]
    assert pm[:, :12].sum() > pm[:, 12:].sum()
    assert pmf[:, 12:].sum() > pmf[:, :12].sum()


@pytest.fixture
def test_frame(tmp_path, rng):
    """One fabricated frame with keypoints + mocap mesh for TestData."""
    fd = str(tmp_path / "t0000.000")
    rgb_file = _write_frame_images(fd, rng, H=120, W=160)
    # person keypoints roughly inside the person mask
    kpts = np.stack([20 + rng.rand(25) * 60, 30 + rng.rand(25) * 60,
                     np.ones(25)], -1)
    with open(rgb_file.replace(".color.jpg", ".color.json"), "w") as f:
        json.dump(dict(body_joints=kpts.reshape(-1).tolist()), f)
    mv, mf = _box([0.0, 0.1, 2.2], np.array([0.3, 0.8, 0.2]))
    save_ply(rgb_file.replace(".color.jpg", ".mocap.ply"), mv, mf)
    return rgb_file, len(mv)


def _fake_landmarks(V, rng):
    import jax.numpy as jnp
    from vistracker_tpu.core.landmarks import BodyLandmarks
    reg = rng.rand(25, V)
    reg /= reg.sum(1, keepdims=True)
    return BodyLandmarks(body25=jnp.asarray(reg, jnp.float32),
                         face=jnp.asarray(reg[:1]), hand=jnp.asarray(reg[:1]))


def test_prepare_test_crop(test_frame, rng):
    from vistracker_tpu.core.camera import PerspectiveCamera
    rgb_file, V = test_frame
    lms = _fake_landmarks(V, rng)
    cam = PerspectiveCamera(crop_size=1200)
    res = prepare_test_crop(rgb_file, lms, cam, crop_size=1200, net_size=32)
    assert res["images"].shape == (32, 32, 5)
    assert np.isfinite(res["images"]).all()
    # the whole image was resized into the 2048px Kinect space (w > h)
    assert res["resize_scale"] == pytest.approx(2048 / 160)
    assert res["crop_scale"] > 0 and np.isfinite(res["crop_scale"])
    # crop_info side output (test_data.py:127-138)
    info_file = rgb_file.replace(".color.jpg", ".crop_info.pkl")
    assert os.path.isfile(info_file)
    with open(info_file, "rb") as f:
        info = pickle.load(f)
    assert info["crop_scale"] == pytest.approx(res["crop_scale"])
    np.testing.assert_allclose(info["crop_center"], res["old_crop_center"])
    assert info["crop_size"] == pytest.approx(res["crop_scale"] * 1200)


def test_prepare_test_crop_mean_center(test_frame, rng):
    from vistracker_tpu.core.camera import PerspectiveCamera
    rgb_file, V = test_frame
    lms = _fake_landmarks(V, rng)
    cam = PerspectiveCamera(crop_size=1200)
    res = prepare_test_crop(rgb_file, lms, cam, crop_size=1200, net_size=32,
                            use_mean_center=True, save_crop_info=False)
    np.testing.assert_allclose(res["crop_center"], MEAN_CROP_CENTER)
    assert res["images"].shape == (32, 32, 5)
    assert res["images"][..., 3].sum() > 0  # person mask survived padding


def test_boundary_sample_and_offline_train_cli(tmp_path, rng):
    """boundary-sample CLI writes the npz set; train-sifnet --offline-data
    trains from it (the offline BehaveDataset path, train_data.py)."""
    import glob
    from test_real_track import (_make_fake_assets, _make_fake_sequence,
                                 _make_fake_smplh_pkl)
    from vistracker_tpu.cli.main import (build_parser, run_boundary_sample,
                                         run_train_sifnet)
    from vistracker_tpu.cli.synthetic import box_mesh
    from vistracker_tpu.data.packed import save_packed

    seq = str(tmp_path / "Date09_Sub99_boxsmall")
    _make_fake_sequence(seq, rng, T=3)
    assets = str(tmp_path / "assets")
    _make_fake_assets(assets, rng)
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    obj_root = str(tmp_path / "objects")
    os.makedirs(os.path.join(obj_root, "boxsmall"), exist_ok=True)
    bv, bf = box_mesh()
    save_ply(os.path.join(obj_root, "boxsmall", "boxsmall.ply"), bv, bf)

    T = 3
    gt_pack = str(tmp_path / "gt.pkl")
    save_packed(gt_pack, dict(
        poses=np.zeros((T, 156), np.float32),
        betas=np.zeros((T, 10), np.float32),
        trans=np.tile([[0.0, 0.0, 2.2]], (T, 1)).astype(np.float32),
        obj_angles=np.zeros((T, 3), np.float32),  # GT packs: axis-angle
        obj_trans=np.tile([[0.1, 0.0, 2.3]], (T, 1)).astype(np.float32),
        obj_scales=np.ones(T, np.float32), gender="male",
        frames=[f"t{i:04d}.000" for i in range(T)]))

    npz_dir = str(tmp_path / "boundary")
    args = build_parser().parse_args([
        "boundary-sample", "--seq", seq, "--gt-pack", gt_pack,
        "--smpl-model", smpl_pkl, "--assets", assets,
        "--objects-root", obj_root, "--out", npz_dir,
        "--samples", "200", "--flip"])
    run_boundary_sample(args)
    files = sorted(glob.glob(os.path.join(npz_dir, "*.npz")))
    assert len(files) == 2 * T  # per-frame npz + _flip variants
    # is_done resume: second run writes nothing new
    run_boundary_sample(args)
    assert sorted(glob.glob(os.path.join(npz_dir, "*.npz"))) == files

    out_dir = str(tmp_path / "exp")
    targs = build_parser().parse_args([
        "train-sifnet", "--offline-data", npz_dir, "--out", out_dir,
        "--epochs", "1", "--batch-size", "2", "--image-size", "24",
        "--crop-size", "48", "--samples", "96", "--variant", "chore",
        "--random-flip"])
    run_train_sifnet(targs)
    assert os.path.isdir(out_dir)
    assert any("metrics" in f or "checkpoint" in f.lower() or True
               for f in os.listdir(out_dir))
