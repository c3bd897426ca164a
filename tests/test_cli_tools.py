"""CLI tool tests: `evaluate` (single + split mode, the stage-7 entry) and
`render` (side-by-side mp4 + top view + contact spheres)."""
import json
import os

import numpy as np
import pytest

from vistracker_tpu.utils.mesh import save_ply
from vistracker_tpu.cli.main import main as cli_main
from vistracker_tpu.cli.synthetic import box_mesh
from vistracker_tpu.data.packed import save_packed

from test_real_track import _make_fake_smplh_pkl, _make_fake_assets


def _write_packs(tmp_path, rng, seq_name, T=4, noise=0.01):
    """GT pack (axis-angle obj_angles) + recon pack with small deviations."""
    from scipy.spatial.transform import Rotation
    poses = (rng.randn(T, 156) * 0.05).astype(np.float32)
    betas = np.zeros((T, 10), np.float32)
    trans = np.tile([[0, 0, 2.2]], (T, 1)).astype(np.float32)
    rotvec = (rng.randn(T, 3) * 0.2).astype(np.float32)
    obj_trans = np.tile([[0.2, 0, 2.3]], (T, 1)).astype(np.float32)
    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir, exist_ok=True)
    save_packed(str(gt_dir / f"{seq_name}_GT-packed.pkl"), dict(
        poses=poses, betas=betas, trans=trans, obj_angles=rotvec,
        obj_trans=obj_trans, obj_scales=np.ones(T),
        occ_ratios=np.ones((T, 4), np.float32),
        frames=[f"t{i:04d}.000" for i in range(T)], gender="male"))
    rec_dir = tmp_path / "recon_out" / "recon_tr"
    os.makedirs(rec_dir, exist_ok=True)
    rots = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
    save_packed(str(rec_dir / f"{seq_name}_k1.pkl"), dict(
        poses=poses + rng.randn(*poses.shape).astype(np.float32) * noise,
        betas=betas, trans=trans + noise,
        obj_angles=rots.transpose(0, 2, 1),  # packed transposed convention
        obj_trans=obj_trans + noise, obj_scales=np.ones(T),
        recon_exist=np.ones(T, bool),
        frames=[f"t{i:04d}.000" for i in range(T)], gender="male"))
    return str(gt_dir), str(tmp_path / "recon_out")


def test_evaluate_cli_split_mode(tmp_path, rng, capsys):
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    obj_root = str(tmp_path / "objects")
    bv, bf = box_mesh()
    for seq in ("Date01_Sub01_boxsmall", "Date02_Sub02_chairwood"):
        obj = seq.split("_")[2]
        os.makedirs(os.path.join(obj_root, obj), exist_ok=True)
        save_ply(os.path.join(obj_root, obj, f"{obj}.ply"), bv, bf)
        gt_root, recon_root = _write_packs(tmp_path, rng, seq)
    split = str(tmp_path / "split.json")
    with open(split, "w") as f:
        json.dump({"seqs": ["Date01_Sub01_boxsmall",
                            "Date02_Sub02_chairwood"]}, f)
    cli_main(["evaluate", "--split", split, "--save-name", "tr",
              "--recon-root", recon_root, "--gt-root", gt_root,
              "--objects-root", obj_root, "--smpl-model", smpl_pkl,
              "--window", "2", "--out", str(tmp_path / "results"), "--cpu"])
    outfile = capsys.readouterr().out.strip().splitlines()[-1]
    with open(outfile) as f:
        res = json.load(f)
    # reference JSON layout: overall metrics + per-seq + per-object
    for k in ("smpl_chamf", "obj_chamf", "smpl_v2v", "obj_v2v",
              "smpl-acc", "obj-acc", "separate"):
        assert k in res, k
    assert set(res["separate"]) == {"Date01_Sub01_boxsmall",
                                    "Date02_Sub02_chairwood"}
    assert "boxsmall" in res and "chairwood" in res  # per-object breakdown
    # small perturbations -> small errors (cm)
    assert 0 < res["smpl_v2v"]["mean"] < 10.0
    assert 0 < res["obj_v2v"]["mean"] < 10.0


def test_render_cli_mp4_top_contact(tmp_path, rng, capsys):
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    _make_fake_assets(str(tmp_path / "assets"), rng)
    bv, bf = box_mesh()
    temp = str(tmp_path / "box.ply")
    save_ply(temp, bv, bf)
    seq = "Date01_Sub01_boxsmall"
    gt_root, recon_root = _write_packs(tmp_path, rng, seq)
    recon = os.path.join(recon_root, "recon_tr", f"{seq}_k1.pkl")
    out = str(tmp_path / "vid" / "side.mp4")
    cli_main(["render", "--recon", recon,
              "--recon2", os.path.join(gt_root, f"{seq}_GT-packed.pkl"),
              "--template", temp, "--smpl-model", smpl_pkl,
              "--assets", str(tmp_path / "assets"),
              "--out", out, "--top", "--contact-spheres", "--size", "48",
              "--max-frames", "2", "--cpu"])
    printed = capsys.readouterr().out.strip().splitlines()
    assert out in printed
    assert os.path.getsize(out) > 100
    top = str(tmp_path / "vid" / "side_top.mp4")
    assert top in printed and os.path.getsize(top) > 100


def test_evaluate_cli_frame_folder_mode(tmp_path, rng, capsys):
    """--recon-seq gathers per-frame fit pkls (unpack_to_frames layout)
    into a pack with dummy-fill/recon_exist, then evaluates — the
    ReconEvaluator-over-recon-folders path (recon/eval/evaluate.py)."""
    from test_real_track import _make_fake_sequence
    from vistracker_tpu.data.packed import load_packed, unpack_to_frames

    seq_name = "Date03_Sub03_boxsmall"
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    obj_root = str(tmp_path / "objects")
    bv, bf = box_mesh()
    os.makedirs(os.path.join(obj_root, "boxsmall"), exist_ok=True)
    save_ply(os.path.join(obj_root, "boxsmall", "boxsmall.ply"), bv, bf)
    gt_root, recon_root = _write_packs(tmp_path, rng, seq_name)

    # scatter the recon pack into per-frame fit pkls inside a seq folder
    seq_dir = str(tmp_path / seq_name)
    _make_fake_sequence(seq_dir, rng, T=4)
    packed = load_packed(os.path.join(recon_root, "recon_tr",
                                      f"{seq_name}_k1.pkl"))
    unpack_to_frames(packed, seq_dir, "tr", kid=1)

    cli_main(["evaluate", "--recon-seq", seq_dir, "--save-name", "tr",
              "--gt", os.path.join(gt_root, f"{seq_name}_GT-packed.pkl"),
              "--template",
              os.path.join(obj_root, "boxsmall", "boxsmall.ply"),
              "--smpl-model", smpl_pkl, "--window", "2",
              "--out", str(tmp_path / "results"), "--cpu"])
    outfile = capsys.readouterr().out.strip().splitlines()[-1]
    with open(outfile) as f:
        res = json.load(f)
    assert 0 < res["smpl_v2v"]["mean"] < 10.0
    assert 0 < res["obj_v2v"]["mean"] < 10.0


def test_pack_unpack_cli_roundtrip(tmp_path, rng, capsys):
    """`unpack` scatters a packed pkl to per-frame fit files and `pack`
    gathers them back (tools/pack2separate.py + pack_recon.py param path),
    preserving params and recording recon_exist."""
    from test_real_track import _make_fake_sequence
    from vistracker_tpu.data.packed import load_packed

    seq_name = "Date04_Sub04_boxsmall"
    _, recon_root = _write_packs(tmp_path, rng, seq_name)
    recon = os.path.join(recon_root, "recon_tr", f"{seq_name}_k1.pkl")
    seq_dir = str(tmp_path / seq_name)
    _make_fake_sequence(seq_dir, rng, T=4)

    cli_main(["unpack", "--packed", recon, "--seq", seq_dir,
              "--save-name", "tr"])
    assert "unpacked 4 frames" in capsys.readouterr().out
    assert os.path.isfile(os.path.join(seq_dir, "t0000.000",
                                       "k1.smplfit_tr.pkl"))

    out = str(tmp_path / "repacked.pkl")
    cli_main(["pack", "--seq", seq_dir, "--out", out, "--save-name", "tr"])
    assert "4 with recon" in capsys.readouterr().out
    orig, rt = load_packed(recon), load_packed(out)
    np.testing.assert_allclose(rt["poses"], orig["poses"], atol=1e-6)
    np.testing.assert_allclose(rt["obj_angles"], orig["obj_angles"],
                               atol=1e-6)
    np.testing.assert_allclose(rt["obj_trans"], orig["obj_trans"],
                               atol=1e-6)
    assert np.asarray(rt["recon_exist"]).all()
    assert rt["gender"] == "male"


def test_evaluate_cli_angles(tmp_path, rng, capsys):
    """--angles adds the angle evaluator's rotation errors (degrees) to the
    output JSON (evalvideo_packed_angle.py parity)."""
    from test_real_track import _make_fake_smplh_pkl

    seq_name = "Date05_Sub05_boxsmall"
    smpl_pkl = str(tmp_path / "SMPLH_male.pkl")
    _make_fake_smplh_pkl(smpl_pkl, rng)
    bv, bf = box_mesh()
    temp = str(tmp_path / "box.ply")
    save_ply(temp, bv, bf)
    gt_root, recon_root = _write_packs(tmp_path, rng, seq_name)
    cli_main(["evaluate",
              "--recon", os.path.join(recon_root, "recon_tr",
                                      f"{seq_name}_k1.pkl"),
              "--gt", os.path.join(gt_root, f"{seq_name}_GT-packed.pkl"),
              "--template", temp, "--smpl-model", smpl_pkl,
              "--window", "2", "--angles",
              "--out", str(tmp_path / "results"), "--cpu"])
    outfile = capsys.readouterr().out.strip().splitlines()[-1]
    with open(outfile) as f:
        res = json.load(f)
    assert "rot_error" in res
    # recon stores the exact GT rotations (transposed), so the geodesic
    # error is numerically ~0 degrees
    assert 0 <= res["rot_error"]["mean"] < 0.1
    assert f"{seq_name}_k1" in res["rot_error_separate"]


def test_rename_masks_cli(tmp_path, capsys):
    """rename-masks moves flat t<frame>-k<kid>.*.png into frame folders
    (tools/rename_masks.py parity), skipping already-present files."""
    seq = tmp_path / "Date09_Sub99_boxsmall"
    (seq / "t0003.000").mkdir(parents=True)
    mask_root = tmp_path / "masks" / "Date09_Sub99_boxsmall"
    mask_root.mkdir(parents=True)
    for frame in ("t0003.000", "t0004.000"):
        for kind in ("person_mask", "obj_rend_mask"):
            (mask_root / f"{frame}-k1.{kind}.png").write_bytes(b"png")
    # one destination already exists -> must be skipped, source kept
    (seq / "t0003.000" / "k1.person_mask.png").write_bytes(b"old")
    cli_main(["rename-masks", "--seq", str(seq),
              "--mask-path", str(tmp_path / "masks")])
    out = capsys.readouterr().out
    assert "moved 3" in out and "1 already present" in out
    assert (seq / "t0004.000" / "k1.obj_rend_mask.png").is_file()
    assert (seq / "t0003.000" / "k1.person_mask.png").read_bytes() == b"old"
    assert (mask_root / "t0003.000-k1.person_mask.png").is_file()
