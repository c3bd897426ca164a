"""High-fidelity fixture tests: capsule-humanoid SMPL-H model + rendered
BEHAVE-layout sequence generation (data/fixture.py)."""
import os

import numpy as np
import jax.numpy as jnp

from vistracker_tpu.data.fixture import (build_humanoid_smplh,
                                         generate_fixture_sequence)


def test_humanoid_model_structure(tmp_path):
    import pickle
    from vistracker_tpu.core.smpl import load_smpl_pkl, lbs_forward, \
        SMPLH_PARENTS
    md, aux = build_humanoid_smplh(return_aux=True)
    assert md["v_template"].shape == (6890, 3)
    assert md["weights"].shape == (6890, 52)
    np.testing.assert_allclose(np.asarray(md["weights"]).sum(1), 1.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(md["J_regressor"]).sum(1), 1.0,
                               atol=1e-6)
    assert md["f"].max() < 6890
    p = str(tmp_path / "m.pkl")
    with open(p, "wb") as f:
        pickle.dump(md, f)
    model = load_smpl_pkl(p)
    # articulation sanity: bending the left elbow moves the left wrist area
    pose = np.zeros((1, 156), np.float32)
    v0, j0, _, _ = lbs_forward(model, jnp.asarray(pose),
                               jnp.zeros((1, 10)), jnp.zeros((1, 3)))
    pose[0, 3 * 18 + 1] = 1.0  # left elbow
    v1, j1, _, _ = lbs_forward(model, jnp.asarray(pose),
                               jnp.zeros((1, 10)), jnp.zeros((1, 3)))
    wrist_delta = np.linalg.norm(np.asarray(j1[0, 20] - j0[0, 20]))
    head_delta = np.linalg.norm(np.asarray(j1[0, 15] - j0[0, 15]))
    assert wrist_delta > 0.05 and head_delta < 1e-4
    # regressed joints sit near the T-pose skeleton
    np.testing.assert_allclose(np.asarray(j0[0]), aux["joints"], atol=0.12)


def test_fixture_sequence_generation(tmp_path, rng):
    from vistracker_tpu.data.behave import FrameDataReader
    from vistracker_tpu.data.packed import load_packed
    from vistracker_tpu.core.smpl import load_smpl_pkl
    from vistracker_tpu.core.landmarks import load_landmarks

    fx = generate_fixture_sequence(str(tmp_path), T=2, raster=64)
    reader = FrameDataReader(fx["seq_dir"])
    assert len(reader) == 2
    assert reader.seq_info.get_obj_name() == "boxmedium"
    rgb = reader.get_color(0, 1)
    pm = reader.get_mask(0, 1, "person")
    om = reader.get_mask(0, 1, "obj")
    assert rgb.shape == (1536, 2048, 3)
    assert pm.shape == (1536, 2048) and pm.any() and om.any()
    # the person mask is upright: its top (head) is above its bottom
    ys, xs = np.nonzero(pm)
    assert ys.min() < 768  # head region in the upper image half
    kpts = reader.get_body_kpts(0, 1)
    assert kpts.shape == (25, 3)
    # keypoints fall inside (or near) the person bbox
    assert (kpts[:, 0] > xs.min() - 200).all()
    assert (kpts[:, 0] < xs.max() + 200).all()
    gt = load_packed(fx["gt_pack"])
    assert np.asarray(gt["poses"]).shape == (2, 156)
    assert np.asarray(gt["obj_angles"]).shape == (2, 3)  # axis-angle GT
    assert np.asarray(gt["occ_ratios"]).shape == (2, 4)
    # synthesized assets load through the standard loaders
    lms = load_landmarks(os.path.join(str(tmp_path), "assets"))
    model = load_smpl_pkl(fx["model_pkl"])
    assert np.asarray(lms.body25).shape == (25, 6890)


def test_fixture_heldout_motion_seed(tmp_path):
    """motion_seed varies ONLY the motion: the humanoid model/template are
    byte-identical to the default sequence (so nets trained on seq 1 load
    against seq 2), while the trajectories genuinely differ."""
    fx1 = generate_fixture_sequence(str(tmp_path / "a"), T=4, raster=64)
    fx2 = generate_fixture_sequence(str(tmp_path / "b"), T=4, raster=64,
                                    motion_seed=1)
    assert fx2["seq_name"] != fx1["seq_name"]
    with open(fx1["model_pkl"], "rb") as f1, \
            open(fx2["model_pkl"], "rb") as f2:
        assert f1.read() == f2.read()
    with open(os.path.join(fx1["objects_root"], "boxmedium",
                           "boxmedium.ply"), "rb") as f1, \
            open(os.path.join(fx2["objects_root"], "boxmedium",
                              "boxmedium.ply"), "rb") as f2:
        assert f1.read() == f2.read()
    # different motion everywhere it matters
    assert np.abs(fx1["trans"] - fx2["trans"]).max() > 0.01
    assert np.abs(fx1["rot_gt"] - fx2["rot_gt"]).max() > 0.01
    assert np.abs(fx1["obj_trans_gt"] - fx2["obj_trans_gt"]).max() > 0.05
    # rotations stay valid
    rr = fx2["rot_gt"] @ fx2["rot_gt"].transpose(0, 2, 1)
    np.testing.assert_allclose(rr, np.broadcast_to(np.eye(3), rr.shape),
                               atol=1e-5)


def test_lbox_template_breaks_box_symmetries(tmp_path):
    """The lbox fixture template has NO 180-deg rotational self-symmetry
    (the plain box has three exact ones), so object pose is fully
    observable from images — the symmetry-ambiguity control for the
    held-out rotation-drift analysis."""
    from scipy.spatial import cKDTree
    from vistracker_tpu.cli.synthetic import box_mesh, lbox_mesh

    def sym_residual(v):
        # residual of the vert set under 180-deg flips about x/y/z
        out = []
        for axis in range(3):
            s = -np.ones(3)
            s[axis] = 1.0
            flipped = v * s  # 180-deg rotation about `axis`
            d, _ = cKDTree(v).query(flipped)
            out.append(d.max())
        return np.array(out)

    bv, _ = box_mesh((0.45, 0.3, 0.35))
    bv = bv - bv.mean(0)
    assert sym_residual(bv).max() < 1e-6          # box: exact symmetries
    lv, lf = lbox_mesh()
    assert sym_residual(lv).min() > 0.05          # lbox: all broken
    assert lf.max() == len(lv) - 1

    # generator accepts the shape and writes the asymmetric template
    from vistracker_tpu.utils.mesh import load_ply
    fx = generate_fixture_sequence(str(tmp_path), T=2, raster=64,
                                   object_shape="lbox")
    tv, tf = load_ply(os.path.join(fx["objects_root"], "boxmedium",
                                   "boxmedium.ply"))
    assert len(tv) == len(lv) and len(tf) == len(lf)
    assert sym_residual(tv - tv.mean(0)).min() > 0.05
