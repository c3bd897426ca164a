"""Evaluator tests: Procrustes exactness, metric sanity, windowed eval."""
import numpy as np
import jax.numpy as jnp

from vistracker_tpu.eval.metrics import (compute_transform, apply_transform,
                                         v2v_error, chamfer_error, accel_error)
from vistracker_tpu.eval.evaluator import (eval_sequence, format_errors,
                                           collect_results, ERROR_KEYS)
from vistracker_tpu.data.packed import (PackedRecon, save_packed,
                                        load_packed_recon, recon_obj_verts,
                                        gt_obj_verts)
from vistracker_tpu.utils.mesh import (save_ply, load_ply, sample_surface,
                                       signed_distance_grid)


def _mesh(rng, v=40, f=60):
    verts = rng.randn(v, 3).astype(np.float32)
    faces = rng.randint(0, v, (f, 3)).astype(np.int32)
    return verts, faces


def test_compute_transform_recovers_similarity(rng):
    src = rng.randn(200, 3)
    # random similarity
    from vistracker_tpu.core.rotations import axis_angle_to_rotmat
    R_gt = np.asarray(axis_angle_to_rotmat(jnp.asarray([[0.4, -0.3, 0.8]])))[0]
    t_gt = np.array([0.5, -1.0, 2.0])
    s_gt = 1.7
    dst = s_gt * src @ R_gt.T + t_gt
    R, t, s = compute_transform(src, dst)
    np.testing.assert_allclose(R, R_gt, atol=1e-6)
    np.testing.assert_allclose(s, s_gt, atol=1e-6)
    aligned = apply_transform(src, R, t, s)
    np.testing.assert_allclose(aligned, dst, atol=1e-6)


def test_v2v_and_chamfer_zero_for_identical(rng):
    verts, faces = _mesh(rng)
    assert v2v_error(verts, verts) == 0.0
    # identical meshes: chamfer is bounded by sampling discretization only
    c1 = chamfer_error(verts, faces, verts, faces, n_samples=2000)
    assert c1 < 20.0, c1  # cm, random triangle soup of ~1 m scale
    # and shrinks with more samples
    c2 = chamfer_error(verts, faces, verts, faces, n_samples=8000)
    assert c2 < c1


def test_accel_error_known_value():
    t = np.arange(10, dtype=np.float32)
    gt = np.zeros((10, 4, 3), np.float32)
    rec = gt.copy()
    rec[:, :, 0] += 0.01 * t[:, None] ** 2  # constant accel diff of 0.02
    e = accel_error(gt, rec)
    np.testing.assert_allclose(e, 0.02 * 100, rtol=1e-4)


def test_eval_sequence_identity_recon(rng):
    T = 12
    sverts = rng.randn(T, 30, 3).astype(np.float32) * 0.2
    overts = rng.randn(T, 20, 3).astype(np.float32) * 0.2
    sfaces = rng.randint(0, 30, (40, 3)).astype(np.int32)
    ofaces = rng.randint(0, 20, (25, 3)).astype(np.int32)
    errs = eval_sequence(sverts, overts, sverts, overts, sfaces, ofaces,
                         window=5, chamfer_samples=200)
    assert errs.shape == (T, 6)
    # identical recon: v2v == 0 and accel == 0
    np.testing.assert_allclose(errs[:, 2], 0.0, atol=1e-4)
    np.testing.assert_allclose(errs[:, 3], 0.0, atol=1e-4)
    np.testing.assert_allclose(errs[:, 4], 0.0, atol=1e-3)


def test_eval_sequence_alignment_removes_global_offset(rng):
    T = 8
    sverts = rng.randn(T, 25, 3).astype(np.float32)
    overts = rng.randn(T, 15, 3).astype(np.float32)
    sfaces = rng.randint(0, 25, (30, 3)).astype(np.int32)
    ofaces = rng.randint(0, 15, (20, 3)).astype(np.int32)
    off = np.array([0.5, -0.2, 0.9], np.float32)
    errs = eval_sequence(sverts, overts, sverts + off, overts + off,
                         sfaces, ofaces, window=300, chamfer_samples=200)
    np.testing.assert_allclose(errs[:, 2], 0.0, atol=1e-3)


def test_collect_results_json(tmp_path, rng):
    errs = {"Date01_Sub01_chairwood_hand": np.abs(rng.randn(5, 6)),
            "Date02_Sub02_boxlarge": np.abs(rng.randn(3, 6))}
    out = collect_results(errs, str(tmp_path), "test-release")
    import json
    d = json.load(open(out))
    for k in ERROR_KEYS:
        assert k in d and "mean" in d[k]
    assert "chairwood" in d and "boxlarge" in d
    assert d["total"] == 8


def test_packed_roundtrip(tmp_path, rng):
    T = 6
    p = PackedRecon(
        poses=rng.randn(T, 156).astype(np.float32),
        betas=rng.randn(T, 10).astype(np.float32),
        trans=rng.randn(T, 3).astype(np.float32),
        obj_angles=np.broadcast_to(np.eye(3), (T, 3, 3)).copy(),
        obj_trans=rng.randn(T, 3).astype(np.float32),
        obj_scales=np.ones(T),
        frames=[f"t{i:04d}.000" for i in range(T)])
    path = str(tmp_path / "seq_k1.pkl")
    save_packed(path, p)
    q = load_packed_recon(path)
    np.testing.assert_allclose(q.poses, p.poses)
    np.testing.assert_array_equal(q.recon_exist, True)
    assert q.frames == p.frames

    temp = rng.randn(10, 3).astype(np.float32)
    ov = recon_obj_verts(temp, q.obj_angles, q.obj_trans, q.obj_scales)
    np.testing.assert_allclose(ov, temp[None] + q.obj_trans[:, None], atol=1e-6)


def test_ply_roundtrip(tmp_path, rng):
    verts, faces = _mesh(rng)
    path = str(tmp_path / "m.ply")
    save_ply(path, verts, faces)
    v, f = load_ply(path)
    np.testing.assert_allclose(v, verts, atol=1e-6)
    np.testing.assert_array_equal(f, faces)


def test_sdf_grid_sphere_sign():
    # icosphere-ish: sample a sphere mesh, check SDF sign inside/outside
    th = np.linspace(0, np.pi, 12)
    ph = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    verts = np.stack(np.meshgrid(th, ph, indexing="ij"), -1).reshape(-1, 2)
    pts = np.stack([np.sin(verts[:, 0]) * np.cos(verts[:, 1]),
                    np.cos(verts[:, 0]),
                    np.sin(verts[:, 0]) * np.sin(verts[:, 1])], -1) * 0.5
    faces = []
    for i in range(11):
        for j in range(16):
            a = i * 16 + j; b = i * 16 + (j + 1) % 16
            c = (i + 1) * 16 + j; d = (i + 1) * 16 + (j + 1) % 16
            faces += [[a, b, c], [b, d, c]]
    vals, bmin, bmax = signed_distance_grid(pts.astype(np.float32),
                                            np.asarray(faces, np.int32), 32)
    # center of grid = center of sphere -> inside (negative)
    assert vals[16, 16, 16] < 0
    # corner -> outside (positive)
    assert vals[0, 0, 0] > 0


def test_pack_unpack_roundtrip(tmp_path, rng):
    from vistracker_tpu.data.packed import unpack_to_frames, pack_from_frames
    T = 3
    frames = [f"t{i:04d}.000" for i in range(T)]
    packed = dict(poses=rng.randn(T, 156).astype(np.float32),
                  betas=rng.randn(T, 10).astype(np.float32),
                  trans=rng.randn(T, 3).astype(np.float32),
                  obj_angles=np.broadcast_to(np.eye(3), (T, 3, 3)).copy(),
                  obj_trans=rng.randn(T, 3).astype(np.float32),
                  obj_scales=np.ones(T), frames=frames)
    seq = str(tmp_path / "seq")
    written = unpack_to_frames(packed, seq, "fit01")
    assert written == frames
    # idempotent: second call writes nothing
    assert unpack_to_frames(packed, seq, "fit01") == []
    back = pack_from_frames(seq, frames, "fit01")
    np.testing.assert_allclose(back["poses"], packed["poses"], atol=1e-6)
    np.testing.assert_allclose(back["obj_trans"], packed["obj_trans"],
                               atol=1e-6)
    assert back["recon_exist"].all()
    # missing frame -> dummy fill + recon_exist False
    back2 = pack_from_frames(seq, frames + ["t9999.000"], "fit01")
    assert not back2["recon_exist"][-1]
    np.testing.assert_allclose(back2["obj_angles"][-1], np.eye(3))


def test_pca_axes_reference_era_sign_convention(rng):
    """compute_pca_axes must match the U-based svd_flip the reference-era
    sklearn PCA used (the signs the released checkpoints were trained on)."""
    from sklearn.utils.extmath import svd_flip
    from vistracker_tpu.data.sampling import compute_pca_axes
    for i in range(5):
        v = rng.randn(80, 3) * np.array([2.0, 1.0, 0.4])
        x = v - v.mean(0)
        u, s, vt = np.linalg.svd(x, full_matrices=False)
        _, ref = svd_flip(u, vt, u_based_decision=True)
        np.testing.assert_allclose(compute_pca_axes(v), ref, atol=1e-5)


def test_eval_window_refit_indices_reference_parity(rng):
    """The Procrustes window refit schedule must match the reference
    (evalvideo_packed.py:104-141): `count` increments unconditionally at the
    top of the frame loop (count = i+1, even on skipped frames), the first
    fit happens at i=0 (transform is None) over window [0, W), and refits
    happen when (i+1) % W == 0, i.e. at i = W-1, 2W-1, ... over [i, i+W)."""
    import vistracker_tpu.eval.evaluator as ev
    from vistracker_tpu.eval.metrics import compute_transform as ct_orig

    L, W, V = 10, 4, 12
    sgt = rng.randn(L, V, 3).astype(np.float64)
    ogt = rng.randn(L, 8, 3).astype(np.float64)
    src = sgt + 0.01 * rng.randn(L, V, 3)
    orc = ogt + 0.01 * rng.randn(L, 8, 3)
    faces = rng.randint(0, V, (6, 3))
    ofaces = rng.randint(0, 8, (4, 3))

    fits = []

    def recording_ct(a, b):
        fits.append(len(a))
        return ct_orig(a, b)

    exist = np.ones(L, bool)
    exist[5] = False  # a skipped frame must NOT shift the refit schedule
    orig = ev.compute_transform
    try:
        ev.compute_transform = recording_ct
        errs = ev.eval_sequence(sgt, ogt, src, orc, faces, ofaces,
                                recon_exist=exist, window=W,
                                chamfer_samples=64)
    finally:
        ev.compute_transform = orig

    # refits at i=0 (None), i=3, i=7 -> windows [0,4), [3,7), [7,10) with
    # frame 5 excluded from the [3,7) fit
    expected_sizes = [4 * (V + 8), 3 * (V + 8), 3 * (V + 8)]
    assert [f for f in fits] == expected_sizes, fits
    assert len(errs) == L - 1  # the skipped frame contributes no row
