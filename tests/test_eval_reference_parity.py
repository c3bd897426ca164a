"""Numerical parity of eval/metrics.py + eval/evaluator.py against the
ACTUAL reference eval code, imported from /root/reference and executed on
the same inputs:

  * recon/eval/pose_utils.py:compute_transform (windowed Procrustes)
  * recon/eval/chamfer_distance.py:chamfer_distance (sklearn kd-tree)
  * recon/eval/evaluate.py:ReconEvaluator.v2v_err
  * recon/eval/evaluate_video.py:VideoEvaluator.compute_accel_err
  * the evalvideo_packed.py:30-167 per-window alignment bookkeeping

Native deps absent from this image (psbody, trimesh) are stubbed for the
imports only — every asserted number comes from reference code paths that
never touch the stubs. Skipped when /root/reference is unavailable.
"""
import os
import os.path as osp
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")


@pytest.fixture(scope="module")
def ref_eval(tmp_path_factory):
    """Import the reference eval modules with import-time shims.

    evaluate_video.py reads PATHS.yml from the cwd at import time, so the
    import happens chdir'd into a scratch dir holding a dummy map. Stubs
    are removed afterwards so later tests see the real modules."""
    stubbed = []
    for name, attrs in (("psbody", {}),
                        ("psbody.mesh", {"Mesh": _ArrayMesh}),
                        ("trimesh", {"Trimesh": object}),
                        ("joblib", {})):
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
            stubbed.append(name)
    if "psbody.mesh" in stubbed and "psbody" in stubbed:
        sys.modules["psbody"].mesh = sys.modules["psbody.mesh"]

    scratch = tmp_path_factory.mktemp("refpaths")
    keys = ("BEHAVE_PATH", "RECON_PATH", "CODE_PATH", "SMPL_MODEL_ROOT",
            "SMPL_ASSETS_ROOT", "MODEL_PATH", "GT_PACKED", "SPLIT_PATH",
            "OCC_PATH", "BEHAVE_30FPS_PATH")
    (scratch / "PATHS.yml").write_text(
        "".join(f"{k}: {scratch}\n" for k in keys))
    cwd = os.getcwd()
    sys.path.insert(0, REF)
    os.chdir(scratch)
    try:
        import recon.eval.pose_utils as pose_utils
        import recon.eval.chamfer_distance as chamfer_mod
        import recon.eval.evaluate_video as evvid
        yield dict(compute_transform=pose_utils.compute_transform,
                   chamfer=chamfer_mod.chamfer_distance,
                   v2v_err=evvid.ReconEvaluator.v2v_err,
                   accel_err=evvid.VideoEvaluator.compute_accel_err)
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)
        for name in stubbed:
            sys.modules.pop(name, None)


class _ArrayMesh:
    """Stand-in for psbody Mesh: just (verts, faces) holders."""

    def __init__(self, v, f):
        self.v, self.f = v, f


def test_compute_transform_parity(ref_eval):
    """Our Procrustes returns the reference's exact (R, t, s), and
    apply_transform matches the reference's application formula
    (evalvideo_packed.py:124 `(ascale * arot.dot(v.T) + atrans).T`)."""
    from vistracker_tpu.eval.metrics import compute_transform, apply_transform
    rng = np.random.RandomState(3)
    src = rng.randn(997, 3)
    # target = noisy similarity transform of src
    q, _ = np.linalg.qr(rng.randn(3, 3))
    q *= np.sign(np.linalg.det(q))
    tgt = 1.37 * src @ q.T + rng.randn(3) + 0.01 * rng.randn(997, 3)

    R_ref, t_ref, s_ref, transposed = ref_eval["compute_transform"](src, tgt)
    assert transposed  # (N, 3) input goes through the reference transpose
    R, t, s = compute_transform(src, tgt)
    np.testing.assert_allclose(R, R_ref, atol=1e-9)
    np.testing.assert_allclose(t, t_ref, atol=1e-9)
    np.testing.assert_allclose(s, s_ref, atol=1e-9)

    verts = rng.randn(40, 3)
    ours = apply_transform(verts, R, t, s)
    ref = (s_ref * R_ref.dot(verts.T) + t_ref).T
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_chamfer_parity_vs_sklearn(ref_eval):
    """Device MXU chamfer == the reference's kd-tree chamfer on identical
    clouds (bidirectional sum of mean sqrt distances)."""
    import jax.numpy as jnp
    from vistracker_tpu.ops.chamfer import chamfer_distance
    rng = np.random.RandomState(0)
    x = rng.randn(1500, 3).astype(np.float32)
    y = (rng.randn(1100, 3) * 0.8 + 0.2).astype(np.float32)
    ref = ref_eval["chamfer"](x, y)
    ours = float(chamfer_distance(jnp.asarray(x)[None],
                                  jnp.asarray(y)[None], sqrt=True)[0])
    np.testing.assert_allclose(ours, ref, rtol=2e-5)


def test_v2v_and_accel_parity(ref_eval):
    from vistracker_tpu.eval.metrics import v2v_error, accel_error
    rng = np.random.RandomState(1)
    gt = [rng.randn(60, 3) for _ in range(7)]
    rc = [g + 0.05 * rng.randn(60, 3) for g in gt]

    # v2v_err returns meters; ours applies the *100 cm conversion
    ref_v2v = ref_eval["v2v_err"](None, gt[0], rc[0]) * 100.0
    np.testing.assert_allclose(v2v_error(gt[0], rc[0]), ref_v2v, rtol=1e-6)

    ref_acc = ref_eval["accel_err"](None, gt, rc)
    ours_acc = accel_error(np.stack(gt), np.stack(rc))
    np.testing.assert_allclose(ours_acc, ref_acc, rtol=1e-5)


def _reference_windowed_v2v(ref_eval, sv_gt, ov_gt, sv_rc, ov_rc,
                            recon_exist, window):
    """The evalvideo_packed.py:100-167 loop, transcribed with the ACTUAL
    reference numerics (compute_transform + v2v_err + compute_accel_err)
    and plain arrays for Mesh; chamfer omitted (its surface sampling is
    RNG-dependent and compared separately above)."""
    compute_transform = ref_eval["compute_transform"]
    L = len(sv_gt)
    arot = atrans = ascale = None
    count = 0
    rows, smpl_acc, obj_acc = [], [], []
    w_sgt, w_srec, w_ogt, w_orec = [], [], [], []
    for i in range(L):
        count += 1
        if arot is None or count % window == 0:
            bend = min(L, i + window)
            indices = np.arange(i, bend)[recon_exist[i:bend]]
            if len(indices) == 0:
                continue
            clip_gt = np.concatenate(
                [np.concatenate(x[indices], 0) for x in (sv_gt, ov_gt)], 0)
            clip_rc = np.concatenate(
                [np.concatenate(x[indices], 0) for x in (sv_rc, ov_rc)], 0)
            arot, atrans, ascale, _ = compute_transform(clip_rc, clip_gt)
        if not recon_exist[i]:
            continue
        s_al = (ascale * arot.dot(sv_rc[i].T) + atrans).T
        o_al = (ascale * arot.dot(ov_rc[i].T) + atrans).T
        w_sgt.append(sv_gt[i]); w_srec.append(s_al)
        w_ogt.append(ov_gt[i]); w_orec.append(o_al)
        rows.append([ref_eval["v2v_err"](None, sv_gt[i], s_al) * 100.0,
                     ref_eval["v2v_err"](None, ov_gt[i], o_al) * 100.0])
        if count % window == 0 or i == L - 1:
            n = len(w_sgt)
            acc_s = (ref_eval["accel_err"](None, w_sgt, w_srec)
                     if n >= 3 else 0.0)
            acc_o = (ref_eval["accel_err"](None, w_ogt, w_orec)
                     if n >= 3 else 0.0)
            smpl_acc.extend([acc_s] * n)
            obj_acc.extend([acc_o] * n)
            w_sgt, w_srec, w_ogt, w_orec = [], [], [], []
    return np.asarray(rows), np.asarray(smpl_acc), np.asarray(obj_acc)


def test_windowed_eval_sequence_parity(ref_eval):
    """eval_sequence's aligned v2v + accel columns match the reference
    windowed loop frame-by-frame on a 9-frame sequence with missing recon
    frames and a window that does not divide the length."""
    from vistracker_tpu.eval.evaluator import eval_sequence
    rng = np.random.RandomState(7)
    T, V, O = 9, 50, 14
    sv_gt = rng.randn(T, V, 3)
    ov_gt = rng.randn(T, O, 3) * 0.3 + np.array([0.5, 0.0, 0.2])
    q, _ = np.linalg.qr(rng.randn(3, 3))
    q *= np.sign(np.linalg.det(q))
    drift = 0.9 * np.einsum("ij,tnj->tni", q, sv_gt)
    sv_rc = drift + 0.02 * rng.randn(T, V, 3)
    ov_rc = (0.9 * np.einsum("ij,tnj->tni", q, ov_gt)
             + 0.02 * rng.randn(T, O, 3))
    recon_exist = np.ones(T, bool)
    recon_exist[[2, 5]] = False
    # non-degenerate dummy faces (eval_sequence's chamfer columns need
    # positive surface area; the chamfer itself is compared separately)
    faces_s = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    faces_o = np.array([[0, 1, 2], [3, 4, 5]], np.int32)

    ref_rows, ref_acc_s, ref_acc_o = _reference_windowed_v2v(
        ref_eval, sv_gt, ov_gt, sv_rc, ov_rc, recon_exist, window=4)
    ours = eval_sequence(sv_gt, ov_gt, sv_rc, ov_rc, faces_s, faces_o,
                         recon_exist=recon_exist, window=4,
                         chamfer_samples=16)
    assert ours.shape[0] == ref_rows.shape[0]
    np.testing.assert_allclose(ours[:, 2:4], ref_rows, rtol=1e-6)
    np.testing.assert_allclose(ours[:, 4], ref_acc_s, rtol=1e-5)
    np.testing.assert_allclose(ours[:, 5], ref_acc_o, rtol=1e-5)
