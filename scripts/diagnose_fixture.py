"""Per-stage object diagnostics for a fixture_run output.

Pinpoints where object accuracy is lost: neural center prediction (stage 4),
rotation init from PCA (stage 5 input), smoothed/infilled rotation (stage 5
output, approximated by re-running smoothing is skipped — we compare final),
or joint optimization (stage 6).

Usage: python scripts/diagnose_fixture.py --run fixture_run
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def geodesic_deg(Ra, Rb):
    from vistracker_tpu.eval.evaluator import rotation_errors_deg
    return rotation_errors_deg(Ra, Rb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="fixture_run")
    ap.add_argument("--net-preset", default="tiny",
                    help="which run_fixture_eval preset's recon to "
                         "diagnose (non-tiny paths carry a _PRESET suffix)")
    ap.add_argument("--recon-tag", default="",
                    help="extra recon-dir suffix used by run_fixture_eval "
                         "--recon-tag variants (B-ladder chunk sizes, "
                         "--collision, --ocent runs)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--heldout", action="store_true",
                    help="diagnose the held-out-motion recon "
                         "(fixture2_meta + recon_heldout paths)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from vistracker_tpu.data.packed import load_packed_recon as load_packed
    from vistracker_tpu.core.smpl import load_smpl_pkl, lbs_forward
    from vistracker_tpu.core.landmarks import load_landmarks
    from vistracker_tpu.core.rotations import axis_angle_to_rotmat
    from vistracker_tpu.data.sampling import compute_pca_axes
    from vistracker_tpu.fit.joint import init_object_orientation
    from vistracker_tpu.utils.mesh import load_ply

    meta = "fixture2_meta.npz" if args.heldout else "fixture_meta.npz"
    m = np.load(osp.join(args.run, meta))
    fx = {k: m[k] for k in m.files}
    seq_name = str(fx["seq_name"])
    psuf = "" if args.net_preset == "tiny" else f"_{args.net_preset}"
    rsuf = psuf + (f"_{args.recon_tag}" if args.recon_tag else "")
    rdir = ("recon_heldout" if args.heldout else "recon") + rsuf
    recon = load_packed(osp.join(args.run, rdir, "recon_fixture",
                                 f"{seq_name}_k1.pkl"))
    gt = load_packed(str(fx["gt_pack"]))
    T = recon.num_frames

    rot_gt = np.asarray(fx["rot_gt"])            # (T,3,3) real rotations
    t_gt = np.asarray(fx["obj_trans_gt"])        # (T,3)
    occ = np.asarray(fx["occ_ratios"])[:, 1] if fx["occ_ratios"].ndim == 2 \
        else np.asarray(fx["occ_ratios"])
    vis = occ > 0.5

    # stage-4 neural center: neural_trans is relative to the SMPL body
    # center. At inference the base was the stage-2 smoothed body center;
    # the pack stores the stage-6a refined poses, so the base recomputed
    # here carries a cm-scale bias — fine for attributing the ~0.4 m
    # object-center failure, not for cm-accurate stage-4 numbers.
    model = load_smpl_pkl(str(fx["model_pkl"]))
    lms = load_landmarks(osp.join(args.run, "data", "assets"))
    verts, _, _, _ = lbs_forward(model, jnp.asarray(recon.poses),
                                 jnp.asarray(recon.betas),
                                 jnp.asarray(recon.trans))
    bc = np.asarray(lms.smpl_center(verts))
    t_neural = np.asarray(recon.neural_trans) + bc
    pred_vis = np.asarray(recon.neural_visibility).reshape(-1)

    temp_v, _ = load_ply(osp.join(str(fx["objects_root"]), "boxmedium",
                                  "boxmedium.ply"))
    temp_v = temp_v - temp_v.mean(0)
    pca_init = compute_pca_axes(temp_v)
    # init_object_orientation returns the packed/row-vector convention;
    # transpose to REAL rotations like real_track does before smoothing
    # (real_track.py: rot_real = rot_init.transpose(0, 2, 1))
    rot_init = np.asarray(init_object_orientation(
        jnp.asarray(recon.neural_pca),
        jnp.broadcast_to(jnp.asarray(pca_init), (T, 3, 3))
    )).transpose(0, 2, 1)

    # final stage-6 pose (packed obj_angles are transposed)
    rot_fin = np.asarray(recon.obj_angles).transpose(0, 2, 1)
    t_fin = np.asarray(recon.obj_trans)

    def stats(name, err, mask=None):
        rows = [("all", np.ones(T, bool)), ("visible", vis),
                ("occluded", ~vis)]
        out = {}
        for label, msk in rows:
            if mask is not None:
                msk = msk & mask
            out[label] = float(np.mean(err[msk])) if msk.any() else None
        fmt = lambda v: "n/a" if v is None else f"{v:.4g}"
        print(f"{name:38s} all={fmt(out['all'])}  "
              f"vis={fmt(out['visible'])}  occ={fmt(out['occluded'])}")
        return out

    print(f"frames={T}, visible={int(vis.sum())}, occluded={int((~vis).sum())}")
    print(f"GT box extent: {temp_v.max(0) - temp_v.min(0)}")
    rep = {}
    rep["neural_center_m"] = stats("stage4 neural center err (m)",
                                   np.linalg.norm(t_neural - t_gt, axis=1))
    rep["pred_vis_corr"] = float(np.corrcoef(pred_vis, occ)[0, 1])
    print(f"predicted-visibility corr with GT occ: {rep['pred_vis_corr']:.3f}")
    rep["rot_init_deg"] = stats("stage5-in PCA rotation err (deg)",
                                geodesic_deg(rot_init, rot_gt))
    rep["rot_final_deg"] = stats("stage6 final rotation err (deg)",
                                 geodesic_deg(rot_fin, rot_gt))
    rep["t_final_m"] = stats("stage6 final center err (m)",
                             np.linalg.norm(t_fin - t_gt, axis=1))
    # SMPL sanity
    gt_verts, _, _, _ = lbs_forward(model, jnp.asarray(gt.poses),
                                    jnp.asarray(gt.betas),
                                    jnp.asarray(gt.trans))
    rep["smpl_v2v_cm"] = float(np.linalg.norm(
        np.asarray(verts) - np.asarray(gt_verts), axis=-1).mean() * 100)
    print(f"SMPL raw (unaligned) v2v: {rep['smpl_v2v_cm']:.2f} cm")
    hsuf = "_heldout" if args.heldout else ""
    with open(osp.join(args.run, f"diagnostics{hsuf}{rsuf}.json"), "w") as f:
        json.dump(rep, f, indent=2, default=float)


if __name__ == "__main__":
    main()
