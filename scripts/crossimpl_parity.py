"""Cross-implementation stage-level parity: reference torch vs ours.

Runs the reference implementation's OWN optimization / inference code
(imported from /root/reference via utils/refbridge shims, executed on CPU)
and our TPU-native implementation on IDENTICAL inputs with IDENTICAL
weights, then reports final-output deltas per stage:

  smplt     stage 1-2: preprocess/fit_SMPLH_30fps.py fit_one_batch (the
            full two-phase Adam keypoint fit with temporal losses) vs
            fit/smplt.py:fit_smplt, both initialized from the same fixture
            mocap jsons / person-mask bbox back-projection.  This is the
            one risk class unit goldens cannot see: optimizer DYNAMICS
            (moment resets, w/(1+it//3) decay, phase schedules) landing on
            the same parameters.  Also records the reference's per-step
            loss trace and whether ITS early stop fired (the calibration
            datum for our early-stop gates).
  smoothnet stage 2a: smoothnet/smooth_smplt.py SMPLTSmoother.model_forward
            + post_processing vs fit/smoothing.py:smooth_smplt, same
            torch-initialized SmoothNetSMPL weights imported into flax.
  infiller  stage 5b: interp/test_cinfill_autoreg.py CondMotionInfillAutoreg
            .test (the full autoregressive loop incl. packed-file I/O) vs
            fit/infill.py:make_infiller, same ConditionalMInfiller weights.
            fit/infill.py reproduces the reference clip schedule EXACTLY
            (including its truncated final clip); measured both on the
            180+30k grid and off it (infiller_offgrid).

Writes results/crossimpl_parity.json.  CPU-only by construction (never
contends with a TPU job).  Usage:
    python scripts/crossimpl_parity.py [--stage all] [--frames 24]
"""
import argparse
import json
import os
import os.path as osp
import pickle
import sys
import time
from argparse import Namespace

os.environ["JAX_PLATFORMS"] = "cpu"
for _k in [k for k in os.environ
           if k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "PJRT_"))]:
    os.environ.pop(_k)
# The axon sitecustomize imports jax at INTERPRETER start (before this
# script's first line), so the env edits above don't reach the already-
# loaded config — force the platform on the live config too. CPU-only by
# construction: TPU jobs run concurrently on this host.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from vistracker_tpu.utils.refbridge import (REF, have_reference,
                                            reference_session,
                                            write_ref_model_pkl)


def log(msg):
    print(f"[crossimpl {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def rot_geodesic_deg(Ra, Rb):
    """Mean geodesic angle (deg) between (N, 3, 3) rotation stacks."""
    tr = np.einsum("nij,nij->n", Ra, Rb)
    cos = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return float(np.degrees(np.arccos(cos)).mean())


def aa_to_rotmat_np(aa):
    from scipy.spatial.transform import Rotation
    return Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix()


# ---------------------------------------------------------------------------
# fixture
# ---------------------------------------------------------------------------

def ensure_fixture(scratch, frames, raster=384):
    """Small dedicated fixture sequence (generated once, reused)."""
    meta_path = osp.join(scratch, "meta.npz")
    if osp.isfile(meta_path):
        m = np.load(meta_path)
        fx = {k: m[k] for k in m.files}
        for k in ("seq_dir", "gt_pack", "model_pkl", "objects_root",
                  "seq_name"):
            fx[k] = str(fx[k])
        return fx
    from vistracker_tpu.data.fixture import generate_fixture_sequence
    log(f"generating {frames}-frame fixture (raster {raster})...")
    real_assets = osp.join(REF, "assets") if have_reference() else None
    fx = generate_fixture_sequence(osp.join(scratch, "data"), T=frames,
                                   raster=raster, real_assets=real_assets)
    np.savez(meta_path, **fx)
    return fx


# ---------------------------------------------------------------------------
# stage 1-2: SMPL-T keypoint fit
# ---------------------------------------------------------------------------

def run_ref_smplt(fx, scratch, max_iters=100, global_iters=8, end=None):
    """Reference SMPLHFitter30fps.fit_one_batch on the fixture sequence.

    Returns dict(pose, betas, trans, verts, losses, iters_used,
    early_stopped)."""
    assets = osp.join(osp.dirname(fx["model_pkl"]), "assets")
    model_root = osp.join(scratch, "ref_model_root")
    with open(fx["model_pkl"], "rb") as f:
        write_ref_model_pkl(pickle.load(f),
                            osp.join(model_root, "SMPLH_male.pkl"))

    cap = {}
    with reference_session(osp.join(scratch, "ref_cwd"),
                           SMPL_ASSETS_ROOT=assets,
                           SMPL_MODEL_ROOT=model_root):
        import torch
        from preprocess.fit_SMPLH_30fps import SMPLHFitter30fps

        class Capture(SMPLHFitter30fps):
            def __init__(self, *a, **k):
                super().__init__(*a, **k)
                self.loss_trace = []

            def get_max_iters(self):
                return max_iters

            def get_globalopt_iters(self):
                return global_iters

            def sum_dict(self, loss_dict, weight_dict, it):
                # instance override shadows the base staticmethod; called
                # as self.sum_dict in fit_one_batch (fit_SMPLH_kpts.py:148)
                tot = SMPLHFitter30fps.sum_dict(loss_dict, weight_dict, it)
                self.loss_trace.append(float(tot.detach()))
                return tot

            def save_smpl_mesh(self, faces, outfile, ridx, verts):
                pass  # no ply output

            def save_results(self, smpl, seq_folder, kid, start, end,
                             kpts_scores, image_files):
                with torch.no_grad():
                    verts, _, _, _ = smpl()
                cap.update(
                    pose=smpl.pose.detach().numpy().copy(),
                    betas=smpl.betas.detach().numpy().copy(),
                    trans=smpl.trans.detach().numpy().copy(),
                    verts=verts.numpy().copy())

        fitter = Capture(device="cpu", debug=False, init_type="mocap",
                         args=Namespace(icap=False))
        t0 = time.time()
        fitter.fit_one_batch(fx["seq_dir"], 1, 0, end, redo=True)
        cap["seconds"] = time.time() - t0
        cap["losses"] = fitter.loss_trace
    steps = len(cap["losses"])
    cap["iters_used"] = steps // 10
    cap["early_stopped"] = steps < max_iters * 10
    return cap


def run_our_smplt(fx, max_iters=100, global_iters=8, end=None,
                  total_steps=0):
    """Our fit_smplt with real_track stage-1 initialization (identical
    inputs: same mocap jsons, same mask bboxes, same kpt files)."""
    import jax.numpy as jnp
    from vistracker_tpu.core.smpl import load_smpl_pkl, lbs_forward
    from vistracker_tpu.core.landmarks import load_landmarks
    from vistracker_tpu.core.priors import (load_body_prior, load_hand_prior,
                                            mean_hand_pose)
    from vistracker_tpu.core.smpl_generator import smplh_params
    from vistracker_tpu.data.behave import FrameDataReader
    from vistracker_tpu.fit.smplt import (SMPLTFitConfig, fit_smplt,
                                          init_trans_from_bbox)

    assets = osp.join(osp.dirname(fx["model_pkl"]), "assets")
    model = load_smpl_pkl(fx["model_pkl"])
    landmarks = load_landmarks(assets)
    body_prior = load_body_prior(assets)
    hand_prior = load_hand_prior(assets)
    mean_hands = mean_hand_pose(assets)
    reader = FrameDataReader(fx["seq_dir"])
    T = reader.cvt_end(end)
    kpts, mocap_poses, bbox_centers = [], [], []
    for idx in range(T):
        kpts.append(reader.get_body_kpts(idx, 1, tol=0.1))
        p, _ = reader.get_mocap_params(idx, 1)
        mocap_poses.append(p)
        pm = reader.get_mask(idx, 1, "person")
        ys, xs = np.nonzero(pm)
        bbox_centers.append([(xs.max() + xs.min()) // 2,
                             (ys.max() + ys.min()) // 2])
    cfg = SMPLTFitConfig(max_iters=max_iters, global_iters=global_iters,
                         total_steps_cap=total_steps)
    betas0 = np.zeros((T, 10), np.float32)
    betas0[:, 0] = 2.2
    init = smplh_params(np.stack(mocap_poses), betas0,
                        init_trans_from_bbox(
                            np.asarray(bbox_centers, np.float32), cfg),
                        mean_hands=mean_hands)
    t0 = time.time()
    params, losses = fit_smplt(model, landmarks, body_prior, hand_prior,
                               jnp.asarray(np.stack(kpts), jnp.float32),
                               init, cfg)
    pose = np.asarray(params.pose)
    betas = np.asarray(params.betas)
    trans = np.asarray(params.trans)
    verts, _, _, _ = lbs_forward(model, jnp.asarray(pose),
                                 jnp.asarray(betas), jnp.asarray(trans))
    return dict(pose=pose, betas=betas, trans=trans,
                verts=np.asarray(verts), losses=np.asarray(losses).tolist(),
                seconds=time.time() - t0, model=model)


def stage_smplt(fx, scratch, max_iters=100, global_iters=8, end=None,
                match_ref_budget=False):
    log("stage smplt: running the REFERENCE fitter (torch CPU)...")
    ref = run_ref_smplt(fx, scratch, max_iters, global_iters, end)
    log(f"  reference done in {ref['seconds']:.0f}s, iters "
        f"{ref['iters_used']}/{max_iters}, early_stop={ref['early_stopped']}")
    total_steps = 0
    if match_ref_budget and ref["early_stopped"]:
        # the reference's early stop fired (its loss-scaled gate,
        # fit_SMPLH_kpts.py:163, trips easily at small budgets where the
        # loss is still large when the 0.3*max_iter gate opens): compare
        # landing points at the EXACT same step count — its break need
        # not fall on an iteration boundary.
        total_steps = len(ref["losses"])
        log(f"  matching our budget to the reference's stop: "
            f"{total_steps} steps")
    log("stage smplt: running OUR fitter (jax CPU)...")
    ours = run_our_smplt(fx, max_iters, global_iters, end, total_steps)
    log(f"  ours done in {ours['seconds']:.0f}s")

    import jax.numpy as jnp
    from vistracker_tpu.core.smpl import lbs_forward
    # our LBS on the reference's final params: isolates optimizer-landing
    # deltas from LBS deltas (LBS parity is separately unit-tested)
    v_ref_ours, _, _, _ = lbs_forward(
        ours["model"], jnp.asarray(ref["pose"], jnp.float32),
        jnp.asarray(ref["betas"], jnp.float32),
        jnp.asarray(ref["trans"], jnp.float32))
    v_ref_ours = np.asarray(v_ref_ours)

    v2v_params_cm = float(np.linalg.norm(
        v_ref_ours - ours["verts"], axis=-1).mean() * 100)
    v2v_impl_cm = float(np.linalg.norm(
        ref["verts"] - ours["verts"], axis=-1).mean() * 100)
    Ra = aa_to_rotmat_np(ref["pose"][:, :3])
    Rb = aa_to_rotmat_np(ours["pose"][:, :3])
    res = dict(
        frames=int(len(ref["pose"])),
        ref_seconds=ref["seconds"], our_seconds=ours["seconds"],
        ref_iters_used=ref["iters_used"],
        ref_early_stopped=bool(ref["early_stopped"]),
        ref_loss_first=ref["losses"][0], ref_loss_last=ref["losses"][-1],
        our_loss_first=ours["losses"][0], our_loss_last=ours["losses"][-1],
        body_pose_mae_rad=float(np.abs(
            ref["pose"][:, 3:66] - ours["pose"][:, 3:66]).mean()),
        global_rot_deg=rot_geodesic_deg(Ra, Rb),
        trans_mae_mm=float(np.abs(
            ref["trans"] - ours["trans"]).mean() * 1000),
        betas_mae=float(np.abs(ref["betas"] - ours["betas"]).mean()),
        fitted_v2v_cm=v2v_params_cm,
        fitted_v2v_incl_lbs_cm=v2v_impl_cm,
        ref_loss_trace_tail=[float(x) for x in ref["losses"][-30:]],
    )
    # early-stop firing analysis on the reference trace (the condition at
    # fit_SMPLH_kpts.py:163: |prev-loss|/prev < prev*1e-3 after 30% iters)
    tr = np.asarray(ref["losses"])
    rel = np.abs(np.diff(tr)) / np.maximum(tr[:-1], 1e-12)
    fire = (rel < tr[:-1] * 1e-3) & (np.arange(1, len(tr)) // 10
                                     > 0.3 * max_iters)
    res["ref_early_stop_condition_first_step"] = (
        int(np.argmax(fire)) if fire.any() else -1)
    return res


# ---------------------------------------------------------------------------
# stage 2a: SmoothNet runner
# ---------------------------------------------------------------------------

def stage_smoothnet(fx, scratch):
    import torch
    import jax.numpy as jnp

    T, W = 120, 64
    rng = np.random.RandomState(7)
    # noisy SMPL-T trajectory: smooth fixture-style motion + jitter
    t = np.linspace(0, 1, T).astype(np.float32)
    poses = np.zeros((T, 156), np.float32)
    poses[:, 2] = 0.4 * np.sin(2 * np.pi * t)
    poses[:, 5] = 0.3 * np.cos(2 * np.pi * t)
    poses += rng.randn(T, 156).astype(np.float32) * 0.03
    betas = np.tile(rng.randn(10).astype(np.float32) * 0.5, (T, 1))
    trans = np.stack([0.2 * np.sin(2 * np.pi * t), 0.1 * t,
                      2.2 + 0.1 * np.cos(np.pi * t)], -1).astype(np.float32)
    trans += rng.randn(T, 3).astype(np.float32) * 0.01

    torch.manual_seed(3)
    from vistracker_tpu.models.torch_import import smoothnet_params
    ck_path = osp.join(scratch, "sn_ck.pth.tar")

    with reference_session(osp.join(scratch, "ref_cwd_sn")):
        from smoothnet.smooth_smplt import SMPLTSmoother
        from smoothnet.models.smoothnet_smpl import SmoothNetSMPL as TSN

        tmodel = TSN(window_size=W, output_size=W, hidden_size=512,
                     res_hidden_size=16, num_blocks=1, dropout=0.5)
        torch.save({"epoch": 20, "state_dict": tmodel.state_dict()}, ck_path)
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

        from vistracker_tpu.utils.refbridge import CfgTree
        cfg = CfgTree()
        cfg.DEVICE = "cpu"
        cfg.MODEL = CfgTree(dict(NAME="smoothnet-smpl", SLIDE_WINDOW_SIZE=W,
                                 HIDDEN_SIZE=512, RES_HIDDEN_SIZE=16,
                                 NUM_BLOCK=1, DROPOUT=0.5))
        cfg.EVALUATE = CfgTree(dict(PRETRAINED=ck_path, OUTDIR=scratch,
                                    SLIDE_WINDOW_STEP_SIZE=1, TEST_KID=1))
        raw = dict(poses=poses, betas=betas, trans=trans, gender="male",
                   frames=[f"t{i:04d}.000" for i in range(T)])

        class DirectSmoother(SMPLTSmoother):
            def load_inputs_raw(self, seq_folder, test_kid=1):
                return raw

        sm = DirectSmoother(cfg)
        data, denoised, input_pred = sm.model_forward(cfg, None)
        ref_out = sm.post_processing(data, denoised, input_pred)
        ref_poses = np.asarray(ref_out["poses"])
        ref_betas = np.asarray(ref_out["betas"])
        ref_trans = np.asarray(ref_out["trans"])

    params = smoothnet_params(sd, smpl=True)
    from vistracker_tpu.fit.smoothing import smooth_smplt
    ours = smooth_smplt(params, poses, betas, trans, window=W)

    Ra = aa_to_rotmat_np(ref_poses.reshape(-1, 3))
    Rb = aa_to_rotmat_np(ours["poses"].reshape(-1, 3))
    return dict(
        frames=T,
        pose_rot_deg=rot_geodesic_deg(Ra, Rb),
        betas_mae=float(np.abs(ref_betas - ours["betas"]).mean()),
        trans_mae_mm=float(np.abs(ref_trans - ours["trans"]).mean() * 1000),
    )


# ---------------------------------------------------------------------------
# stage 5b: autoregressive infiller
# ---------------------------------------------------------------------------

def _synth_motion(T, seed=11):
    from scipy.spatial.transform import Rotation
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 4, T).astype(np.float32)
    poses = np.zeros((T, 156), np.float32)
    poses[:, 2] = 0.4 * np.sin(2 * np.pi * t)
    poses[:, 50] = 0.3 * np.cos(1.5 * np.pi * t)
    trans = np.stack([0.3 * np.sin(np.pi * t), 0.05 * t,
                      2.3 + 0.1 * np.cos(np.pi * t)], -1).astype(np.float32)
    rot = Rotation.from_euler(
        "yxz", np.stack([1.3 * t, 0.2 * np.sin(2 * t),
                         0.1 * t], -1)).as_matrix().astype(np.float32)
    occ = np.full(T, 0.9, np.float32)
    occ[T // 3:T // 3 + 50] = 0.1          # one long occlusion interval
    occ[int(0.75 * T):int(0.75 * T) + 20] = 0.2
    occ += rng.randn(T).astype(np.float32) * 0.01
    return poses, trans, rot, occ


def stage_infiller(fx, scratch, T=300):
    import json as _json
    import re
    import torch
    import jax.numpy as jnp

    poses, trans, rot, occ = _synth_motion(T)
    seq_name = "Date09_Sub99_boxmedium"
    txt = re.sub(r"//.*", "", open(f"{REF}/config/cmf-k4-lrot.json").read())
    cfg_dict = _json.loads(txt)

    torch.manual_seed(5)
    out = {}
    with reference_session(osp.join(scratch, "ref_cwd_inf")) as _:
        scr = osp.join(scratch, "ref_cwd_inf")
        from interp.test_cinfill_autoreg import CondMotionInfillAutoreg
        from model import ConditionalMInfiller as TCMI

        args = Namespace(**cfg_dict)
        args.occ_thres = 0.5
        args.occ_pred = True
        args.neural_pca = False
        args.smpl_recon_name = "smplt-smoothed-fit"
        args.obj_recon_name = "smooth-objrot"
        args.save_name = "xharness"
        args.seq_folder = osp.join(scr, seq_name)
        os.makedirs(args.seq_folder, exist_ok=True)
        args.outdir = scr

        tmodel = TCMI(args)
        tmodel.eval()
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

        # packed inputs in the exact stage-5 layout
        frames = [f"t{i:04d}.000" for i in range(T)]
        smpl_pack = dict(poses=poses, betas=np.zeros((T, 10), np.float32),
                         trans=trans, obj_trans=np.zeros((T, 3), np.float32),
                         frames=frames)
        obj_pack = dict(obj_angles=rot.transpose(0, 2, 1), frames=frames,
                        obj_trans=np.zeros((T, 3), np.float32),
                        neural_visibility=occ[:, None].astype(np.float64))
        for name, pack in ((args.smpl_recon_name, smpl_pack),
                           (args.obj_recon_name, obj_pack)):
            d = osp.join(scr, f"recon_{name}")
            os.makedirs(d, exist_ok=True)
            with open(osp.join(d, f"{seq_name}_k1.pkl"), "wb") as f:
                pickle.dump(pack, f)

        tester = CondMotionInfillAutoreg.__new__(CondMotionInfillAutoreg)
        tester.device = "cpu"
        tester.outdir = scr
        tester.exp_name = args.exp_name
        tester.icap_kid = 2
        tester.model = tmodel
        tester.multi_gpus = False
        tester.test(args)

        import joblib  # the real one when installed, pickle stub otherwise
        ref_pack = joblib.load(osp.join(scr, f"recon_{args.save_name}",
                                        f"{seq_name}_k1.pkl"))
        out["ref_rot"] = np.asarray(
            ref_pack["obj_angles"]).transpose(0, 2, 1)

    from vistracker_tpu.models.infiller import (ConditionalMInfiller,
                                                InfillerConfig)
    from vistracker_tpu.models.torch_import import infiller_params
    from vistracker_tpu.fit.infill import make_infiller
    icfg = InfillerConfig()
    params = infiller_params(sd, icfg)
    run = make_infiller(ConditionalMInfiller(icfg), icfg)
    ours = run(params, poses, trans, rot, occ)
    assert ours is not None, "seed gate rejected the first clip"

    occ_mask = occ < 0.5
    res = dict(
        frames=T,
        rot_deg_all=rot_geodesic_deg(out["ref_rot"], ours),
        rot_deg_occluded=rot_geodesic_deg(out["ref_rot"][occ_mask],
                                          ours[occ_mask]),
        rot_deg_visible=rot_geodesic_deg(out["ref_rot"][~occ_mask],
                                         ours[~occ_mask]),
    )
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=("all", "smplt", "smoothnet", "infiller"))
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--fixture-meta", default=None,
                    help="reuse an existing fixture (path to its meta npz, "
                         "e.g. fixture_run_rel/fixture_meta.npz) instead of "
                         "rendering one on CPU; --frames then limits how "
                         "many of its frames the smplt stage fits")
    ap.add_argument("--infill-frames", type=int, default=300)
    ap.add_argument("--scratch", default="crossimpl_scratch")
    ap.add_argument("--results", default="results/crossimpl_parity.json")
    args = ap.parse_args()
    if not have_reference():
        raise SystemExit("reference repo not available")

    scratch = osp.abspath(args.scratch)
    os.makedirs(scratch, exist_ok=True)
    report = {}
    if osp.isfile(args.results):
        with open(args.results) as f:
            report = json.load(f)

    fx = None
    if args.stage in ("all", "smplt"):
        if args.fixture_meta:
            m = np.load(args.fixture_meta)
            fx = {k: m[k] for k in m.files}
            for k in ("seq_dir", "gt_pack", "model_pkl", "objects_root"):
                # reference_session chdirs away: paths must be absolute
                fx[k] = osp.abspath(str(fx[k]))
            fx["seq_name"] = str(fx["seq_name"])
        else:
            fx = ensure_fixture(scratch, args.frames)
        report["smplt"] = stage_smplt(fx, scratch, end=args.frames)
        log(f"smplt: {json.dumps(report['smplt'], indent=1)}")
    if args.stage in ("all", "smoothnet"):
        report["smoothnet"] = stage_smoothnet(fx, scratch)
        log(f"smoothnet: {json.dumps(report['smoothnet'], indent=1)}")
    if args.stage in ("all", "infiller"):
        report["infiller"] = stage_infiller(fx, scratch,
                                            T=args.infill_frames)
        log(f"infiller: {json.dumps(report['infiller'], indent=1)}")
        # off the 180+30k grid: exercises the truncated-final-clip schedule
        report["infiller_offgrid"] = stage_infiller(fx, scratch,
                                                    T=args.infill_frames + 16)
        log(f"infiller_offgrid: "
            f"{json.dumps(report['infiller_offgrid'], indent=1)}")

    os.makedirs(osp.dirname(args.results) or ".", exist_ok=True)
    with open(args.results, "w") as f:
        json.dump(report, f, indent=2)
    log(f"wrote {args.results}")


if __name__ == "__main__":
    main()
