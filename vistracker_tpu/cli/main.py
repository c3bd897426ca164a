"""vistracker_tpu command-line pipeline driver.

Mirrors the reference's 7-stage demo (scripts/demo.sh) as subcommands, plus
a fused `track` command that keeps the whole sequence resident on device
across stages (the <30 min/1500-frame design target, SURVEY.md §7).

`track --synthetic` runs the COMPLETE pipeline on a generated scene with
randomly initialized networks — the end-to-end integration surface
(stage wiring, packed-file contract, eval) without BEHAVE data or released
checkpoints:

  1. SMPL-T keypoint pre-fit            (fit.smplt)
  2. SmoothNet smooth + re-fit          (fit.smoothing + fit.smplt)
  3. triplane mask rendering            (ops.rasterizer)
  4. SIF-Net encode + surface generator (models.sifnet + fit.generator)
  5. object-rot smoothing + HVOP infill (fit.smoothing + fit.infill)
  6. joint SMPL+object optimization     (fit.joint)
  7. packed outputs + windowed eval     (data.packed + eval.evaluator)
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _stage(msg):
    print(f"[vistracker] {msg}", flush=True)


def run_synthetic_track(args) -> dict:
    import jax
    import jax.numpy as jnp
    from ..cli.synthetic import make_scene
    from ..fit.smplt import (SMPLTFitConfig, SMPLTParams, fit_smplt,
                             init_trans_from_bbox)
    from ..fit.smoothing import smooth_smplt, smooth_objrot
    from ..fit.infill import make_infiller
    from ..fit.generator import GeneratorConfig, make_generator, sifnet_query_fn
    from ..fit.joint import (JointFitConfig, make_smpl_optimizer,
                             make_object_optimizer, init_object_orientation,
                             transform_obj_verts)
    from ..models.sifnet import SIFNet, SIFNetConfig
    from ..models.smoothnet import SmoothNet, SmoothNetSMPL
    from ..models.infiller import ConditionalMInfiller, InfillerConfig
    from ..ops.rasterizer import rasterize_mask, \
        render_triplane_masks_batch
    from ..core.smpl import lbs_forward
    from ..core.camera import PerspectiveCamera
    from ..data.packed import PackedRecon, save_packed, load_packed_recon, \
        recon_obj_verts
    from ..data.silprep import prepare_sil_refs
    from ..eval.evaluator import (eval_sequence, collect_results,
                                  smpl_verts_from_packed)

    t_start = time.time()
    os.makedirs(args.out, exist_ok=True)
    T = args.frames
    scene = make_scene(T, num_verts=args.verts, seed=args.seed)
    cam = PerspectiveCamera(crop_size=1200)
    net_size = args.image_size
    timings = {}

    def norm_kpts(kpts_px, crop_centers):
        xy = 2.0 * (600.0 + kpts_px[..., :2] - crop_centers[:, None, :]) \
            / 1200.0 - 1.0
        return np.concatenate([xy, kpts_px[..., 2:]], -1).astype(np.float32)

    # ---------------- stage 1: SMPL-T keypoint pre-fit ----------------
    _stage("stage 1/7: SMPL-T keypoint fitting")
    t0 = time.time()
    fit_cfg = SMPLTFitConfig(global_iters=args.global_iters,
                             max_iters=args.smplt_iters)
    bbox_centers = scene.kpts[:, :, :2].mean(1)
    init = SMPLTParams.from_full(
        jnp.asarray(np.tile(scene.poses_gt[:1] * 0.0, (T, 1))),
        jnp.zeros((T, 10)),
        jnp.asarray(init_trans_from_bbox(bbox_centers, fit_cfg)))
    params1, _ = fit_smplt(scene.model, scene.landmarks, scene.body_prior,
                           scene.hand_prior, jnp.asarray(scene.kpts), init,
                           fit_cfg)
    timings["smplt_fit"] = time.time() - t0

    # ---------------- stage 2: SmoothNet smooth + re-fit ----------------
    _stage("stage 2/7: SmoothNet smoothing + re-fit")
    t0 = time.time()
    W = min(64, T)
    sn_smpl = SmoothNetSMPL(window_size=W, output_size=W)
    sn_params = sn_smpl.init(jax.random.PRNGKey(1), jnp.zeros((1, 157, W)))
    poses1 = np.asarray(params1.pose)
    smoothed = smooth_smplt(sn_params, poses1, np.asarray(params1.betas),
                            np.asarray(params1.trans), window=W)
    # re-fit from smoothed init (fit_SMPLH_smoothed: 30 iters, no global)
    poses_sm = np.zeros((T, 156), np.float32)
    poses_sm[:, :66] = smoothed["poses"][:, :66]
    refit_cfg = SMPLTFitConfig(max_iters=args.refit_iters)
    init2 = SMPLTParams.from_full(
        jnp.asarray(poses_sm), jnp.asarray(smoothed["betas"]),
        jnp.asarray(smoothed["trans"]))
    params2, _ = fit_smplt(scene.model, scene.landmarks, scene.body_prior,
                           scene.hand_prior, jnp.asarray(scene.kpts), init2,
                           refit_cfg, skip_global_phase=True)
    smplt_pack = os.path.join(args.out, "recon_smplt-smoothed-fit.pkl")
    save_packed(smplt_pack, dict(
        poses=np.asarray(params2.pose), betas=np.asarray(params2.betas),
        trans=np.asarray(params2.trans),
        obj_angles=np.broadcast_to(np.eye(3), (T, 3, 3)).copy(),
        obj_trans=np.zeros((T, 3)), obj_scales=np.zeros(T),
        gender="male", frames=[f"t{i:04d}.000" for i in range(T)]))
    timings["smooth_refit"] = time.time() - t0

    # ---------------- stage 3: triplane rendering ----------------
    _stage("stage 3/7: triplane rendering")
    t0 = time.time()
    verts2, _, _, _ = lbs_forward(scene.model, params2.pose, params2.betas,
                                  params2.trans)
    body_centers = scene.landmarks.smpl_center(verts2)  # (T, 3)
    smpl_faces = jnp.asarray(scene.smpl_faces[:256])
    triplanes = render_triplane_masks_batch(verts2, smpl_faces,
                                            body_centers, net_size)
    timings["triplane"] = time.time() - t0

    # ---------------- stage 4: SIF-Net + surface generation ----------------
    _stage("stage 4/7: SIF-Net neural reconstruction")
    t0 = time.time()
    sif_cfg = SIFNetConfig(num_stack=args.sif_stacks, num_hourglass=1,
                           hourglass_dim=32, tmpx_dim=32, triplane_stack=args.sif_stacks,
                           triplane_hg_dim=32, triplane_tmpx_dim=32,
                           hidden_dim=16)
    sifnet = SIFNet(sif_cfg, cam)
    crop_centers = np.asarray(cam.project_screen(body_centers[:, None, :]))[:, 0]

    # build 8-channel inputs: masks rasterized in crop space + triplanes
    def crop_ndc(v):
        return np.asarray(cam.project_points(v, jnp.asarray(crop_centers)))

    ndc_smpl = crop_ndc(verts2)[..., :2]
    obj_gt_world = recon_obj_verts(scene.temp_verts, scene.obj_rot_gt,
                                   scene.obj_trans_gt, np.ones(T))
    ndc_obj = crop_ndc(jnp.asarray(obj_gt_world))[..., :2]
    person_masks = np.stack([np.asarray(rasterize_mask(
        jnp.asarray(ndc_smpl[i]), smpl_faces, net_size)) for i in range(T)])
    obj_masks = np.stack([np.asarray(rasterize_mask(
        jnp.asarray(ndc_obj[i]), jnp.asarray(scene.temp_faces), net_size))
        for i in range(T)])
    rgb = np.repeat(person_masks[..., None], 3, -1) * 0.5 \
        + np.repeat(obj_masks[..., None], 3, -1) * 0.3
    images = np.concatenate(
        [rgb, person_masks[..., None], obj_masks[..., None],
         np.asarray(triplanes)], -1).astype(np.float32)

    from ..models.sifnet import pack_cache
    sif_params = sifnet.init(jax.random.PRNGKey(2), jnp.asarray(images[:1]),
                             jnp.zeros((1, 8, 3)),
                             jnp.asarray(crop_centers[:1]),
                             body_centers[:1])
    cache = pack_cache(sifnet.apply(sif_params, jnp.asarray(images),
                                    method=SIFNet.encode))
    gen_cfg = GeneratorConfig(num_steps=4, num_rounds=2,
                              samples_per_round=args.gen_samples,
                              num_points=args.gen_points)
    generate = make_generator(sifnet_query_fn(sifnet), gen_cfg)
    pc = generate(sif_params, cache, jnp.asarray(crop_centers), body_centers,
                  jax.random.PRNGKey(3))
    neural_pack = os.path.join(args.out, "recon_neural.pkl")
    save_packed(neural_pack, dict(
        neural_pca=np.asarray(pc["object"]["pca_axis"]),
        neural_trans=np.asarray(pc["object"]["centers"]),
        neural_visibility=np.asarray(pc["object"]["visibility"])[:, 0],
        recon_exist=np.ones(T, bool), recon_name="neural",
        frames=[f"t{i:04d}.000" for i in range(T)], gender="male"))
    timings["sifnet_recon"] = time.time() - t0

    # ---------------- stage 5: object-rot smoothing + infill ----------------
    _stage("stage 5/7: SmoothNet object rotation + HVOP-Net infill")
    t0 = time.time()
    from ..data.sampling import compute_pca_axes
    pca_init = compute_pca_axes(scene.temp_verts)  # sklearn-sign PCA axes
    rot_neural = np.asarray(init_object_orientation(
        jnp.asarray(np.asarray(pc["object"]["pca_axis"])),
        jnp.broadcast_to(jnp.asarray(pca_init), (T, 3, 3))))
    rot_real = rot_neural.transpose(0, 2, 1)
    Wr = min(64, T)
    sn_rot = SmoothNet(window_size=Wr, output_size=Wr)
    snr_params = sn_rot.init(jax.random.PRNGKey(4), jnp.zeros((1, 6, Wr)))
    obj_angles_sm = smooth_objrot(snr_params, rot_real, window=Wr)

    inf_cfg = InfillerConfig(clip_len=min(180, max(4, T)),
                             window=max(1, min(30, T // 3)))
    infiller = ConditionalMInfiller(inf_cfg)
    inf_params = infiller.init(
        jax.random.PRNGKey(5), jnp.zeros((1, inf_cfg.clip_len, 147)),
        jnp.zeros((1, inf_cfg.clip_len), bool),
        jnp.zeros((1, inf_cfg.clip_len, 6)),
        jnp.zeros((1, inf_cfg.clip_len), bool))
    run_infill = make_infiller(infiller, inf_cfg)
    occ = np.asarray(pc["object"]["visibility"])[:, 0]
    occ = np.where(np.isfinite(occ), occ, scene.occ_ratios)
    rots_filled = run_infill(inf_params, np.asarray(params2.pose),
                             np.asarray(params2.trans),
                             obj_angles_sm.transpose(0, 2, 1), occ,
                             occ_thres=0.5, init_thres=0.0)
    if rots_filled is None:
        rots_filled = obj_angles_sm.transpose(0, 2, 1)
    timings["smooth_infill"] = time.time() - t0

    # ---------------- stage 6: joint optimization ----------------
    _stage("stage 6/7: joint SMPL+object optimization")
    t0 = time.time()
    jcfg = JointFitConfig(
        iter_betas=1, iter_pose=1, iter_kpts=1,
        smpl_max_iter=args.joint_smpl_iters, iter_obj=args.joint_obj_iters,
        iter_sil=args.joint_sil_iters, joint_max_iter=args.joint_iters,
        sil_size=64, sil_sigma=1 / 32.0,
        sil_backend=getattr(args, "sil_backend", "auto"))
    cc = jnp.asarray(crop_centers)
    bc = body_centers
    ctx = dict(params=sif_params, cache=cache, cc=cc, bc=bc)

    def query_fn(ctx, points):
        return sifnet.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                            ctx["bc"], method=SIFNet.query)[-1]

    def project_norm(ctx, joints):
        return cam.project_points(joints, ctx["cc"])[..., :2]

    opt_smpl = make_smpl_optimizer(query_fn, project_norm, scene.model,
                                   scene.landmarks, scene.body_prior,
                                   scene.hand_prior, scene.part_labels, jcfg)
    kpts_norm = norm_kpts(scene.kpts, crop_centers)
    smpl_final, _ = opt_smpl(params2, jnp.asarray(kpts_norm), ctx)

    verts_final, _, _, _ = lbs_forward(scene.model, smpl_final.pose,
                                       smpl_final.betas, smpl_final.trans)
    sil = prepare_sil_refs(person_masks, obj_masks, crop_centers, 1200,
                           net_size, jcfg.sil_size)

    def project_px(ctx, points):
        return cam.project_screen(points)

    opt_obj = make_object_optimizer(query_fn, project_px, jcfg)
    obj_t0 = np.asarray(pc["object"]["centers"]) + np.asarray(bc)
    obj_pts = jnp.broadcast_to(jnp.asarray(scene.temp_verts),
                               (T,) + scene.temp_verts.shape)
    r_fin, t_fin, _ = opt_obj(
        jnp.asarray(rots_filled.transpose(0, 2, 1)), jnp.asarray(obj_t0),
        jnp.ones(T), obj_pts, verts_final, scene.part_labels,
        jnp.asarray(occ), sil, obj_pts, jnp.asarray(scene.temp_faces), ctx)
    timings["joint_opt"] = time.time() - t0

    # ---------------- stage 7: pack + evaluate ----------------
    _stage("stage 7/7: packing + evaluation")
    t0 = time.time()
    recon_pack_path = os.path.join(args.out, "recon_track.pkl")
    save_packed(recon_pack_path, dict(
        poses=np.asarray(smpl_final.pose), betas=np.asarray(smpl_final.betas),
        trans=np.asarray(smpl_final.trans),
        obj_angles=np.asarray(r_fin), obj_trans=np.asarray(t_fin),
        obj_scales=np.ones(T), recon_exist=np.ones(T, bool),
        recon_name="track", frames=[f"t{i:04d}.000" for i in range(T)],
        gender="male"))

    rec = load_packed_recon(recon_pack_path)
    sverts_rc = smpl_verts_from_packed(scene.model, rec.poses, rec.betas,
                                       rec.trans)
    overts_rc = recon_obj_verts(scene.temp_verts, rec.obj_angles,
                                rec.obj_trans, rec.obj_scales)
    sverts_gt, _, _, _ = lbs_forward(scene.model, jnp.asarray(scene.poses_gt),
                                     jnp.asarray(scene.betas_gt),
                                     jnp.asarray(scene.trans_gt))
    overts_gt = recon_obj_verts(scene.temp_verts, scene.obj_rot_gt,
                                scene.obj_trans_gt, np.ones(T))
    errs = eval_sequence(np.asarray(sverts_gt), overts_gt, sverts_rc,
                         overts_rc, scene.smpl_faces, scene.temp_faces,
                         window=args.eval_window, chamfer_samples=1000)

    if args.render:
        # stage-7 visualization: GT | recon side-by-side GIF
        from ..render.viz import (render_meshes_perspective, side_by_side,
                                  save_video)
        sf = scene.smpl_faces[:256]
        left, right = [], []
        for i in range(T):
            ccf = crop_centers[i]
            left.append(render_meshes_perspective(
                [(np.asarray(sverts_gt)[i], sf, (0.4, 0.8, 0.4)),
                 (overts_gt[i], scene.temp_faces, (0.9, 0.6, 0.2))],
                cam, ccf, size=128))
            right.append(render_meshes_perspective(
                [(sverts_rc[i], sf, (0.4, 0.6, 0.9)),
                 (overts_rc[i], scene.temp_faces, (0.9, 0.4, 0.4))],
                cam, ccf, size=128))
        vid = save_video(side_by_side(np.stack(left), np.stack(right)),
                         os.path.join(args.out, "side_by_side.gif"))
        _stage(f"wrote visualization {vid}")
    outfile = collect_results({"Date00_Sub00_synthetic": errs}, args.out,
                              "synthetic-track")
    timings["pack_eval"] = time.time() - t0
    timings["total"] = time.time() - t_start

    summary = json.load(open(outfile))
    result = dict(
        eval_json=outfile, recon_pack=recon_pack_path,
        smpl_v2v_cm=summary["smpl_v2v"]["mean"],
        obj_v2v_cm=summary["obj_v2v"]["mean"],
        timings={k: round(v, 2) for k, v in timings.items()})
    print(json.dumps(result, indent=2))
    return result


def build_parser():
    p = argparse.ArgumentParser(prog="vistracker",
                                description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("track", help="full tracking pipeline (stages 1-7)")
    tr.add_argument("--synthetic", action="store_true",
                    help="run on a generated scene (no BEHAVE data needed)")
    tr.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (fast compiles; the tiny "
                         "synthetic shapes don't need the TPU)")
    tr.add_argument("--seq", help="BEHAVE sequence folder (real data)")
    tr.add_argument("--out", default="track_out")
    tr.add_argument("--frames", type=int, default=8)
    tr.add_argument("--verts", type=int, default=128)
    tr.add_argument("--image-size", type=int, default=64)
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--global-iters", type=int, default=2)
    tr.add_argument("--smplt-iters", type=int, default=10)
    tr.add_argument("--refit-iters", type=int, default=3)
    tr.add_argument("--sif-stacks", type=int, default=1)
    tr.add_argument("--gen-samples", type=int, default=1024)
    tr.add_argument("--gen-points", type=int, default=256)
    tr.add_argument("--joint-smpl-iters", type=int, default=3)
    tr.add_argument("--joint-obj-iters", type=int, default=3)
    tr.add_argument("--joint-sil-iters", type=int, default=2)
    tr.add_argument("--joint-iters", type=int, default=3)
    tr.add_argument("--eval-window", type=int, default=300)
    tr.add_argument("--render", action="store_true",
                    help="write a GT|recon side-by-side GIF (stage 7 viz)")
    # real-data (BEHAVE layout) arguments
    tr.add_argument("--dataset", choices=["behave", "intercap"],
                    default="behave",
                    help="camera model: BEHAVE Kinect (tri-vis-l2) or "
                         "InterCap per-kid intrinsics (tri-icap)")
    tr.add_argument("--kid", type=int, default=1)
    tr.add_argument("--start", type=int, default=0)
    tr.add_argument("--end", type=int, default=None)
    tr.add_argument("--chunk-size", type=int, default=96)
    tr.add_argument("--segment-iters", type=int, default=0,
                    help="run stage-6 optimizer phases as a host loop of "
                         "device programs of at most N iterations each "
                         "(identical math; needed where the runtime kills "
                         "long single executions)")
    tr.add_argument("--sil-backend", default="auto",
                    choices=("auto", "pallas", "xla"),
                    help="silhouette rasterizer: fused Pallas kernel "
                         "(default on TPU) or the chunked-scan XLA path")
    tr.add_argument("--shard-frames", action="store_true",
                    help="shard each chunk's frame axis over the device "
                         "mesh (SPMD; pads the last chunk to a device "
                         "multiple — pick --chunk-size divisible by the "
                         "device count for zero padding)")
    tr.add_argument("--crop-size", type=int, default=1200)
    tr.add_argument("--net-size", type=int, default=512)
    tr.add_argument("--save-name", default="track")
    tr.add_argument("--smpl-model", help="SMPL-H model pkl")
    tr.add_argument("--assets", default=os.environ.get(
        "VISTRACKER_ASSETS", "assets"))
    tr.add_argument("--objects-root", help="object template folder")
    tr.add_argument("--sifnet-ckpt", help="tri-vis-l2 checkpoint (torch tar)")
    tr.add_argument("--infiller-ckpt", help="cmf-k4-lrot checkpoint")
    tr.add_argument("--smoothnet-smpl-ckpt")
    tr.add_argument("--smoothnet-objrot-ckpt")
    tr.add_argument("--collision", action="store_true",
                    help="enable the human-object interpenetration term in "
                         "the stage-6 joint phase (SDF-grid penalty, "
                         "ops/sdf_grid.py — the BVH collision loss of "
                         "recon_fit_base.py:736-765 that the release hosts "
                         "ran with, recon_fit_trivis_full.py:261-264); "
                         "builds the template SDF grid once per sequence")
    tr.add_argument("--sdf-res", type=int, default=64,
                    help="template SDF grid resolution for --collision")
    tr.add_argument("--ocent", type=float, default=0.0,
                    help="weight of the object-center anchor term in the "
                         "stage-6 object/joint phases (occ-weighted sq "
                         "distance of the object centroid to the stage-4 "
                         "neural center). 0 = off, the reference release "
                         "table's value (recon_fit_trivis_full.py:141); "
                         "try 100 (=10^2) to re-anchor translation when "
                         "stage 6 drifts the neural centers")
    tr.add_argument("--early-stop", action="store_true",
                    help="enable the stage-6 relative-loss early-stop "
                         "gates (default off: the reference's own gate "
                         "never fires — measured via the cross-impl "
                         "harness, results/crossimpl_parity.json — so "
                         "fixed budgets ARE reference parity)")
    tr.add_argument("--robust-centers", action="store_true",
                    help="median (instead of reference mean) aggregation "
                         "of neural object centers/pca over surface points "
                         "— robust to spurious low-df pockets of weak nets")
    tr.add_argument("--fast-gen", dest="fast_gen", action="store_true",
                    default=True,
                    help="stage-4 funnel harvest (generator.FUNNEL_DEFAULT):"
                         " each round prefilters candidates with one cheap "
                         "df eval and projects only the survivors — ~2.6x "
                         "fewer gather rows at the same final point budget. "
                         "DEFAULT ON since the round-5 heldout A/B measured "
                         "it metric-neutral (obj_v2v 33.84 vs 33.97 cm, "
                         "smpl identical; results/"
                         "fixture_eval_heldout_ms4_small_fastgen.json)")
    tr.add_argument("--no-fast-gen", dest="fast_gen", action="store_false",
                    help="reference-budget harvest (3 rounds x 10 "
                         "projection iters, no prefilter)")
    tr.add_argument("--cache-dtype", choices=("float32", "bfloat16"),
                    default="float32",
                    help="SIF-Net feature-cache storage dtype: bfloat16 "
                         "halves cache HBM + query gather bandwidth "
                         "(stage-4/6 inner loops); decode stays fp32")
    tr.add_argument("--smpl-query-points", type=int, default=0,
                    help="subsample SMPL verts in the stage-6 df losses "
                         "(speed opt-in; 0 = all 6890, reference parity)")
    tr.add_argument("--tiny-nets", action="store_true",
                    help="tiny network configs (pipeline smoke tests; "
                         "alias for --net-preset tiny)")
    tr.add_argument("--net-preset", choices=("tiny", "small", "release"),
                    default="release",
                    help="SIF-Net size preset (models/sifnet.py:"
                         "sifnet_preset); must match the checkpoint")
    tr.add_argument("--redo", action="store_true",
                    help="re-run even if the packed output exists")
    tr.add_argument("--neural-only", action="store_true",
                    help="stop after SIF-Net neural reconstruction (stage 4) "
                         "and pack neural_pca/trans/visibility, like the "
                         "reference's -neural_only")

    ts = sub.add_parser("train-sifnet",
                        help="train SIF-Net (DP over the device mesh)")
    ts.add_argument("--synthetic", action="store_true")
    ts.add_argument("--cpu", action="store_true")
    ts.add_argument("--out", default="experiments/sifnet")
    ts.add_argument("--epochs", type=int, default=2)
    ts.add_argument("--batch-size", type=int, default=2)
    ts.add_argument("--frames", type=int, default=8)
    ts.add_argument("--image-size", type=int, default=32)
    ts.add_argument("--samples", type=int, default=512)
    ts.add_argument("--lr", type=float, default=1e-3)
    ts.add_argument("--offline-data", default=None,
                    help="directory of precomputed boundary npz files "
                         "(the offline BehaveDataset path, train_data.py)")
    ts.add_argument("--crop-size", type=int, default=1200)
    ts.add_argument("--variant", default="chore-triplane-vis",
                    choices=["chore", "chore-triplane", "chore-triplane-vis"])
    ts.add_argument("--load-triplane", action="store_true",
                    help="concat the .smpl_triplane.png channels "
                         "(offline mode, train_data.py:76-79)")
    ts.add_argument("--random-flip", action="store_true",
                    help="random horizontal flip loading _flip.npz labels")

    bs = sub.add_parser("boundary-sample",
                        help="precompute per-frame boundary-sample npz "
                             "files from a GT-packed sequence "
                             "(preprocess/boundary_sampler.py)")
    bs.add_argument("--seq", required=True, help="BEHAVE-layout seq dir")
    bs.add_argument("--gt-pack", required=True, help="GT packed pkl")
    bs.add_argument("--smpl-model", required=True)
    bs.add_argument("--assets", required=True)
    bs.add_argument("--objects-root", required=True)
    bs.add_argument("--out", required=True, help="output npz directory")
    bs.add_argument("--kid", type=int, default=1)
    bs.add_argument("--samples", type=int, default=20000)
    bs.add_argument("--grid-ratio", type=float, default=1.0 / 16.0)
    bs.add_argument("--flip", action="store_true",
                    help="also write the _flip.npz part-label variants")
    bs.add_argument("--neighbours", action="store_true",
                    help="store closest-surface-point labels")
    bs.add_argument("--end", type=int, default=None)
    bs.add_argument("--redo", action="store_true")

    tsm = sub.add_parser("train-smoothnet",
                         help="train SmoothNet (smpl or objrot variant)")
    tsm.add_argument("--synthetic", action="store_true")
    tsm.add_argument("--cpu", action="store_true")
    tsm.add_argument("--variant", choices=["smpl", "objrot"], default="smpl")
    tsm.add_argument("--out", default="experiments/smoothnet")
    tsm.add_argument("--epochs", type=int, default=2)
    tsm.add_argument("--batch-size", type=int, default=32)
    tsm.add_argument("--window", type=int, default=64)
    tsm.add_argument("--frames", type=int, default=300)
    tsm.add_argument("--lr", type=float, default=1e-4)
    tsm.add_argument("--noise", type=float, default=0.05)

    ti = sub.add_parser("train-infiller", help="train HVOP-Net")
    ti.add_argument("--synthetic", action="store_true")
    ti.add_argument("--cpu", action="store_true")
    ti.add_argument("--out", default="experiments/infiller")
    ti.add_argument("--epochs", type=int, default=2)
    ti.add_argument("--batch-size", type=int, default=8)
    ti.add_argument("--clip-len", type=int, default=40)
    ti.add_argument("--frames", type=int, default=120)
    ti.add_argument("--lr", type=float, default=1e-4)

    rd = sub.add_parser("render",
                        help="side-by-side video (gif/mp4) of packed "
                             "recon(s), optional top view + contact spheres")
    rd.add_argument("--recon", required=True, help="packed recon pkl")
    rd.add_argument("--recon2", help="second recon (or GT pack) to compare")
    rd.add_argument("--template", required=True, help="object template ply")
    rd.add_argument("--smpl-model", required=True)
    rd.add_argument("--out", default="render_out/side_by_side.mp4",
                    help=".mp4 -> FFMPEG video; other extensions -> GIF")
    rd.add_argument("--top", action="store_true",
                    help="also write a top-down view video with "
                         "checkerboard ground (*_top.mp4)")
    rd.add_argument("--contact-spheres", action="store_true",
                    help="draw per-part human-object contact spheres")
    rd.add_argument("--assets", default=os.environ.get(
        "VISTRACKER_ASSETS", "assets"),
        help="assets root (part labels for contact spheres)")
    rd.add_argument("--size", type=int, default=256)
    rd.add_argument("--fps", type=int, default=15)
    rd.add_argument("--max-frames", type=int, default=300)
    rd.add_argument("--cpu", action="store_true")

    ev = sub.add_parser("evaluate", help="windowed eval of packed recon vs GT")
    ev.add_argument("--recon", help="packed recon pkl (single-sequence mode)")
    ev.add_argument("--gt", help="packed GT pkl (single-sequence mode)")
    ev.add_argument("--template", help="object template ply (single-seq)")
    # split mode (evalvideo_packed.py -split): evaluate many sequences
    ev.add_argument("--split", help="json with {'seqs': [...]}")
    ev.add_argument("--save-name", default="track",
                    help="recon name: <recon-root>/recon_<name>/<seq>_k<tid>.pkl")
    ev.add_argument("--recon-root", default="recon_out")
    ev.add_argument("--gt-root", help="folder with <seq>_GT-packed.pkl")
    ev.add_argument("--objects-root", help="object template folder")
    ev.add_argument("--tid", type=int, default=1)
    ev.add_argument("--smpl-model", help="SMPL-H model pkl")
    ev.add_argument("--window", type=int, default=300)
    ev.add_argument("--smpl-only", action="store_true",
                    help="align on SMPL verts only")
    ev.add_argument("--angles", action="store_true",
                    help="also report object rotation errors in degrees "
                         "(evalvideo_packed_angle.py)")
    ev.add_argument("--out", default="results")
    ev.add_argument("--cpu", action="store_true")
    # frame-folder mode (recon/eval/evaluate.py ReconEvaluator): gather
    # per-frame k<tid>.smplfit_/objfit_<save-name>.pkl files into a pack
    # first, then evaluate
    ev.add_argument("--recon-seq", default=None,
                    help="sequence folder with per-frame fit pkls "
                         "(frame-folder mode; replaces --recon)")

    # packed <-> per-frame file tools (tools/pack2separate.py,
    # pack2separate_params.py, preprocess/pack_recon.py param path)
    up = sub.add_parser("unpack", help="packed pkl -> per-frame "
                        "k<kid>.smplfit_/objfit_<name>.pkl files")
    up.add_argument("--packed", required=True, help="packed recon pkl")
    up.add_argument("--seq", required=True, help="sequence folder")
    up.add_argument("--save-name", default="track")
    up.add_argument("--kid", type=int, default=1)

    pk = sub.add_parser("pack", help="per-frame fit pkls -> packed pkl "
                        "(dummy-fills missing frames, records recon_exist)")
    pk.add_argument("--seq", required=True, help="sequence folder")
    pk.add_argument("--out", required=True, help="output packed pkl path")
    pk.add_argument("--save-name", default="track")
    pk.add_argument("--kid", type=int, default=1)

    rm = sub.add_parser("rename-masks",
                        help="move flat t<frame>-k<kid>.*.png mask files "
                             "into the sequence's per-frame folders "
                             "(tools/rename_masks.py)")
    rm.add_argument("--seq", required=True, help="sequence folder")
    rm.add_argument("--mask-path", required=True,
                    help="root containing <seq_name>/t*-k*.png files")
    return p


def run_train_sifnet(args):
    """Train SIF-Net. --synthetic builds the frame set from the generated
    scene (rasterized masks + triplanes + online GT boundary sampling —
    the same host pipeline real BEHAVE frames go through)."""
    import jax
    import jax.numpy as jnp
    from ..cli.synthetic import make_scene
    from ..core.smpl import lbs_forward
    from ..core.camera import PerspectiveCamera
    from ..data.packed import recon_obj_verts
    from ..data.datasets import PrefetchLoader, sifnet_example
    from ..fit.train import TrainConfig, init_train_state, make_train_step
    from ..fit.trainer_loop import LoopConfig, train_loop
    from ..models.sifnet import SIFNet, SIFNetConfig
    from ..ops.rasterizer import rasterize_mask, \
        render_triplane_masks_batch

    if args.offline_data:
        # offline precomputed-npz path (train_data.py:BehaveDataset):
        # per-sigma subsampling from boundary npz files + image crops
        import glob
        from ..data.offline import offline_example
        files = sorted(f for f in glob.glob(
            os.path.join(args.offline_data, "*.npz"))
            if not f.endswith("_flip.npz"))
        if not files:
            raise SystemExit(f"no npz files under {args.offline_data}")
        cam = PerspectiveCamera(crop_size=args.crop_size)
        T = len(files)

        def example(i):
            rng = np.random.RandomState(i * 9973 + 7)
            flip = bool(args.random_flip and rng.rand() > 0.5)
            return offline_example(files[i], total_samples=args.samples,
                                   crop_size=args.crop_size,
                                   net_size=args.image_size,
                                   load_triplane=args.load_triplane,
                                   flip=flip, rng=rng)
    elif not args.synthetic:
        raise SystemExit("training needs --synthetic or --offline-data")
    else:
        cam = PerspectiveCamera(crop_size=1200)
        scene = make_scene(args.frames, num_verts=128, seed=0)
        T, S = args.frames, args.image_size

        verts, _, _, _ = lbs_forward(scene.model, jnp.asarray(scene.poses_gt),
                                     jnp.asarray(scene.betas_gt),
                                     jnp.asarray(scene.trans_gt))
        bc = scene.landmarks.smpl_center(verts)
        cc = np.asarray(cam.project_screen(bc[:, None, :]))[:, 0]
        smpl_faces = jnp.asarray(scene.smpl_faces[:256])
        obj_world = recon_obj_verts(scene.temp_verts, scene.obj_rot_gt,
                                    scene.obj_trans_gt, np.ones(T))

        tris = np.asarray(render_triplane_masks_batch(
            verts, smpl_faces, bc, S))
        frames = []
        for i in range(T):
            ndc_s = np.asarray(cam.project_points(
                verts[i:i + 1], jnp.asarray(cc[i:i + 1])))[0, :, :2]
            ndc_o = np.asarray(cam.project_points(
                jnp.asarray(obj_world[i:i + 1]), jnp.asarray(cc[i:i + 1])))[0, :, :2]
            pm = np.asarray(rasterize_mask(jnp.asarray(ndc_s), smpl_faces, S))
            om = np.asarray(rasterize_mask(jnp.asarray(ndc_o),
                                           jnp.asarray(scene.temp_faces), S))
            rgb = np.repeat(pm[..., None], 3, -1) * 0.5 \
                + np.repeat(om[..., None], 3, -1) * 0.3
            image = np.concatenate([rgb, pm[..., None], om[..., None],
                                    tris[i]], -1).astype(np.float32)
            frames.append(dict(
                image=image, crop_center=cc[i].astype(np.float32),
                body_center=np.asarray(bc[i], np.float32),
                smpl_verts=np.asarray(verts[i]), smpl_faces=scene.smpl_faces,
                obj_verts=obj_world[i].astype(np.float32),
                obj_faces=scene.temp_faces,
                visibility=float(scene.occ_ratios[i])))

        def example(i):
            return sifnet_example(frames[i], scene.part_labels,
                                  num_samples=args.samples,
                                  rng=np.random.RandomState(i))

    loader = PrefetchLoader(example, T, args.batch_size, num_workers=2)
    # remat measured FASTER than storing activations at training sizes
    # (12 vs 21 ms/step at bs 8, 512^2 — PERF_NOTES.md)
    cfg = SIFNetConfig(variant=getattr(args, "variant",
                                       "chore-triplane-vis"),
                       num_stack=1, num_hourglass=1, hourglass_dim=32,
                       tmpx_dim=32, triplane_stack=1, triplane_hg_dim=32,
                       triplane_tmpx_dim=32, hidden_dim=16, remat=True,
                       crop_size=getattr(args, "crop_size", 1200))
    model = SIFNet(cfg, cam)
    tcfg = TrainConfig(learning_rate=args.lr)
    # data-parallel over all local devices: shard the batch, replicate
    # params; jit inserts the gradient psum (replaces DDP/NCCL)
    from ..parallel.mesh import init_multihost, make_mesh, shard_leading, \
        replicate
    host_id, n_hosts = init_multihost()
    loader.host_id, loader.num_hosts = host_id, n_hosts
    mesh = make_mesh(axis="data")
    n_dev = len(jax.devices())

    def to_dev(b):
        b = {k: jnp.asarray(v) for k, v in b.items()}
        if n_dev > 1 and len(next(iter(b.values()))) % n_dev == 0:
            b = shard_leading(mesh, b, "data")
        return b

    state = init_train_state(model, jax.random.PRNGKey(0),
                             to_dev(next(iter(loader))), tcfg)
    if n_dev > 1:
        state = replicate(mesh, state)
    step = make_train_step(model, tcfg)
    lcfg = LoopConfig(num_epochs=args.epochs, out_dir=args.out,
                      ck_period_min=1e9)

    def val_fn(state, batch):
        _, loss, _ = step(state, batch)
        return loss

    state = train_loop(state, step, loader, val_loader=loader,
                       val_loss_fn=val_fn, cfg=lcfg, to_device=to_dev)
    print(json.dumps({"out": args.out,
                      "steps": int(np.asarray(state.step))}))


def run_boundary_sample(args):
    """Precompute per-frame boundary-sample npz files from a GT-packed
    sequence — the producer for `train-sifnet --offline-data`
    (preprocess/boundary_sampler.py driver; schema boundary_sample_all)."""
    import jax.numpy as jnp
    from ..core.smpl import load_smpl_pkl, lbs_forward
    from ..core.landmarks import (load_landmarks, load_part_labels,
                                  part_labels_array)
    from ..data.behave import FrameDataReader, SeqInfo, load_template
    from ..data.offline import save_boundary_npz
    from ..data.packed import gt_obj_verts, load_packed, recon_obj_verts

    os.makedirs(args.out, exist_ok=True)
    model = load_smpl_pkl(args.smpl_model)
    landmarks = load_landmarks(args.assets)
    part_labels = part_labels_array(load_part_labels(args.assets),
                                    num_verts=model.v_template.shape[0])
    reader = FrameDataReader(args.seq)
    info = SeqInfo(args.seq)
    temp_v, temp_f = load_template(args.objects_root, info.get_obj_name())

    gt = load_packed(args.gt_pack)
    T = len(gt["poses"])
    if args.end is not None:
        T = min(T, args.end)
    poses = np.asarray(gt["poses"]).reshape(len(gt["poses"]), -1)[:T]
    verts, _, _, _ = lbs_forward(model, jnp.asarray(poses),
                                 jnp.asarray(np.asarray(gt["betas"])[:T]),
                                 jnp.asarray(np.asarray(gt["trans"])[:T]))
    verts = np.asarray(verts)
    body_kpts = np.asarray(landmarks.body_joints(jnp.asarray(verts)))
    centers = body_kpts[:, 8]  # smpl center = body25 joint 8
    ga = np.asarray(gt["obj_angles"])[:T]
    if ga.ndim == 2:  # GT packs store axis-angle
        overts = gt_obj_verts(temp_v, ga, np.asarray(gt["obj_trans"])[:T])
    else:
        overts = recon_obj_verts(temp_v, ga, np.asarray(gt["obj_trans"])[:T],
                                 np.ones(T))

    smpl_faces = np.asarray(model.faces)
    written = 0
    for i in range(T):
        out = os.path.join(args.out, f"{reader.frames[i]}_k{args.kid}.npz")
        if os.path.isfile(out) and not args.redo:
            continue  # is_done resume semantics
        kw = dict(smpl_verts=verts[i], smpl_faces=smpl_faces,
                  obj_verts=overts[i], obj_faces=temp_f,
                  part_labels=part_labels, body_center=centers[i],
                  body_kpts=body_kpts[i],
                  image_file=reader.get_color_file(i, args.kid),
                  sample_num=args.samples, grid_ratio=args.grid_ratio,
                  add_neighbours=args.neighbours)
        save_boundary_npz(out, rng=np.random.RandomState(i * 31 + 7), **kw)
        if args.flip:
            save_boundary_npz(out.replace(".npz", "_flip.npz"), flip=True,
                              rng=np.random.RandomState(i * 31 + 7), **kw)
        written += 1
    print(json.dumps({"out": args.out, "frames": T, "written": written}))


def run_train_smoothnet(args):
    """Train SmoothNet on windows of a noisy trajectory. --synthetic builds
    smooth GT trajectories (rot6d pose [+ betas/trans for the smpl variant])
    and adds Gaussian noise — the denoising task SmoothNet learns."""
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation
    from ..core.rotations import axis_angle_to_rot6d
    from ..data.datasets import PrefetchLoader
    from ..fit.trainer_loop import (LoopConfig, train_loop,
                                    make_smoothnet_train_step)
    from ..models.smoothnet import SmoothNet, SmoothNetSMPL
    from ..ops.window_ops import seq_to_windows

    if not args.synthetic:
        raise SystemExit("real-data training needs packed GT; use --synthetic")
    rng = np.random.RandomState(0)
    T, W = args.frames, args.window
    t = np.linspace(0, 6 * np.pi, T)
    if args.variant == "smpl":
        pose = (0.3 * np.sin(t)[:, None] * rng.randn(72)[None]).astype(np.float32)
        rot6d = np.asarray(axis_angle_to_rot6d(
            jnp.asarray(pose.reshape(-1, 3)))).reshape(T, 144)
        feats = np.concatenate(
            [rot6d, np.zeros((T, 10), np.float32),
             np.stack([0.3 * np.sin(t), 0.1 * np.cos(t), 2.2 + 0 * t],
                      -1).astype(np.float32)], 1)
        model = SmoothNetSMPL(window_size=W, output_size=W)
    else:
        rots = Rotation.from_euler("y", (0.5 * t)[:, None]).as_matrix()
        feats = rots[:, :, :2].reshape(T, 6).astype(np.float32)
        model = SmoothNet(window_size=W, output_size=W)

    gt_w = np.asarray(seq_to_windows(jnp.asarray(feats), W, 1))  # (N, W, D)
    gt_w = gt_w.transpose(0, 2, 1)                               # (N, D, W)
    noisy_w = gt_w + rng.randn(*gt_w.shape).astype(np.float32) * args.noise

    def example(i):
        return dict(noisy=noisy_w[i], gt=gt_w[i])

    loader = PrefetchLoader(example, len(gt_w), args.batch_size,
                            num_workers=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1,) + gt_w.shape[1:]))
    init_state, step_fn, val_fn = make_smoothnet_train_step(model, args.lr)
    state = init_state(params)
    lcfg = LoopConfig(num_epochs=args.epochs, out_dir=args.out,
                      ck_period_min=1e9)
    to_dev = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
    state = train_loop(state, step_fn, loader, val_loader=loader,
                       val_loss_fn=val_fn, cfg=lcfg, to_device=to_dev)
    # report denoising gain on the training windows
    pred = model.apply(state["params"], jnp.asarray(noisy_w[:64]))
    err_in = float(np.abs(noisy_w[:64] - gt_w[:64]).mean())
    err_out = float(np.abs(np.asarray(pred) - gt_w[:64]).mean())
    print(json.dumps({"out": args.out,
                      "steps": int(np.asarray(state["step"])),
                      "noisy_l1": round(err_in, 5),
                      "denoised_l1": round(err_out, 5)}))


def run_train_infiller(args):
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation
    from ..data.datasets import PrefetchLoader, InfillerClips
    from ..fit.trainer_loop import (LoopConfig, train_loop,
                                    make_infiller_train_step)
    from ..models.infiller import ConditionalMInfiller, InfillerConfig

    if not args.synthetic:
        raise SystemExit("real-data training needs packed GT; use --synthetic")
    rng = np.random.RandomState(0)
    T = args.frames
    t = np.linspace(0, 4 * np.pi, T)
    seqs = [dict(
        poses=(0.2 * np.sin(t)[:, None] * rng.randn(72)[None]).astype(np.float32),
        trans=np.stack([0.3 * np.sin(t), 0.1 * np.cos(t), 2.2 + 0 * t],
                       -1).astype(np.float32),
        obj_rot_real=Rotation.from_euler(
            "y", (0.5 * t)[:, None]).as_matrix().astype(np.float32))]
    clips = InfillerClips(seqs, clip_len=args.clip_len)
    cfg = InfillerConfig(clip_len=args.clip_len, window=10)
    model = ConditionalMInfiller(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, args.clip_len, 147)),
                        jnp.zeros((1, args.clip_len), bool),
                        jnp.zeros((1, args.clip_len, 6)),
                        jnp.zeros((1, args.clip_len), bool))
    init_state, step_fn, val_fn = make_infiller_train_step(model, args.lr)
    state = init_state(params)
    loader = PrefetchLoader(clips.example, len(clips), args.batch_size,
                            num_workers=2)
    lcfg = LoopConfig(num_epochs=args.epochs, out_dir=args.out,
                      ck_period_min=1e9)
    to_dev = lambda b: {k: jnp.asarray(v) for k, v in b.items()}

    # in-training downstream eval (trainer_cinfiller.py:46-194): every val
    # point runs the FULL autoregressive infill on a held-out sequence with
    # an occlusion stretch and logs chamfer/v2v (cm) on the occluded frames;
    # best-model selection uses the downstream v2v
    from ..fit.infill import make_infiller, downstream_recon_eval
    from ..cli.synthetic import box_mesh
    run = make_infiller(model, cfg)
    hold = seqs[0]
    occ = np.ones(T, np.float32)
    occ[T // 3:T // 2] = 0.0  # occlude a stretch
    bv, bf = box_mesh()
    held_out = [dict(poses=hold["poses"], trans=hold["trans"],
                     obj_rot_real=hold["obj_rot_real"],
                     obj_rot_gt=hold["obj_rot_real"], occ=occ,
                     temp_verts=bv, temp_faces=bf)]

    def downstream(state, step):
        return downstream_recon_eval(run, state["params"], held_out,
                                     init_thres=0.0, samples=500)

    state = train_loop(state, step_fn, loader, val_loader=loader,
                       val_loss_fn=val_fn, cfg=lcfg, to_device=to_dev,
                       downstream_fn=downstream,
                       select_on="downstream_v2v_cm")

    final = downstream(state, int(np.asarray(state["step"])))
    print(json.dumps({"out": args.out,
                      "steps": int(np.asarray(state["step"])),
                      **{k: round(v, 4) for k, v in final.items()}}))


def run_render(args):
    """Side-by-side mesh rendering of packed reconstructions
    (render/render_side_comp.py + render_recon.py roles): GIF or mp4
    output, optional top-down view with checkerboard ground
    (render_recon.py:173-183, 213-225) and per-part contact spheres
    (nr_utils.py:get_contact_spheres)."""
    import jax.numpy as jnp
    from ..core.smpl import load_smpl_pkl
    from ..core.camera import PerspectiveCamera
    from ..data.packed import load_packed_recon, recon_obj_verts, \
        gt_obj_verts, load_packed
    from ..utils.mesh import load_ply, decimate_faces
    from ..render.viz import (render_meshes_perspective, side_by_side,
                              save_video, contact_spheres, render_top_view)
    from ..eval.evaluator import smpl_verts_from_packed

    model = load_smpl_pkl(args.smpl_model)
    temp_v, temp_f = load_ply(args.template)
    temp_v = temp_v - temp_v.mean(0)
    temp_f = decimate_faces(temp_f, 2500)
    smpl_f = decimate_faces(model.faces, 4000)
    cam = PerspectiveCamera()
    part_labels = None
    if args.contact_spheres:
        from ..core.landmarks import load_part_labels, part_labels_array
        part_labels = np.asarray(part_labels_array(
            load_part_labels(args.assets),
            num_verts=model.v_template.shape[0]))

    def load_verts(path):
        d = load_packed(path)
        poses = np.asarray(d["poses"]).reshape(len(d["poses"]), -1)
        sv = smpl_verts_from_packed(model, poses, np.asarray(d["betas"]),
                                    np.asarray(d["trans"]))
        ga = np.asarray(d["obj_angles"])
        if ga.ndim == 2:
            ov = gt_obj_verts(temp_v, ga, np.asarray(d["obj_trans"]))
        else:
            scales = np.asarray(d.get("obj_scales", np.ones(len(ga))))
            ov = recon_obj_verts(temp_v, ga, np.asarray(d["obj_trans"]),
                                 np.where(np.isfinite(scales) & (scales > 0),
                                          scales, 1.0))
        return sv, ov

    sv1, ov1 = load_verts(args.recon)
    T = min(len(sv1), args.max_frames)

    def frame_meshes(sv, ov, colors, i):
        meshes = [(sv[i], smpl_f, colors[0]), (ov[i], temp_f, colors[1])]
        if part_labels is not None:
            for color, cv, cf in contact_spheres(sv[i], part_labels, ov[i]):
                meshes.append((cv, cf, color))
        return meshes

    def render_all(sv, ov, colors, top=False):
        frames = []
        for i in range(T):
            meshes = frame_meshes(sv, ov, colors, i)
            if top:
                frames.append(render_top_view(meshes, cam, size=args.size))
            else:
                cc = np.asarray(cam.project_screen(
                    jnp.asarray(sv[i].mean(0, keepdims=True))[None]))[0, 0]
                frames.append(render_meshes_perspective(
                    meshes, cam, cc, size=args.size))
        return np.stack(frames)

    left = render_all(sv1, ov1, [(0.4, 0.6, 0.9), (0.9, 0.4, 0.4)])
    if args.recon2:
        sv2, ov2 = load_verts(args.recon2)
        right = render_all(sv2, ov2, [(0.4, 0.8, 0.4), (0.9, 0.6, 0.2)])
        video = side_by_side(left, right)
    else:
        video = left
    out = save_video(video, args.out, args.fps)
    outputs = [out]
    if args.top:
        # companion top-view video (render_recon.py writes *_top.mp4)
        stem, ext = os.path.splitext(args.out)
        tleft = render_all(sv1, ov1, [(0.4, 0.6, 0.9), (0.9, 0.4, 0.4)],
                           top=True)
        if args.recon2:
            tright = render_all(sv2, ov2, [(0.4, 0.8, 0.4), (0.9, 0.6, 0.2)],
                                top=True)
            tvideo = side_by_side(tleft, tright)
        else:
            tvideo = tleft
        outputs.append(save_video(tvideo, f"{stem}_top{ext}", args.fps))
    print("\n".join(outputs))


def _eval_one(model, recon_path, gt_path, temp_v, temp_f, window, smpl_only):
    from ..data.packed import load_packed_recon, load_packed, \
        recon_obj_verts, gt_obj_verts
    from ..eval.evaluator import eval_sequence, smpl_verts_from_packed
    rec = load_packed_recon(recon_path)
    gt = load_packed(gt_path)
    sverts_rc = smpl_verts_from_packed(model, rec.poses, rec.betas, rec.trans)
    overts_rc = recon_obj_verts(temp_v, rec.obj_angles, rec.obj_trans,
                                rec.obj_scales)
    sverts_gt = smpl_verts_from_packed(
        model, np.asarray(gt["poses"]).reshape(len(gt["poses"]), -1),
        np.asarray(gt["betas"]), np.asarray(gt["trans"]))
    ga = np.asarray(gt["obj_angles"])
    if ga.ndim == 2:  # GT packs store axis-angle
        overts_gt = gt_obj_verts(temp_v, ga, np.asarray(gt["obj_trans"]))
    else:
        overts_gt = recon_obj_verts(temp_v, ga, np.asarray(gt["obj_trans"]),
                                    np.ones(len(ga)))
    return eval_sequence(sverts_gt, overts_gt, sverts_rc, overts_rc,
                         model.faces, temp_f, rec.recon_exist, window,
                         smpl_only=smpl_only)


def _rot_errors(recon_path, gt_path):
    """Per-frame object rotation errors in degrees — the angle evaluator
    (recon/eval/evalvideo_packed_angle.py: GT axis-angle -> matrix vs the
    packed transposed recon rotations, geodesic angle per frame)."""
    from scipy.spatial.transform import Rotation
    from ..data.packed import load_packed, load_packed_recon
    from ..eval.evaluator import rotation_errors_deg
    rec = load_packed_recon(recon_path)
    gt = load_packed(gt_path)
    ga = np.asarray(gt["obj_angles"])
    rot_gt = (Rotation.from_rotvec(ga).as_matrix() if ga.ndim == 2
              else np.asarray(ga))
    rot_rc = np.asarray(rec.obj_angles).transpose(0, 2, 1)
    errs = rotation_errors_deg(rot_rc, rot_gt)
    return errs[np.asarray(rec.recon_exist, bool)]


def run_evaluate(args):
    from ..utils.mesh import load_ply
    from ..core.smpl import load_smpl_pkl
    from ..data.behave import load_template
    from ..eval.evaluator import collect_results, object_name_of

    model = load_smpl_pkl(args.smpl_model)
    errors = {}
    rot_errors = {}
    if args.split:
        with open(args.split) as f:
            seqs = json.load(f)["seqs"]
        for seq in seqs:
            recon = os.path.join(args.recon_root, f"recon_{args.save_name}",
                                 f"{seq}_k{args.tid}.pkl")
            gt = os.path.join(args.gt_root, f"{seq}_GT-packed.pkl")
            temp_v, temp_f = load_template(args.objects_root,
                                           object_name_of(seq))
            print(f"[evaluate] {seq}")
            errors[seq] = _eval_one(model, recon, gt, temp_v, temp_f,
                                    args.window, args.smpl_only)
            if args.angles:
                rot_errors[seq] = _rot_errors(recon, gt)
        out = collect_results(errors, args.out, args.save_name,
                              extra=_rot_extra(rot_errors))
    else:
        recon = args.recon
        if getattr(args, "recon_seq", None):
            # frame-folder mode: per-frame fit pkls -> packed pkl, with
            # dummy-fill + recon_exist for missing frames
            # (evaluate.py:ReconEvaluator over recon folders)
            from ..data.behave import FrameDataReader
            from ..data.packed import pack_from_frames, save_packed
            reader = FrameDataReader(args.recon_seq)
            packed = pack_from_frames(args.recon_seq, reader.frames,
                                      args.save_name, kid=args.tid)
            packed.update(gender=reader.seq_info.get_gender())
            recon = os.path.join(
                args.out, f"recon_{args.save_name}",
                f"{reader.seq_name}_k{args.tid}.pkl")
            os.makedirs(os.path.dirname(recon), exist_ok=True)
            save_packed(recon, packed)
            print(f"[evaluate] packed {args.recon_seq} -> {recon}")
        if not (recon and args.gt and args.template):
            raise SystemExit("evaluate needs --split, --recon, or "
                             "--recon-seq (+ --gt/--template)")
        temp_v, temp_f = load_ply(args.template)
        temp_v = temp_v - temp_v.mean(0)
        seq_name = os.path.basename(recon).replace(".pkl", "")
        errors[seq_name] = _eval_one(model, recon, args.gt, temp_v,
                                     temp_f, args.window, args.smpl_only)
        if args.angles:
            rot_errors[seq_name] = _rot_errors(recon, args.gt)
        out = collect_results(errors, args.out, args.save_name,
                              extra=_rot_extra(rot_errors))
    print(out)


def _rot_extra(rot_errors: dict):
    if not rot_errors:
        return None
    allr = np.concatenate(list(rot_errors.values()))
    return {"rot_error": {"mean": float(allr.mean()),
                          "std": float(allr.std())},
            "rot_error_separate": {
                k: {"mean": float(v.mean()), "std": float(v.std())}
                for k, v in sorted(rot_errors.items())}}


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: pipeline stages rerun identical jit
    # programs across invocations (VISTRACKER_COMPILE_CACHE=0 disables)
    from ..utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    if args.cmd == "track":
        if not args.synthetic and not args.seq:
            raise SystemExit("track requires --synthetic or --seq")
        if args.synthetic:
            run_synthetic_track(args)
        else:
            for need, name in ((args.smpl_model, "--smpl-model"),
                               (args.objects_root, "--objects-root"),
                               (args.sifnet_ckpt, "--sifnet-ckpt"),
                               (args.infiller_ckpt, "--infiller-ckpt")):
                if not need:
                    raise SystemExit(f"track --seq requires {name}")
            from .real_track import run_real_track
            run_real_track(args)
    elif args.cmd == "train-sifnet":
        run_train_sifnet(args)
    elif args.cmd == "boundary-sample":
        run_boundary_sample(args)
    elif args.cmd == "train-smoothnet":
        run_train_smoothnet(args)
    elif args.cmd == "train-infiller":
        run_train_infiller(args)
    elif args.cmd == "render":
        run_render(args)
    elif args.cmd == "evaluate":
        run_evaluate(args)
    elif args.cmd == "unpack":
        from ..data.packed import load_packed, unpack_to_frames
        written = unpack_to_frames(load_packed(args.packed), args.seq,
                                   args.save_name, kid=args.kid)
        print(f"unpacked {len(written)} frames to {args.seq}")
    elif args.cmd == "pack":
        from ..data.behave import FrameDataReader
        from ..data.packed import pack_from_frames, save_packed
        reader = FrameDataReader(args.seq)
        packed = pack_from_frames(args.seq, reader.frames, args.save_name,
                                  kid=args.kid)
        packed["gender"] = reader.seq_info.get_gender()
        save_packed(args.out, packed)
        n_ok = int(np.asarray(packed["recon_exist"]).sum())
        print(f"packed {len(reader.frames)} frames ({n_ok} with recon) "
              f"-> {args.out}")
    elif args.cmd == "rename-masks":
        # tools/rename_masks.py:19-39 — flat files named
        # t<frame>-k<kid>.<kind>.png move to <seq>/t<frame>/k<kid>.<kind>.png
        import glob as _glob
        seq_name = os.path.basename(os.path.normpath(args.seq))
        moved = skipped = 0
        for f in sorted(_glob.glob(
                os.path.join(args.mask_path, seq_name, "t*.png"))):
            parts = os.path.basename(f).split("-")
            if len(parts) != 2:
                continue
            dst = os.path.join(args.seq, parts[0], parts[1])
            if os.path.isfile(dst):
                skipped += 1
                continue
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(f, dst)
            moved += 1
        print(f"moved {moved} mask files ({skipped} already present)")


if __name__ == "__main__":
    main()
