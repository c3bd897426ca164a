"""Real-data (BEHAVE-layout) tracking pipeline — the 7 reference demo
stages over an actual sequence folder.

Inputs per sequence (reference data layout, behave.FrameDataReader):
  <seq>/info.json, per-frame folders tXXXX.XXX/ with k{kid}.color.jpg,
  person/object masks, k{kid}.color.json OpenPose keypoints,
  k{kid}.mocap.json FrankMocap init; object templates under --objects-root;
  SMPL-H model pkl; assets (landmark regressors, priors); released or
  self-trained checkpoints for SIF-Net / SmoothNet / HVOP-Net (torch .tar
  via models.torch_import, or orbax dirs from our trainer).

Per chunk of --chunk-size consecutive frames the whole pipeline runs as
jit-compiled programs on device; chunks stream through the sequence
(reference demo.sh uses 512/64/96-frame chunks across stages — here one
chunk size serves all stages and stays resident on device between them).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def run_real_track(args):
    import jax
    import jax.numpy as jnp
    from ..core.smpl import load_smpl_pkl, lbs_forward
    from ..core.camera import PerspectiveCamera
    from ..core.landmarks import load_landmarks, load_part_labels, \
        part_labels_array
    from ..core.priors import load_body_prior, load_hand_prior, mean_hand_pose
    from ..core.smpl_generator import smplh_params
    from ..data.behave import FrameDataReader, load_template
    from ..data.images import prepare_input_crop
    from ..data.packed import save_packed
    from ..data.silprep import prepare_sil_refs
    from ..data.sampling import compute_pca_axes
    from ..fit.smplt import (SMPLTFitConfig, SMPLTParams, fit_smplt,
                             init_trans_from_bbox)
    from ..fit.smoothing import smooth_smplt, smooth_objrot
    from ..fit.infill import make_infiller
    from ..fit.generator import GeneratorConfig, make_generator, \
        sifnet_query_fn
    from ..fit.joint import (JointFitConfig, make_smpl_optimizer,
                             make_object_optimizer, init_object_orientation)
    from ..models.sifnet import SIFNet, SIFNetConfig
    from ..models.smoothnet import SmoothNet, SmoothNetSMPL
    from ..models.infiller import ConditionalMInfiller, InfillerConfig
    from ..models import torch_import as TI
    from ..ops.rasterizer import render_triplane_masks
    from ..utils.mesh import sample_surface, decimate_faces

    t_start = time.time()
    kid = args.kid
    reader = FrameDataReader(args.seq)
    outfile = os.path.join(
        args.out, f"recon_{args.save_name}", f"{reader.seq_name}_k{kid}.pkl")
    if os.path.isfile(outfile) and not getattr(args, "redo", False):
        # idempotent resume (recon_fit_base.py:260-276 is_done semantics)
        print(f"[vistracker] {outfile} exists, skipping (use --redo)")
        return outfile
    T_total = len(reader)
    end = reader.cvt_end(args.end)
    frames = list(range(args.start, end))
    print(f"[vistracker] sequence {reader.seq_name}: frames "
          f"{args.start}..{end} of {T_total}")

    smpl_model = load_smpl_pkl(args.smpl_model)
    landmarks = load_landmarks(args.assets)
    body_prior = load_body_prior(args.assets)
    hand_prior = load_hand_prior(args.assets)
    mean_hands = mean_hand_pose(args.assets)
    part_labels = part_labels_array(load_part_labels(args.assets),
                                    num_verts=smpl_model.v_template.shape[0])
    cam = PerspectiveCamera(crop_size=args.crop_size)

    obj_name = reader.seq_info.get_obj_name()
    temp_v, temp_f = load_template(args.objects_root, obj_name)
    pca_init = compute_pca_axes(temp_v)
    obj_points = sample_surface(temp_v, temp_f, 3000,
                                np.random.RandomState(0))
    sil_faces = decimate_faces(temp_f, 2500)

    # networks + checkpoints ("random" initializes untrained weights — for
    # pipeline smoke tests only)
    tiny = getattr(args, "tiny_nets", False)
    sif_cfg = (SIFNetConfig(num_stack=1, num_hourglass=1, hourglass_dim=32,
                            tmpx_dim=32, triplane_stack=1, triplane_hg_dim=32,
                            triplane_tmpx_dim=32, hidden_dim=16,
                            crop_size=args.crop_size) if tiny
               else SIFNetConfig(crop_size=args.crop_size))
    sifnet = SIFNet(sif_cfg, cam)
    def _init_sif():
        import jax.numpy as _j
        return sifnet.init(
            jax.random.PRNGKey(0),
            _j.zeros((1, args.net_size, args.net_size, 8)),
            _j.zeros((1, 8, 3)), _j.zeros((1, 2)), _j.zeros((1, 3)))

    if args.sifnet_ckpt == "random":
        sif_params = _init_sif()
    elif os.path.isdir(args.sifnet_ckpt):
        # orbax checkpoint from our own trainer (fit/trainer_loop.py)
        from ..fit.trainer_loop import CheckpointIO
        state, at_step = CheckpointIO(args.sifnet_ckpt).restore_latest(None)
        if state is None:
            raise SystemExit(
                f"no orbax checkpoint found under {args.sifnet_ckpt} "
                "(pass the experiment dir that contains checkpoints/)")
        sif_params = state["params"] if "params" in state else state
    else:
        sif_params = TI.sifnet_params(args.sifnet_ckpt, sif_cfg)
    inf_cfg = InfillerConfig()
    infiller = ConditionalMInfiller(inf_cfg)
    if args.infiller_ckpt == "random":
        import jax.numpy as _j
        L = inf_cfg.clip_len
        inf_params = infiller.init(
            jax.random.PRNGKey(1), _j.zeros((1, L, 147)),
            _j.zeros((1, L), bool), _j.zeros((1, L, 6)),
            _j.zeros((1, L), bool))
    else:
        inf_params = TI.infiller_params(args.infiller_ckpt, inf_cfg)
    W = 64
    sn_smpl_params = TI.smoothnet_params(args.smoothnet_smpl_ckpt, smpl=True) \
        if args.smoothnet_smpl_ckpt else None
    sn_rot_params = TI.smoothnet_params(args.smoothnet_objrot_ckpt) \
        if args.smoothnet_objrot_ckpt else None

    fit_cfg = SMPLTFitConfig()
    jcfg = JointFitConfig(early_stop=True, smpl_query_points=2048)
    gen_cfg = GeneratorConfig()
    generate = make_generator(sifnet_query_fn(sifnet), gen_cfg)
    run_infill = make_infiller(infiller, inf_cfg)
    os.makedirs(args.out, exist_ok=True)

    # build the jitted optimizers ONCE; per-chunk data flows through `ctx`
    # (closing over it would retrace + recompile every chunk)
    def query_fn(ctx, points):
        return sifnet.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                            ctx["bc"], method=SIFNet.query)[-1]

    def project_norm(ctx, joints):
        return cam.project_points(joints, ctx["cc"])[..., :2]

    def project_px(ctx, points):
        return cam.project_screen(points)

    opt_smpl = make_smpl_optimizer(query_fn, project_norm, smpl_model,
                                   landmarks, body_prior, hand_prior,
                                   part_labels, jcfg)
    opt_obj = make_object_optimizer(query_fn, project_px, jcfg)

    all_out = dict(poses=[], betas=[], trans=[], obj_angles=[], obj_trans=[],
                   obj_scales=[], recon_exist=[])

    for c0 in range(0, len(frames), args.chunk_size):
        chunk = frames[c0:c0 + args.chunk_size]
        B = len(chunk)
        print(f"[vistracker] chunk {chunk[0]}..{chunk[-1]} ({B} frames)")

        # ---- load observations ----
        kpts, mocap_poses, bbox_centers = [], [], []
        rgbs, pms, oms = [], [], []
        for idx in chunk:
            kpts.append(reader.get_body_kpts(idx, kid))
            p, _ = reader.get_mocap_params(idx, kid)
            mocap_poses.append(p)
            pm = reader.get_mask(idx, kid, "person")
            om = reader.get_mask(idx, kid, "obj")
            ys, xs = np.nonzero(pm)
            if len(xs) < 10:  # detector miss: fall back to the image center
                h, w = pm.shape
                print(f"[vistracker] warning: empty person mask at frame "
                      f"{reader.frames[idx]}, using image center")
                bbox_centers.append([w / 2, h / 2])
            else:
                bbox_centers.append([(xs.max() + xs.min()) / 2,
                                     (ys.max() + ys.min()) / 2])
            rgbs.append(reader.get_color(idx, kid))
            pms.append(pm)
            oms.append(om)
        kpts = np.stack(kpts).astype(np.float32)

        # ---- stage 1: SMPL-T keypoint fit ----
        betas0 = np.zeros((B, 10), np.float32)
        betas0[:, 0] = 2.2  # fixed shape init (fit_SMPLH_30fps.py:143-144)
        init = smplh_params(np.stack(mocap_poses), betas0,
                            init_trans_from_bbox(np.asarray(bbox_centers,
                                                            np.float32),
                                                 fit_cfg),
                            mean_hands=mean_hands)
        p1, _ = fit_smplt(smpl_model, landmarks, body_prior, hand_prior,
                          jnp.asarray(kpts), init, fit_cfg)

        # ---- stage 2: smooth + refit ----
        if sn_smpl_params is not None:
            # always the checkpoint's window: pad_to_window handles
            # chunks shorter than 64 frames
            sm = smooth_smplt(sn_smpl_params, np.asarray(p1.pose),
                              np.asarray(p1.betas), np.asarray(p1.trans),
                              window=W)
            init2 = smplh_params(sm["poses"], sm["betas"], sm["trans"],
                                 mean_hands=mean_hands)
            refit_cfg = SMPLTFitConfig(max_iters=30)
            p2, _ = fit_smplt(smpl_model, landmarks, body_prior, hand_prior,
                              jnp.asarray(kpts), init2, refit_cfg,
                              skip_global_phase=True)
        else:
            p2 = p1

        verts2, _, _, _ = lbs_forward(smpl_model, p2.pose, p2.betas, p2.trans)
        body_centers = landmarks.smpl_center(verts2)

        # ---- stage 3 + 4 inputs: crops + triplanes ----
        images, crop_centers = [], []
        smpl_faces = jnp.asarray(smpl_model.faces)
        for i in range(B):
            img5, cc = prepare_input_crop(rgbs[i], pms[i], oms[i],
                                          args.crop_size, args.net_size)
            tri = np.asarray(render_triplane_masks(
                verts2[i], smpl_faces, body_centers[i], args.net_size))
            images.append(np.concatenate([img5, tri], -1))
            crop_centers.append(cc)
        images = jnp.asarray(np.stack(images))
        crop_centers = np.stack(crop_centers)
        cc_j = jnp.asarray(crop_centers)

        # ---- stage 4: SIF-Net + generation ----
        from ..models.sifnet import pack_cache
        cache = sifnet.apply(sif_params, images, method=SIFNet.encode)
        # corner packing (PERF_NOTES.md); packing the half-res stem maps too
        # quadruples the dominant memory term — only below ~2 GB
        tmpx_bytes = 4 * B * (args.net_size // 2) ** 2 * 4 * (
            sif_cfg.tmpx_dim + 3 * sif_cfg.triplane_tmpx_dim)
        cache = pack_cache(cache, pack_tmpx=tmpx_bytes < 2e9)
        pc = generate(sif_params, cache, cc_j, body_centers,
                      jax.random.PRNGKey(c0))
        occ = np.asarray(pc["object"]["visibility"])[:, 0]

        if getattr(args, "neural_only", False):
            # demo.sh stage 4: save only neural reconstruction results
            all_out.setdefault("neural_pca", []).append(
                np.asarray(pc["object"]["pca_axis"]))
            all_out.setdefault("neural_trans", []).append(
                np.asarray(pc["object"]["centers"]))
            all_out.setdefault("neural_visibility", []).append(occ)
            all_out["recon_exist"].append(np.ones(B, bool))
            all_out["poses"].append(np.asarray(p2.pose))
            all_out["betas"].append(np.asarray(p2.betas))
            all_out["trans"].append(np.asarray(p2.trans))
            all_out["obj_angles"].append(
                np.broadcast_to(np.eye(3), (B, 3, 3)).copy())
            all_out["obj_trans"].append(np.zeros((B, 3)))
            all_out["obj_scales"].append(np.ones(B))
            continue

        # ---- stage 5: object-rot smoothing + infill ----
        rot_init = np.asarray(init_object_orientation(
            jnp.asarray(np.asarray(pc["object"]["pca_axis"])),
            jnp.broadcast_to(jnp.asarray(pca_init), (B, 3, 3))))
        rot_real = rot_init.transpose(0, 2, 1)
        if sn_rot_params is not None:
            rot_packed = smooth_objrot(sn_rot_params, rot_real, window=W)
            rot_real = rot_packed.transpose(0, 2, 1)
        filled = run_infill(inf_params, np.asarray(p2.pose),
                            np.asarray(p2.trans), rot_real, occ)
        rot_real = filled if filled is not None else rot_real

        # ---- stage 6: joint optimization ----
        def norm_kpts(k):
            xy = 2.0 * (args.crop_size / 2 + k[..., :2]
                        - crop_centers[:, None, :]) / args.crop_size - 1.0
            return np.concatenate([xy, k[..., 2:]], -1).astype(np.float32)

        ctx = dict(params=sif_params, cache=cache, cc=cc_j, bc=body_centers)
        smpl_final, _ = opt_smpl(p2, jnp.asarray(norm_kpts(kpts)), ctx)
        verts_f, _, _, _ = lbs_forward(smpl_model, smpl_final.pose,
                                       smpl_final.betas, smpl_final.trans)

        images_np = np.asarray(images)  # single transfer
        pm_net = images_np[..., 3]
        om_net = images_np[..., 4]
        sil = prepare_sil_refs(pm_net, om_net, crop_centers, args.crop_size,
                               args.net_size, jcfg.sil_size)
        # obj_s is fixed to 1: the release overwrites optimize_smpl's
        # returned height scale with ones ("Oct06: use single scale",
        # recon_fit_triplane.py:73-74)
        obj_t0 = np.asarray(pc["object"]["centers"]) + np.asarray(body_centers)
        obj_pts_b = jnp.broadcast_to(jnp.asarray(obj_points),
                                     (B,) + obj_points.shape)
        sil_verts_b = jnp.broadcast_to(jnp.asarray(temp_v), (B,) + temp_v.shape)
        r_fin, t_fin, _ = opt_obj(
            jnp.asarray(rot_real.transpose(0, 2, 1)), jnp.asarray(obj_t0),
            jnp.ones(B), obj_pts_b, verts_f, part_labels, jnp.asarray(occ),
            sil, sil_verts_b, jnp.asarray(sil_faces), ctx)

        all_out["poses"].append(np.asarray(smpl_final.pose))
        all_out["betas"].append(np.asarray(smpl_final.betas))
        all_out["trans"].append(np.asarray(smpl_final.trans))
        all_out["obj_angles"].append(np.asarray(r_fin))
        all_out["obj_trans"].append(np.asarray(t_fin))
        all_out["obj_scales"].append(np.ones(B))
        all_out["recon_exist"].append(np.ones(B, bool))

    # ---- stage 7: pack ----
    packed = {k: np.concatenate(v, 0) for k, v in all_out.items()}
    packed.update(recon_name=args.save_name,
                  frames=[reader.frames[i] for i in frames],
                  gender=reader.seq_info.get_gender())
    save_packed(outfile, packed)
    dt = time.time() - t_start
    print(json.dumps({"packed": outfile, "frames": len(frames),
                      "seconds": round(dt, 1),
                      "fps": round(len(frames) / dt, 2)}))
    return outfile
