"""Real-data (BEHAVE-layout) tracking pipeline — the 7 reference demo
stages over an actual sequence folder.

Inputs per sequence (reference data layout, behave.FrameDataReader):
  <seq>/info.json, per-frame folders tXXXX.XXX/ with k{kid}.color.jpg,
  person/object masks, k{kid}.color.json OpenPose keypoints,
  k{kid}.mocap.json FrankMocap init; object templates under --objects-root;
  SMPL-H model pkl; assets (landmark regressors, priors); released or
  self-trained checkpoints for SIF-Net / SmoothNet / HVOP-Net (torch .tar
  via models.torch_import, or orbax dirs from our trainer).

Stage structure (matching the reference's per-stage sequence granularity):
the per-frame-independent heavy stages (1 keypoint fit, 2b refit, 3 crops
+ triplanes, 4 SIF-Net, 6 joint optimization) stream through the sequence
in chunks of --chunk-size frames as jit-compiled device programs, while the
temporal stages run over the WHOLE sequence at once — stage 2a SmoothNet
smoothing (reference smoothnet/smooth_base.py:45-72 slides W=64 windows
across the full sequence) and stage 5 object-rot smoothing + HVOP-Net
autoregressive infill (interp/test_infill_autoreg.py:117-165 carries the
30-frame context across the full sequence). SmoothNet windows and infill
context therefore cross chunk boundaries exactly as in the reference;
chunking only bounds device memory for the per-chunk programs.
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
    from ..models.sifnet import SIFNet, sifnet_preset
    from ..models.smoothnet import SmoothNet, SmoothNetSMPL
    from ..models.infiller import ConditionalMInfiller, InfillerConfig
    from ..models import torch_import as TI
    from ..ops.rasterizer import render_triplane_masks_batch
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
    if getattr(args, "dataset", "behave") == "intercap":
        # tri-icap: per-kid InterCap intrinsics (nr_utils.py:224-240); the
        # release config uses crop_size 800
        from ..core.camera import intercap_camera
        cam = intercap_camera(kid=kid, crop_size=args.crop_size)
    else:
        cam = PerspectiveCamera(crop_size=args.crop_size)

    obj_name = reader.seq_info.get_obj_name()
    temp_v, temp_f = load_template(args.objects_root, obj_name)
    pca_init = compute_pca_axes(temp_v)
    obj_points = sample_surface(temp_v, temp_f, 3000,
                                np.random.RandomState(0))
    sil_faces = decimate_faces(temp_f, 2500)

    # networks + checkpoints ("random" initializes untrained weights — for
    # pipeline smoke tests only)
    preset = ("tiny" if getattr(args, "tiny_nets", False)
              else getattr(args, "net_preset", "release"))
    sif_cfg = sifnet_preset(preset, crop_size=args.crop_size)
    sifnet = SIFNet(sif_cfg, cam)
    def _init_sif():
        import jax.numpy as _j
        return sifnet.init(
            jax.random.PRNGKey(0),
            _j.zeros((1, args.net_size, args.net_size, 8)),
            _j.zeros((1, 8, 3)), _j.zeros((1, 2)), _j.zeros((1, 3)))

    if args.sifnet_ckpt == "random":
        sif_params = _init_sif()
    elif os.path.isdir(args.sifnet_ckpt) \
            and not TI.is_torch_experiment_dir(args.sifnet_ckpt):
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
    def _orbax_params(path):
        """Load params from an orbax experiment dir written by our trainer
        (fit/trainer_loop.py CheckpointIO layout)."""
        from ..fit.trainer_loop import CheckpointIO
        state, _ = CheckpointIO(path).restore_latest(None)
        if state is None:
            raise SystemExit(f"no orbax checkpoint under {path}")
        return state["params"] if "params" in state else state

    inf_cfg = InfillerConfig()
    infiller = ConditionalMInfiller(inf_cfg)
    if args.infiller_ckpt == "random":
        import jax.numpy as _j
        L = inf_cfg.clip_len
        inf_params = infiller.init(
            jax.random.PRNGKey(1), _j.zeros((1, L, 147)),
            _j.zeros((1, L), bool), _j.zeros((1, L, 6)),
            _j.zeros((1, L), bool))
    elif os.path.isdir(args.infiller_ckpt) \
            and not TI.is_torch_experiment_dir(args.infiller_ckpt):
        inf_params = _orbax_params(args.infiller_ckpt)
    else:
        inf_params = TI.infiller_params(args.infiller_ckpt, inf_cfg)
    W = 64

    def _sn_params(ck, smpl):
        if not ck:
            return None
        if ck == "random":  # untrained weights for pipeline smoke tests
            model = (SmoothNetSMPL(window_size=W, output_size=W) if smpl
                     else SmoothNet(window_size=W, output_size=W))
            return model.init(jax.random.PRNGKey(7),
                              jnp.zeros((1, 157 if smpl else 6, W)))
        if os.path.isdir(ck) and not TI.is_torch_experiment_dir(ck):
            return _orbax_params(ck)
        return TI.smoothnet_params(ck, smpl=smpl)

    sn_smpl_params = _sn_params(args.smoothnet_smpl_ckpt, smpl=True)
    sn_rot_params = _sn_params(args.smoothnet_objrot_ckpt, smpl=False)

    fit_cfg = SMPLTFitConfig()
    # parity default: query ALL SMPL verts in the df/part losses like the
    # reference (recon_fit_behave.py:467-513); subsampling is an opt-in
    # speed/accuracy trade via --smpl-query-points
    collision = bool(getattr(args, "collision", False))
    # early stopping defaults OFF: measured on the cross-implementation
    # harness (results/crossimpl_parity.json), the REFERENCE's own gate
    # (fit_SMPLH_kpts.py:163, rel < prev*1e-3) never fires — its w/(1+it)
    # decay keeps relative per-step changes ~1e-4 while the threshold
    # shrinks with the loss — and ours measured the same (full budgets
    # used on every fixture run). Running the fixed budget IS reference
    # parity; --early-stop re-enables the gates.
    jcfg = JointFitConfig(
        early_stop=bool(getattr(args, "early_stop", False)),
        collision=collision,
        w_ocent=float(getattr(args, "ocent", 0.0) or 0.0),
        smpl_query_points=getattr(args, "smpl_query_points", 0) or 0,
        sil_backend=getattr(args, "sil_backend", "auto"))
    sdf_grid = None
    if collision:
        # template SDF grid built ONCE per sequence (host side) — the
        # stage-6 joint phase then penalizes SMPL verts whose template-frame
        # SDF is negative (replaces the reference's CUDA BVH collision term,
        # recon_fit_base.py:92-100,736-765)
        from ..ops.sdf_grid import SDFGrid
        from ..utils.mesh import signed_distance_grid
        res = int(getattr(args, "sdf_res", 64) or 64)
        vals, bmin, bmax = signed_distance_grid(temp_v, temp_f, res)
        sdf_grid = SDFGrid(jnp.asarray(vals), jnp.asarray(bmin),
                           jnp.asarray(bmax))
        print(f"[vistracker] collision term ON (template SDF grid {res}^3)")
    from ..fit.generator import FUNNEL_DEFAULT
    gen_cfg = GeneratorConfig(
        center_agg="median" if getattr(args, "robust_centers", False)
        else "mean",
        funnel=FUNNEL_DEFAULT if getattr(args, "fast_gen", False) else None)
    generate = make_generator(sifnet_query_fn(sifnet), gen_cfg)
    run_infill = make_infiller(infiller, inf_cfg)
    os.makedirs(args.out, exist_ok=True)

    # build the jitted optimizers ONCE; per-chunk data flows through `ctx`
    # (closing over it would retrace + recompile every chunk)
    def query_fn(ctx, points):
        return sifnet.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                            ctx["bc"], method=SIFNet.query)[-1]

    # head-restricted per-STEP queries: the smpl-phase loss reads only
    # df + parts, the object-phase losses only df. Runtime-equivalent to
    # the full query (XLA DCE prunes unread heads inside the jitted
    # optimizers — measured 1.00x, scripts/profile_stage6_heads.py); this
    # keeps the traced program / compile payload smaller and documents
    # what each loss reads. The once-per-chunk contact_masks keeps the
    # full query.
    def query_smpl_step(ctx, points):
        return sifnet.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                            ctx["bc"], method=SIFNet.query_heads,
                            heads=("df", "parts"))

    def query_df_step(ctx, points):
        return sifnet.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                            ctx["bc"], method=SIFNet.query_heads,
                            heads=("df",))

    def project_norm(ctx, joints):
        return cam.project_points(joints, ctx["cc"])[..., :2]

    def project_px(ctx, points):
        return cam.project_screen(points)

    seg = getattr(args, "segment_iters", 0) or None
    opt_smpl = make_smpl_optimizer(query_smpl_step, project_norm, smpl_model,
                                   landmarks, body_prior, hand_prior,
                                   part_labels, jcfg, segment_iters=seg,
                                   report_iters=True)
    opt_obj = make_object_optimizer(query_df_step, project_px, jcfg,
                                    segment_iters=seg, report_iters=True,
                                    contact_query_fn=query_fn)
    iters_log = {"smpl": [], "joint": []}

    from ..models.sifnet import pack_cache, cast_cache
    smpl_faces = jnp.asarray(smpl_model.faces)
    T = len(frames)
    chunks = [frames[c0:c0 + args.chunk_size]
              for c0 in range(0, T, args.chunk_size)]
    bounds = np.cumsum([0] + [len(c) for c in chunks])
    neural_only = bool(getattr(args, "neural_only", False))

    # ---- frame-axis SPMD: shard each chunk's frame dimension over the
    # device mesh (the TPU-native replacement for the reference's
    # --start/--end cluster fan-out, README.md:52). Temporal-stencil halos
    # become automatic collective permutes (tests/test_sharding.py asserts
    # sharded == single-device for the fit programs).
    n_dev = len(jax.devices())
    shard = bool(getattr(args, "shard_frames", False)) and n_dev > 1
    if shard:
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(axis="frames")
        print(f"[vistracker] frame-axis sharding over {n_dev} devices")

    def shard_chunk(tree, B):
        """Pad every B-leading leaf to a device multiple (repeating the
        last frame) and shard its frame axis; other leaves replicate.
        Returns (device_tree, unpad_fn)."""
        if not shard:
            return tree, (lambda t: t)
        Bp = -(-B // n_dev) * n_dev

        def put(x):
            x = jnp.asarray(x)
            if x.ndim and x.shape[0] == B:
                if Bp != B:
                    x = jnp.concatenate(
                        [x, jnp.broadcast_to(x[-1:], (Bp - B,)
                                             + x.shape[1:])], 0)
                return jax.device_put(
                    x, NamedSharding(mesh, PartitionSpec("frames")))
            return jax.device_put(x, NamedSharding(mesh, PartitionSpec()))

        def unpad(t):
            return jax.tree.map(
                lambda y: y[:B] if getattr(y, "ndim", 0)
                and y.shape[0] == Bp else y, t)

        return jax.tree.map(put, tree), unpad

    def build_images(chunk, verts2_c, body_centers_c):
        """Stage-3 inputs for one chunk: 5ch crop stack + 3ch triplanes.
        Rebuilt from the readers on each pass — recomputing the crops +
        encode is far cheaper than holding every chunk's feature cache
        (~5 GB/chunk at release sizes) across the full-sequence stages."""
        tris = np.asarray(render_triplane_masks_batch(
            jnp.asarray(verts2_c), smpl_faces,
            jnp.asarray(body_centers_c), args.net_size))
        images, ccs = [], []
        for j, idx in enumerate(chunk):
            rgb = reader.get_color(idx, kid)
            pm = reader.get_mask(idx, kid, "person")
            om = reader.get_mask(idx, kid, "obj")
            img5, cc = prepare_input_crop(rgb, pm, om, args.crop_size,
                                          args.net_size)
            images.append(np.concatenate([img5, tris[j]], -1))
            ccs.append(cc)
        return np.stack(images), np.stack(ccs)

    cache_dtype = jnp.bfloat16 if args.cache_dtype == "bfloat16" \
        else jnp.float32
    cache_itemsize = 2 if args.cache_dtype == "bfloat16" else 4

    def encode_chunk(images):
        B = len(images)
        cache = sifnet.apply(sif_params, jnp.asarray(images),
                             method=SIFNet.encode)
        if cache_dtype != jnp.float32:
            # bf16 cache: halves the HBM footprint AND every query gather's
            # bandwidth (models/sifnet.py:cast_cache); blend + decoders
            # stay fp32
            cache = cast_cache(cache, cache_dtype)
        # corner packing (PERF_NOTES.md) is a gather optimization paid in
        # 4x cache memory — apply each group only under a byte budget
        # (release sizes: hg packed ~200 MB/frame, stem packed ~100
        # MB/frame; a 32-frame chunk with everything packed crowds out the
        # optimizer working set and crashes the worker)
        # inference caches keep only the LAST stack per encoder
        # (SIFNet.encode: rgb_feats[-1:]), so one hg map per encoder
        hg_px = (args.net_size // 4) ** 2
        hg_bytes = 4 * B * hg_px * cache_itemsize * (
            sif_cfg.hourglass_dim + 3 * sif_cfg.triplane_hg_dim)
        tmpx_bytes = 4 * B * (args.net_size // 2) ** 2 * cache_itemsize * (
            sif_cfg.tmpx_dim + 3 * sif_cfg.triplane_tmpx_dim)
        return pack_cache(cache, pack_tmpx=tmpx_bytes < 2e9,
                          pack_hg=hg_bytes < 2e9)

    def norm_kpts(k, ccs):
        xy = 2.0 * (args.crop_size / 2 + k[..., :2]
                    - ccs[:, None, :]) / args.crop_size - 1.0
        return np.concatenate([xy, k[..., 2:]], -1).astype(np.float32)

    # ================= pass 1: per-chunk SMPL-T keypoint fits =============
    kpts_all = np.zeros((T, 25, 3), np.float32)
    p1_pose = np.zeros((T, 156), np.float32)
    p1_betas = np.zeros((T, 10), np.float32)
    p1_trans = np.zeros((T, 3), np.float32)
    for ci, chunk in enumerate(chunks):
        B = len(chunk)
        sl = slice(bounds[ci], bounds[ci + 1])
        print(f"[vistracker] stage 1 chunk {chunk[0]}..{chunk[-1]}"
              f" ({B} frames)")
        kpts, mocap_poses, bbox_centers = [], [], []
        for idx in chunk:
            # tol 0.1: the fitter's own threshold (fit_SMPLH_kpts.py
            # load_kpts default), NOT the reader's generic 0.5
            kpts.append(reader.get_body_kpts(idx, kid, tol=0.1))
            p, _ = reader.get_mocap_params(idx, kid)
            mocap_poses.append(p)
            pm = reader.get_mask(idx, kid, "person")
            ys, xs = np.nonzero(pm)
            if len(xs) < 10:  # detector miss: fall back to the image center
                h, w = pm.shape
                print(f"[vistracker] warning: empty person mask at frame "
                      f"{reader.frames[idx]}, using image center")
                bbox_centers.append([w / 2, h / 2])
            else:
                bbox_centers.append([(xs.max() + xs.min()) / 2,
                                     (ys.max() + ys.min()) / 2])
        kpts_all[sl] = np.stack(kpts).astype(np.float32)
        betas0 = np.zeros((B, 10), np.float32)
        betas0[:, 0] = 2.2  # fixed shape init (fit_SMPLH_30fps.py:143-144)
        init = smplh_params(np.stack(mocap_poses), betas0,
                            init_trans_from_bbox(np.asarray(bbox_centers,
                                                            np.float32),
                                                 fit_cfg),
                            mean_hands=mean_hands)
        (kpts_d, init_d), unpad = shard_chunk(
            (jnp.asarray(kpts_all[sl]), init), B)
        p1, _ = fit_smplt(smpl_model, landmarks, body_prior, hand_prior,
                          kpts_d, init_d, fit_cfg)
        p1 = unpad(p1)
        p1_pose[sl] = np.asarray(p1.pose)
        p1_betas[sl] = np.asarray(p1.betas)
        p1_trans[sl] = np.asarray(p1.trans)

    # ============ stage 2: FULL-SEQUENCE SmoothNet smooth + refit ==========
    # the sliding W=64 windows span the whole sequence, crossing chunk
    # boundaries (smooth_base.py:45-72); only the re-fit streams in chunks
    p2_pose, p2_betas, p2_trans = p1_pose, p1_betas, p1_trans
    if sn_smpl_params is not None:
        print(f"[vistracker] stage 2: SmoothNet over all {T} frames + refit")
        sm = smooth_smplt(sn_smpl_params, p1_pose, p1_betas, p1_trans,
                          window=W)
        p2_pose = np.zeros_like(p1_pose)
        p2_betas = np.zeros_like(p1_betas)
        p2_trans = np.zeros_like(p1_trans)
        refit_cfg = SMPLTFitConfig(max_iters=30)
        for ci, chunk in enumerate(chunks):
            sl = slice(bounds[ci], bounds[ci + 1])
            init2 = smplh_params(sm["poses"][sl], sm["betas"][sl],
                                 sm["trans"][sl], mean_hands=mean_hands)
            (kpts_d, init_d), unpad = shard_chunk(
                (jnp.asarray(kpts_all[sl]), init2), bounds[ci + 1] - bounds[ci])
            p2, _ = fit_smplt(smpl_model, landmarks, body_prior, hand_prior,
                              kpts_d, init_d, refit_cfg,
                              skip_global_phase=True)
            p2 = unpad(p2)
            p2_pose[sl] = np.asarray(p2.pose)
            p2_betas[sl] = np.asarray(p2.betas)
            p2_trans[sl] = np.asarray(p2.trans)

    # ====== pass 2: per-chunk stages 3+4 (+ stage-6a SMPL refinement) ======
    body_centers_all = np.zeros((T, 3), np.float32)
    neural_pca = np.zeros((T, 3, 3), np.float32)
    neural_trans = np.zeros((T, 3), np.float32)
    occ_all = np.zeros(T, np.float32)
    smpl_pose = np.zeros_like(p1_pose)
    smpl_betas = np.zeros_like(p1_betas)
    smpl_trans = np.zeros_like(p1_trans)
    for ci, chunk in enumerate(chunks):
        sl = slice(bounds[ci], bounds[ci + 1])
        print(f"[vistracker] stages 3-4 chunk {chunk[0]}..{chunk[-1]}")
        verts2, _, _, _ = lbs_forward(smpl_model, jnp.asarray(p2_pose[sl]),
                                      jnp.asarray(p2_betas[sl]),
                                      jnp.asarray(p2_trans[sl]))
        body_centers = landmarks.smpl_center(verts2)
        body_centers_all[sl] = np.asarray(body_centers)
        images, ccs = build_images(chunk, verts2, body_centers)
        (img_d, cc_d, bc_d), unpad = shard_chunk(
            (jnp.asarray(images), jnp.asarray(ccs), body_centers),
            len(chunk))
        cache = encode_chunk(img_d)
        pc = unpad(generate(sif_params, cache, cc_d, bc_d,
                            jax.random.PRNGKey(int(bounds[ci]))))
        neural_pca[sl] = np.asarray(pc["object"]["pca_axis"])
        neural_trans[sl] = np.asarray(pc["object"]["centers"])
        occ_all[sl] = np.asarray(pc["object"]["visibility"])[:, 0]
        if neural_only:
            continue
        # stage-6a SMPL refinement (optimize_smpl) — depends only on the
        # smoothed SMPL-T init + this chunk's neural fields, so it runs here
        # while the encoder cache is already resident
        ctx = dict(params=sif_params, cache=cache, cc=cc_d, bc=bc_d)
        p2c = smplh_params(p2_pose[sl], p2_betas[sl], p2_trans[sl],
                           mean_hands=mean_hands)
        (p2c_d, kpts_d), unpad = shard_chunk(
            (p2c, jnp.asarray(norm_kpts(kpts_all[sl], ccs))), len(chunk))
        smpl_final, _, it_s = opt_smpl(p2c_d, kpts_d, ctx)
        iters_log["smpl"].append(int(it_s["smpl"]))
        tag = ("early-stopped at"
               if iters_log["smpl"][-1] < it_s["smpl_max"] else "ran full")
        print(f"[vistracker]   optimize_smpl {tag} iter "
              f"{iters_log['smpl'][-1]}/{it_s['smpl_max']}")
        smpl_final = unpad(smpl_final)
        smpl_pose[sl] = np.asarray(smpl_final.pose)
        smpl_betas[sl] = np.asarray(smpl_final.betas)
        smpl_trans[sl] = np.asarray(smpl_final.trans)

    if neural_only:
        # demo.sh stage 4: pack only neural reconstruction results
        packed = dict(
            poses=p2_pose, betas=p2_betas, trans=p2_trans,
            obj_angles=np.broadcast_to(np.eye(3), (T, 3, 3)).copy(),
            obj_trans=np.zeros((T, 3)), obj_scales=np.ones(T),
            neural_pca=neural_pca, neural_trans=neural_trans,
            neural_visibility=occ_all, recon_exist=np.ones(T, bool))
        packed.update(recon_name=args.save_name,
                      frames=[reader.frames[i] for i in frames],
                      gender=reader.seq_info.get_gender())
        save_packed(outfile, packed)
        dt = time.time() - t_start
        print(json.dumps({"packed": outfile, "frames": T,
                          "seconds": round(dt, 1),
                          "fps": round(T / dt, 2)}))
        return outfile

    # ==== stage 5: FULL-SEQUENCE object-rot smoothing + HVOP-Net infill ====
    # the autoregressive 30-frame context carries across the whole sequence
    # (test_infill_autoreg.py:117-165), so occlusions spanning chunk
    # boundaries are infilled from real context instead of resetting
    print(f"[vistracker] stage 5: smoothing + infill over all {T} frames")
    rot_init = np.asarray(init_object_orientation(
        jnp.asarray(neural_pca),
        jnp.broadcast_to(jnp.asarray(pca_init), (T, 3, 3))))
    rot_real = rot_init.transpose(0, 2, 1)
    if sn_rot_params is not None:
        rot_packed = smooth_objrot(sn_rot_params, rot_real, window=W)
        rot_real = rot_packed.transpose(0, 2, 1)
    filled = run_infill(inf_params, smpl_pose, smpl_trans, rot_real, occ_all)
    rot_real = filled if filled is not None else rot_real

    # ============== pass 3: per-chunk stage-6b object fitting ==============
    obj_angles = np.zeros((T, 3, 3), np.float32)
    obj_trans = np.zeros((T, 3), np.float32)
    for ci, chunk in enumerate(chunks):
        B = len(chunk)
        sl = slice(bounds[ci], bounds[ci + 1])
        print(f"[vistracker] stage 6 chunk {chunk[0]}..{chunk[-1]}")
        # rebuild the stage-3 inputs + encoder cache (triplanes come from the
        # SMOOTHED SMPL like pass 2 — the reference also feeds SIF-Net the
        # smooth-triplane renders during joint opt, testdata_triplane.py)
        verts2, _, _, _ = lbs_forward(smpl_model, jnp.asarray(p2_pose[sl]),
                                      jnp.asarray(p2_betas[sl]),
                                      jnp.asarray(p2_trans[sl]))
        images, ccs = build_images(chunk, verts2,
                                   jnp.asarray(body_centers_all[sl]))
        (img_d, cc_d, bc_d), _ = shard_chunk(
            (jnp.asarray(images), jnp.asarray(ccs),
             jnp.asarray(body_centers_all[sl])), B)
        cache = encode_chunk(img_d)
        ctx = dict(params=sif_params, cache=cache, cc=cc_d, bc=bc_d)
        verts_f, _, _, _ = lbs_forward(smpl_model, jnp.asarray(smpl_pose[sl]),
                                       jnp.asarray(smpl_betas[sl]),
                                       jnp.asarray(smpl_trans[sl]))
        pm_net = images[..., 3]
        om_net = images[..., 4]
        sil = prepare_sil_refs(pm_net, om_net, ccs, args.crop_size,
                               args.net_size, jcfg.sil_size)
        # obj_s is fixed to 1: the release overwrites optimize_smpl's
        # returned height scale with ones ("Oct06: use single scale",
        # recon_fit_triplane.py:73-74)
        obj_t0 = neural_trans[sl] + body_centers_all[sl]
        obj_pts_b = jnp.broadcast_to(jnp.asarray(obj_points),
                                     (B,) + obj_points.shape)
        sil_verts_b = jnp.broadcast_to(jnp.asarray(temp_v),
                                       (B,) + temp_v.shape)
        batched, unpad = shard_chunk(
            (jnp.asarray(rot_real[sl].transpose(0, 2, 1)),
             jnp.asarray(obj_t0), jnp.ones(B), obj_pts_b, verts_f,
             jnp.asarray(occ_all[sl]), sil, sil_verts_b), B)
        r0_d, t0_d, s_d, opts_d, vf_d, occ_d, sil_d, sv_d = batched
        r_fin, t_fin, _, it_o = opt_obj(r0_d, t0_d, s_d, opts_d, vf_d,
                                        part_labels, occ_d, sil_d, sv_d,
                                        jnp.asarray(sil_faces), ctx,
                                        sdf_grid=sdf_grid)
        iters_log["joint"].append(int(it_o["joint"]))
        tag = ("early-stopped at"
               if iters_log["joint"][-1] < it_o["joint_max"] else "ran full")
        print(f"[vistracker]   joint phase {tag} iter "
              f"{iters_log['joint'][-1]}/{it_o['joint_max']}")
        r_fin, t_fin = unpad((r_fin, t_fin))
        obj_angles[sl] = np.asarray(r_fin)
        obj_trans[sl] = np.asarray(t_fin)

    # ---- stage 7: pack ----
    packed = dict(poses=smpl_pose, betas=smpl_betas, trans=smpl_trans,
                  obj_angles=obj_angles, obj_trans=obj_trans,
                  obj_scales=np.ones(T), recon_exist=np.ones(T, bool),
                  neural_pca=neural_pca, neural_trans=neural_trans,
                  neural_visibility=occ_all)
    packed.update(recon_name=args.save_name,
                  frames=[reader.frames[i] for i in frames],
                  gender=reader.seq_info.get_gender())
    save_packed(outfile, packed)
    dt = time.time() - t_start
    # measured early-stop iteration usage (weak spot in the round-1 review:
    # the ~35% figure was asserted from the reference's behavior, not
    # measured — this records what OUR early stop actually does per run)
    its = {f"iters_{k}_mean": round(float(np.mean(v)), 1)
           for k, v in iters_log.items() if v}
    summary = {"packed": outfile, "frames": len(frames),
               "seconds": round(dt, 1),
               "fps": round(len(frames) / dt, 2),
               "chunk_size": args.chunk_size, **its}
    print(json.dumps(summary))
    with open(outfile.replace(".pkl", "_track.json"), "w") as f:
        json.dump(summary, f, indent=2)  # persisted for perf tooling
    return outfile
