"""Per-term translation attribution for stage 6 on a fixture run.

The round-3 finding: on held-out motion, stage 6 makes object translation
WORSE than its own stage-4/5 neural init (0.144 m -> 0.191 m on ms4).
This script answers WHICH weighted loss term pulls obj_t away from GT:
it rebuilds the stage-6 environment exactly as cli/real_track.py does
(same images, encoder cache, silhouette refs, frozen contact masks) and
evaluates every term's gradient w.r.t. each frame's translation — at the
stage-5/6 INIT point and at the FINAL tracked pose — via the
make_object_optimizer(...).term_probe diagnostic surface (fit/joint.py).

For each term and frame: pull_toward_gt = <-grad_t, (t_gt - t)/|t_gt - t|>
(positive = the term's descent direction moves t toward GT), reported as
vis/occ means plus the net (summed-term) pull. A term with a large
negative visible-frame pull at the init point is the one displacing the
good neural centers.

Usage:
  python scripts/ablate_stage6_terms.py --run fixture_run_ms \
      --net-preset small --heldout [--ocent 1.0] [--out results/...]
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="fixture_run_ms")
    ap.add_argument("--net-preset", default="small")
    ap.add_argument("--recon-tag", default="")
    ap.add_argument("--heldout", action="store_true")
    ap.add_argument("--chunk-size", type=int, default=30)
    ap.add_argument("--net-size", type=int, default=256)
    ap.add_argument("--crop-size", type=int, default=1200)
    ap.add_argument("--ocent", type=float, default=0.0,
                    help="probe with this w_ocent (0 still reports the "
                         "ocent pull at weight 1 — see joint.py _all_terms)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from vistracker_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.core.smpl import load_smpl_pkl, lbs_forward
    from vistracker_tpu.core.camera import PerspectiveCamera
    from vistracker_tpu.core.landmarks import (load_landmarks,
                                               load_part_labels,
                                               part_labels_array)
    from vistracker_tpu.data.behave import FrameDataReader, load_template
    from vistracker_tpu.data.images import prepare_input_crop
    from vistracker_tpu.data.packed import load_packed_recon
    from vistracker_tpu.data.sampling import compute_pca_axes
    from vistracker_tpu.data.silprep import prepare_sil_refs
    from vistracker_tpu.fit.joint import (JointFitConfig,
                                          make_object_optimizer,
                                          init_object_orientation)
    from vistracker_tpu.fit.infill import make_infiller
    from vistracker_tpu.fit.smoothing import smooth_objrot
    from vistracker_tpu.fit.trainer_loop import CheckpointIO
    from vistracker_tpu.models.sifnet import (SIFNet, sifnet_preset,
                                              pack_cache)
    from vistracker_tpu.models.infiller import (ConditionalMInfiller,
                                                InfillerConfig)
    from vistracker_tpu.ops.rasterizer import render_triplane_masks_batch
    from vistracker_tpu.utils.mesh import (load_ply, sample_surface,
                                           decimate_faces)

    meta = "fixture2_meta.npz" if args.heldout else "fixture_meta.npz"
    m = np.load(osp.join(args.run, meta))
    fx = {k: m[k] for k in m.files}
    seq_name = str(fx["seq_name"])
    psuf = "" if args.net_preset == "tiny" else f"_{args.net_preset}"
    rsuf = psuf + (f"_{args.recon_tag}" if args.recon_tag else "")
    rdir = ("recon_heldout" if args.heldout else "recon") + rsuf
    recon = load_packed_recon(osp.join(args.run, rdir, "recon_fixture",
                                       f"{seq_name}_k1.pkl"))
    T = recon.num_frames
    reader = FrameDataReader(str(fx["seq_dir"]))

    model = load_smpl_pkl(str(fx["model_pkl"]))
    # assets live BESIDE the sequence dir (one per data_* pool dir), not
    # inside it — same layout run_fixture_eval's loaders resolve
    assets = osp.join(osp.dirname(str(fx["seq_dir"])), "assets")
    lms = load_landmarks(assets)
    part_labels = part_labels_array(load_part_labels(assets),
                                    num_verts=model.v_template.shape[0])
    cam = PerspectiveCamera(crop_size=args.crop_size)
    temp_v, temp_f = load_template(str(fx["objects_root"]), "boxmedium")
    pca_init = compute_pca_axes(temp_v)
    obj_points = sample_surface(temp_v, temp_f, 3000,
                                np.random.RandomState(0))
    sil_faces = decimate_faces(temp_f, 2500)

    def _orbax(path):
        state, _ = CheckpointIO(path).restore_latest(None)
        assert state is not None, path
        return state["params"] if "params" in state else state

    sif_cfg = sifnet_preset(args.net_preset, crop_size=args.crop_size)
    sifnet = SIFNet(sif_cfg, cam)
    sif_params = _orbax(osp.join(args.run, "sifnet" + psuf))

    jcfg = JointFitConfig(w_ocent=args.ocent)

    def query_fn(ctx, points):
        return sifnet.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                            ctx["bc"], method=SIFNet.query)[-1]

    def project_px(ctx, points):
        return cam.project_screen(points)

    opt_obj = make_object_optimizer(query_fn, project_px, jcfg,
                                    segment_iters=8)

    # ---- recompute the stage-6 inputs exactly as real_track pass 3 does,
    # from the PACKED results (smpl_pose is the stage-6a refined SMPL; the
    # p2 smoothed SMPL is not stored, so triplanes/body-centers carry the
    # cm-scale stage-6a delta — fine for attribution, see diagnose_fixture)
    verts_all, _, _, _ = lbs_forward(model, jnp.asarray(recon.poses),
                                     jnp.asarray(recon.betas),
                                     jnp.asarray(recon.trans))
    body_centers = np.asarray(lms.smpl_center(verts_all))
    occ_all = np.asarray(recon.neural_visibility).reshape(-1)
    t_gt = np.asarray(fx["obj_trans_gt"])
    occ_gt = (np.asarray(fx["occ_ratios"])[:, 1]
              if fx["occ_ratios"].ndim == 2
              else np.asarray(fx["occ_ratios"]))
    vis = occ_gt > 0.5

    # stage-5 rotation chain (init_object_orientation -> SmoothNet ->
    # HVOP-Net autoregression), as real_track lines 482-490
    rot_init = np.asarray(init_object_orientation(
        jnp.asarray(recon.neural_pca),
        jnp.broadcast_to(jnp.asarray(pca_init), (T, 3, 3))))
    rot_real = rot_init.transpose(0, 2, 1)
    sn_rot = _orbax(osp.join(args.run, "sn_rot"))
    rot_real = smooth_objrot(sn_rot, rot_real, window=64).transpose(0, 2, 1)
    inf_cfg = InfillerConfig()
    infiller = ConditionalMInfiller(inf_cfg)
    inf_params = _orbax(osp.join(args.run, "infiller"))
    filled = make_infiller(infiller, inf_cfg)(
        inf_params, np.asarray(recon.poses), np.asarray(recon.trans),
        rot_real, occ_all)
    if filled is not None:
        rot_real = filled
    t0_all = np.asarray(recon.neural_trans) + body_centers

    smpl_faces = jnp.asarray(model.faces)
    probe = jax.jit(opt_obj.term_probe)

    def masks_for(params, env):
        """Frozen contact masks at the probe point (joint.py contact_masks
        semantics: labels/thresholded dfs, stop-gradient)."""
        from vistracker_tpu.fit.joint import (transform_obj_verts,
                                              decopose_axis)
        obj_now = transform_obj_verts(
            env["obj_points"], decopose_axis(params["obj_r"]),
            params["obj_t"], env["obj_s"])
        preds_o = query_fn(env["ctx"], obj_now)
        labels_o = jnp.argmax(preds_o["parts"], -1)
        mask_o = preds_o["df"][..., 0] < jcfg.cont_thres
        preds_h = query_fn(env["ctx"], env["smpl_verts"])
        mask_h = preds_h["df"][..., 1] < jcfg.cont_thres
        return labels_o, mask_h, mask_o

    masks_jit = jax.jit(masks_for)

    rows = {"init": {}, "final": {}}
    pulls = {p: {} for p in rows}  # term -> (T,) pull_toward_gt
    raws = {p: {} for p in rows}   # term -> scalar value per chunk
    chunks = [list(range(c, min(c + args.chunk_size, T)))
              for c in range(0, T, args.chunk_size)]
    for chunk in chunks:
        sl = slice(chunk[0], chunk[-1] + 1)
        B = len(chunk)
        print(f"[ablate] chunk {chunk[0]}..{chunk[-1]}", flush=True)
        tris = np.asarray(render_triplane_masks_batch(
            verts_all[sl], smpl_faces, jnp.asarray(body_centers[sl]),
            args.net_size))
        images, ccs = [], []
        for j, idx in enumerate(chunk):
            rgb = reader.get_color(idx, 1)
            pm = reader.get_mask(idx, 1, "person")
            om = reader.get_mask(idx, 1, "obj")
            img5, cc = prepare_input_crop(rgb, pm, om, args.crop_size,
                                          args.net_size)
            images.append(np.concatenate([img5, tris[j]], -1))
            ccs.append(cc)
        images = np.stack(images)
        ccs = np.stack(ccs)
        cache = pack_cache(sifnet.apply(sif_params, jnp.asarray(images),
                                        method=SIFNet.encode))
        ctx = dict(params=sif_params, cache=cache, cc=jnp.asarray(ccs),
                   bc=jnp.asarray(body_centers[sl]))
        sil = prepare_sil_refs(images[..., 3], images[..., 4], ccs,
                               args.crop_size, args.net_size, jcfg.sil_size)
        env = dict(
            obj_points=jnp.broadcast_to(jnp.asarray(obj_points),
                                        (B,) + obj_points.shape),
            obj_s=jnp.ones(B), occ=jnp.asarray(occ_all[sl]), ctx=ctx,
            smpl_verts=verts_all[sl],
            labels_h=jnp.asarray(part_labels), sil=sil,
            sil_verts=jnp.broadcast_to(jnp.asarray(temp_v),
                                       (B,) + temp_v.shape),
            sil_faces=jnp.asarray(sil_faces))
        points = {
            "init": {"obj_r": jnp.asarray(
                rot_real[sl].transpose(0, 2, 1)),
                "obj_t": jnp.asarray(t0_all[sl])},
            "final": {"obj_r": jnp.asarray(recon.obj_angles[sl]),
                      "obj_t": jnp.asarray(recon.obj_trans[sl])},
        }
        for pname, params in points.items():
            env["ocent_target"] = jnp.asarray(t0_all[sl])
            labels_o, mask_h, mask_o = masks_jit(params, env)
            envp = dict(env, labels_o=labels_o, mask_h=mask_h,
                        mask_o=mask_o)
            res = probe(params, envp)
            t_now = np.asarray(params["obj_t"])
            d = t_gt[sl] - t_now
            dn = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True),
                                1e-9)
            for term, (val, g) in res.items():
                pull = -(np.asarray(g) * dn).sum(1)  # (B,)
                pulls[pname].setdefault(term, []).append(pull)
                raws[pname].setdefault(term, []).append(float(val))

    rep = {"run": args.run, "heldout": bool(args.heldout),
           "net_preset": args.net_preset, "recon_tag": args.recon_tag,
           "probe_w_ocent": max(args.ocent, 1.0), "frames": T,
           "note": ("pull_toward_gt = <-d(term)/d(obj_t), unit(t_gt - t)> "
                    "per frame; positive = the term's descent moves the "
                    "object translation toward GT. grad_norm = |grad| "
                    "(m^-1 of weighted loss). Probed at the stage-5/6 "
                    "init and at the final tracked pose.")}
    for pname in rows:
        rep[pname] = {}
        for term in sorted(pulls[pname]):
            pl = np.concatenate(pulls[pname][term])
            rep[pname][term] = {
                "pull_all": float(pl.mean()),
                "pull_vis": float(pl[vis].mean()) if vis.any() else None,
                "pull_occ": float(pl[~vis].mean()) if (~vis).any() else None,
                "value": float(np.mean(raws[pname][term])),
            }
        net = np.sum([np.concatenate(pulls[pname][t])
                      for t in pulls[pname]
                      if t != "ocent" or args.ocent > 0], axis=0)
        rep[pname]["NET"] = {"pull_all": float(net.mean()),
                             "pull_vis": float(net[vis].mean()),
                             "pull_occ": float(net[~vis].mean())}
    out = args.out or osp.join(
        "results", f"ablate_terms{'_heldout' if args.heldout else ''}"
        f"{rsuf}.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=2)
    print(json.dumps(rep, indent=1))
    print(f"[ablate] wrote {out}")


if __name__ == "__main__":
    main()
