"""Sequence-level validation probe for SIF-Net checkpoint selection.

Round-5 finding (STATUS): training-draw variance dominates heldout
accuracy, the catastrophic draws are visibility-head overfits
(pred-vis/GT-occ corr 0.79 vs 0.99), and NO train/val-side metric
discriminates them — the fixture trainer's val split draws frames from
the SAME sequences, so loss_vis goes to ~0 exactly when the head
memorizes. Discrimination requires an UNSEEN-motion sequence.

This probe scores a SIF-Net checkpoint on a dedicated validation
sequence (motion_seed 2 by default — distinct from every training seed
0/101/... AND from the heldout EVAL seed 1, so selecting on it is
legitimate): it renders the val sequence once into <out>/data_val, runs
the stage-4 neural pass (encoder + funnel generator) with GT-SMPL
conditioning, and reports
  * vis_corr:  corr(predicted visibility, GT occlusion ratio)  [primary
               selector — the failure mode it catches]
  * center_m:  mean |neural_center - GT object center|
Select the training seed with the highest vis_corr (ties: lowest
center_m). cf. results/vis_val_selection_ms8.json.

Usage:
  python scripts/select_seed_by_val.py --out fixture_run_ms8 \
      --ckpt fixture_run_ms8/sifnet_small_seed1 [--net-preset small]
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fixture_run_ms8")
    ap.add_argument("--ckpt", required=True,
                    help="sifnet checkpoint dir (orbax, fixture trainer)")
    ap.add_argument("--net-preset", default="small")
    ap.add_argument("--val-motion-seed", type=int, default=2)
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--raster", type=int, default=512)
    ap.add_argument("--crop-size", type=int, default=1200)
    ap.add_argument("--net-size", type=int, default=256)
    ap.add_argument("--object-shape", default="box")
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from vistracker_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import run_fixture_eval as rf
    from vistracker_tpu.data.fixture import generate_fixture_sequence
    from vistracker_tpu.core.smpl import load_smpl_pkl
    from vistracker_tpu.core.landmarks import load_landmarks
    from vistracker_tpu.core.camera import PerspectiveCamera
    from vistracker_tpu.models.sifnet import SIFNet, sifnet_preset
    from vistracker_tpu.fit.generator import (FUNNEL_DEFAULT,
                                              GeneratorConfig,
                                              make_generator,
                                              sifnet_query_fn)
    from vistracker_tpu.fit.trainer_loop import CheckpointIO

    # --- val sequence: generated once, shared by every probed seed ---
    data_dir = osp.join(args.out, "data_val")
    meta_path = osp.join(args.out, "fixture_val_meta.npz")
    real_assets = ("/root/reference/assets"
                   if osp.isdir("/root/reference/assets") else None)
    if osp.isfile(meta_path):
        m = np.load(meta_path)
        fx = {k: m[k] for k in m.files}
        fx.update(seq_dir=str(fx["seq_dir"]),
                  model_pkl=str(fx["model_pkl"]),
                  objects_root=str(fx["objects_root"]))
    else:
        print(f"[val] generating val sequence (motion_seed "
              f"{args.val_motion_seed})...", flush=True)
        fx = generate_fixture_sequence(
            data_dir, T=args.frames, raster=args.raster,
            real_assets=real_assets, motion_seed=args.val_motion_seed,
            object_shape=args.object_shape)
        np.savez(meta_path, **fx)

    model = load_smpl_pkl(str(fx["model_pkl"]))
    assets = osp.join(osp.dirname(str(fx["seq_dir"])), "assets")
    landmarks = load_landmarks(assets)
    frames, _, _ = rf.build_training_frames(fx, model, landmarks,
                                            args.crop_size, args.net_size)
    gt_occ = np.asarray([f["visibility"] for f in frames], np.float32)
    gt_center = np.asarray(fx["obj_trans_gt"], np.float32)

    # --- checkpoint under probe ---
    cfg = sifnet_preset(args.net_preset, crop_size=args.crop_size,
                        remat=True)
    net = SIFNet(cfg, PerspectiveCamera(crop_size=args.crop_size))
    state, at_step = CheckpointIO(args.ckpt).restore_latest(None)
    if state is None:
        raise SystemExit(f"no orbax checkpoint under {args.ckpt}")
    params = state["params"] if "params" in state else state
    print(f"[val] probing {args.ckpt} (step {at_step})", flush=True)

    @jax.jit
    def encode(images):
        from vistracker_tpu.models.sifnet import pack_cache
        return pack_cache(net.apply(params, images, method=SIFNet.encode))

    gen = make_generator(sifnet_query_fn(net),
                         GeneratorConfig(funnel=FUNNEL_DEFAULT))

    B = args.batch
    T = len(frames)
    pred_vis = np.zeros(T, np.float32)
    pred_center = np.zeros((T, 3), np.float32)
    for s in range(0, T, B):
        e = min(T, s + B)
        pad = B - (e - s)
        img = np.stack([frames[i]["image"] for i in range(s, e)])
        cc = np.stack([frames[i]["crop_center"] for i in range(s, e)])
        bc = np.stack([frames[i]["body_center"] for i in range(s, e)])
        if pad:
            img = np.concatenate([img, np.repeat(img[-1:], pad, 0)])
            cc = np.concatenate([cc, np.repeat(cc[-1:], pad, 0)])
            bc = np.concatenate([bc, np.repeat(bc[-1:], pad, 0)])
        cache = encode(jnp.asarray(img))
        pc = gen(params, cache, jnp.asarray(cc), jnp.asarray(bc),
                 jax.random.PRNGKey(s))
        pred_vis[s:e] = np.asarray(pc["object"]["visibility"])[:e - s, 0]
        # neural centers are SMPL-body-center-relative (real_track packs
        # them raw; diagnose adds bc back) — express in camera frame
        pred_center[s:e] = (np.asarray(pc["object"]["centers"])
                            + bc)[:e - s]

    vis_corr = float(np.corrcoef(pred_vis, gt_occ)[0, 1])
    center_m = float(np.linalg.norm(pred_center - gt_center, axis=1).mean())
    rep = dict(ckpt=args.ckpt, step=int(at_step),
               val_motion_seed=args.val_motion_seed, frames=T,
               vis_corr=vis_corr, center_m=center_m)
    print(json.dumps(rep))
    if args.out_json:
        try:
            with open(args.out_json) as f:
                all_rep = json.load(f)
        except Exception:
            all_rep = {"note": ("sequence-level val probe (motion_seed 2, "
                                "disjoint from training seeds AND the "
                                "heldout eval seed 1): select the training "
                                "seed with the highest vis_corr — the "
                                "catastrophic draws are visibility-head "
                                "overfits that no same-sequence metric "
                                "catches (STATUS round 5)"),
                       "probes": []}
        all_rep["probes"] = [p for p in all_rep.get("probes", [])
                             if p.get("ckpt") != args.ckpt] + [rep]
        with open(args.out_json, "w") as f:
            json.dump(all_rep, f, indent=1)


if __name__ == "__main__":
    main()
