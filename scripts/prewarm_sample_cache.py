"""Prewarm run_fixture_eval's disk-backed SIF-Net sample-set pool.

The fixture trainer (scripts/run_fixture_eval.py:train_sifnet) builds its
POOL independent boundary-sample sets per frame lazily inside the loader;
on a 1-core host that serializes ~T*POOL CPU-heavy builds (each a full
boundary_sample over the SMPL+object meshes) against the training loop.
This script builds the SAME npz files (conventions imported from
run_fixture_eval: build_sample_set/sample_cache_dir) from a SEPARATE
pure-CPU process, in reverse slot order so it meets the trainer's forward
pass in the middle. Run it at nice 19 alongside training: it soaks up the
host cycles the trainer leaves idle while blocked on device RPC. CPU-only
JAX is enforced below — no launch-env discipline needed.

Collisions with the trainer are safe: writers use unique tmp names +
os.replace, and the trainer's _build re-samples on a corrupt read.

Numerical note: lbs_forward/smpl_center run on CPU JAX here but on the
TPU in the trainer, so a sample set built by this process can differ in
the last float bits from one the trainer would have built. Harmless as
training noise, but it means "keyed by the exact rng seed" determinism
holds per-process, not across who wins the build race.
"""
import argparse
import os
import os.path as osp
import sys

import numpy as np

# Force CPU-only JAX regardless of launch env: a plain invocation must
# never grab the TPU out from under the in-flight trainer this script is
# meant to assist (the axon sitecustomize registers the remote backend
# whenever PALLAS_AXON_* env is present).
os.environ["JAX_PLATFORMS"] = "cpu"
for _k in [k for k in os.environ
           if k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "PJRT_"))]:
    os.environ.pop(_k)
# The sitecustomize imports jax BEFORE this script's first line, so the env
# edits above don't reach the already-loaded config — force it live too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fixture_run",
                    help="run_fixture_eval --out dir (holds "
                         "fixture_meta.npz and the sample cache)")
    ap.add_argument("--sif-samples", type=int, default=2500)
    ap.add_argument("--grid-ratio", type=float, default=0.15)
    ap.add_argument("--pool", type=int, default=8)
    args = ap.parse_args()

    from vistracker_tpu.core.smpl import load_smpl_pkl, lbs_forward
    from vistracker_tpu.core.landmarks import (load_landmarks,
                                               load_part_labels,
                                               part_labels_array)
    from vistracker_tpu.data.behave import FrameDataReader
    from vistracker_tpu.data.images import crop_center_from_masks
    from vistracker_tpu.utils.mesh import load_ply
    from run_fixture_eval import build_sample_set, sample_cache_dir
    import jax.numpy as jnp

    # all training sequences, concatenated in run_fixture_eval's train-sif
    # order (fixture_meta.npz, then fixture_meta_s1.npz, ...) so the global
    # frame indices — and therefore the cache keys/seeds — match exactly
    metas = [osp.join(args.out, "fixture_meta.npz")]
    k = 1
    while osp.isfile(osp.join(args.out, f"fixture_meta_s{k}.npz")):
        metas.append(osp.join(args.out, f"fixture_meta_s{k}.npz"))
        k += 1
    frames = []
    part_labels = None
    # images are NOT cached in the slim npz (train_sifnet re-attaches them
    # from memory), so a 1x1 dummy satisfies sifnet_example's schema
    dummy_img = np.zeros((1, 1, 8), np.float32)
    for meta in metas:
        m = np.load(meta)
        fx = {k_: m[k_] for k_ in m.files}
        seq_dir = str(fx["seq_dir"])
        assets = osp.join(osp.dirname(seq_dir), "assets")
        model = load_smpl_pkl(str(fx["model_pkl"]))
        if part_labels is None:
            landmarks = load_landmarks(assets)
            part_labels = np.asarray(part_labels_array(
                load_part_labels(assets),
                num_verts=model.v_template.shape[0]))
        else:
            landmarks = load_landmarks(assets)

        verts, _, _, _ = lbs_forward(model, jnp.asarray(fx["poses"]),
                                     jnp.asarray(fx["betas"]),
                                     jnp.asarray(fx["trans"]))
        verts = np.asarray(verts)
        bc = np.asarray(landmarks.smpl_center(jnp.asarray(verts)))
        temp_v, temp_f = load_ply(osp.join(str(fx["objects_root"]),
                                           "boxmedium", "boxmedium.ply"))
        temp_v = temp_v - temp_v.mean(0)
        reader = FrameDataReader(seq_dir)
        smpl_faces = np.asarray(model.faces)
        for i in range(len(reader)):
            pm = reader.get_mask(i, 1, "person")
            om = reader.get_mask(i, 1, "obj")
            cc = crop_center_from_masks(pm, om)
            ov = temp_v @ fx["rot_gt"][i].T + fx["obj_trans_gt"][i]
            frames.append(dict(
                image=dummy_img, crop_center=np.asarray(cc),
                body_center=bc[i].astype(np.float32),
                smpl_verts=verts[i].astype(np.float32),
                smpl_faces=smpl_faces,
                obj_verts=ov.astype(np.float32), obj_faces=temp_f,
                visibility=float(fx["occ_ratios"][i])))
    T = len(frames)
    print(f"[prewarm] {T} frame dicts ready ({len(metas)} sequence(s))",
          flush=True)

    # conventions imported from run_fixture_eval so they cannot drift
    cache_dir = sample_cache_dir(args.out, args.sif_samples,
                                 args.grid_ratio)
    os.makedirs(cache_dir, exist_ok=True)
    built = skipped = 0
    for slot in range(args.pool - 1, -1, -1):
        for i in range(T - 1, -1, -1):
            if osp.exists(osp.join(cache_dir, f"f{i:04d}_p{slot}.npz")):
                skipped += 1
                continue
            build_sample_set(frames, part_labels, i, slot,
                             args.sif_samples, args.grid_ratio, cache_dir)
            built += 1
            if built % 25 == 0:
                print(f"[prewarm] built {built} skipped {skipped}",
                      flush=True)
    print(f"[prewarm] done: built {built} skipped {skipped}", flush=True)


if __name__ == "__main__":
    main()
