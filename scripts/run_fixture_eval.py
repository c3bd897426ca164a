"""End-to-end accuracy evidence on the high-fidelity BEHAVE fixture.

Generates a rendered BEHAVE-layout sequence (full Kinect pixel geometry,
capsule-humanoid SMPL-H, occluding object orbit — data/fixture.py), trains
all three model families on it (SIF-Net overfit on the sequence frames,
SmoothNet-SMPL/objrot denoisers, HVOP-Net at the release clip config),
tracks the sequence with the REAL pipeline (cli/real_track.py, full-budget
optimizers, full-sequence temporal stages), evaluates against the GT pack
with the windowed evaluator (W=1 CHORE protocol and whole-sequence align),
and writes the metrics JSON.

With --train-seqs 1 (default) this is pipeline-accuracy evidence, not
generalization evidence: the nets are trained on the same sequence they
track (the fixture replaces the licensed BEHAVE data + released
checkpoints, which cannot ship here).  With --train-seqs N>1 the nets
train on a POOL of N motion-varied sequences (motion seeds 0, 101, ...)
and the --heldout phases then measure generalization from a multi-sequence
corpus — the fixture analog of the reference's multi-sequence split
training (data_paths.py:53-64).

Usage: python scripts/run_fixture_eval.py --out fixture_run [--frames 90]
       [--train-seqs 4] [--net-preset release] [--heldout]
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def log(msg):
    print(f"[fixture {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_training_frames(fx, model, landmarks, crop_size, net_size):
    """Per-frame SIF-Net training dicts from the fixture GT."""
    import jax.numpy as jnp
    from vistracker_tpu.data.behave import FrameDataReader
    from vistracker_tpu.data.images import prepare_input_crop
    from vistracker_tpu.ops.rasterizer import render_triplane_masks
    from vistracker_tpu.core.smpl import lbs_forward

    reader = FrameDataReader(fx["seq_dir"])
    T = len(reader)
    verts, _, _, _ = lbs_forward(model, jnp.asarray(fx["poses"]),
                                 jnp.asarray(fx["betas"]),
                                 jnp.asarray(fx["trans"]))
    verts = np.asarray(verts)
    bc = np.asarray(landmarks.smpl_center(jnp.asarray(verts)))
    smpl_faces = jnp.asarray(model.faces)
    from vistracker_tpu.utils.mesh import load_ply
    temp_v, temp_f = load_ply(osp.join(fx["objects_root"], "boxmedium",
                                       "boxmedium.ply"))
    temp_v = temp_v - temp_v.mean(0)
    frames = []
    for i in range(T):
        rgb = reader.get_color(i, 1)
        pm = reader.get_mask(i, 1, "person")
        om = reader.get_mask(i, 1, "obj")
        img5, cc = prepare_input_crop(rgb, pm, om, crop_size, net_size)
        tri = np.asarray(render_triplane_masks(
            jnp.asarray(verts[i]), smpl_faces, jnp.asarray(bc[i]), net_size))
        ov = temp_v @ fx["rot_gt"][i].T + fx["obj_trans_gt"][i]
        frames.append(dict(
            image=np.concatenate([img5, tri], -1).astype(np.float32),
            crop_center=cc.astype(np.float32),
            body_center=bc[i].astype(np.float32),
            smpl_verts=verts[i].astype(np.float32),
            smpl_faces=np.asarray(model.faces),
            obj_verts=ov.astype(np.float32),
            obj_faces=temp_f,
            visibility=float(fx["occ_ratios"][i])))
    return frames, temp_v, temp_f


# --- SIF-Net sample-pool cache conventions -------------------------------
# ONE definition shared with scripts/prewarm_sample_cache.py (which builds
# the same files from a separate pure-CPU process) so the dir format, file
# naming, seed formula, and slim-npz schema cannot drift between the two.
SAMPLE_POOL = 8
_SAMPLE_IM_KEYS = ("images",)  # never cached; re-attached from memory


def sample_cache_dir(out_root, samples, grid_ratio):
    return osp.join(out_root, f"sample_cache_s{samples}_g{grid_ratio:g}")


def build_sample_set(frames, part_labels, i, slot, samples, grid_ratio,
                     cache_dir):
    """Load (or build + atomically persist) one slim cached sample set."""
    from vistracker_tpu.data.datasets import sifnet_example
    path = osp.join(cache_dir, f"f{i:04d}_p{slot}.npz")
    if osp.exists(path):
        try:
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        except Exception:
            pass  # partial write from a killed process: rebuild
    built = sifnet_example(
        frames[i], part_labels, num_samples=samples, grid_ratio=grid_ratio,
        rng=np.random.RandomState(i * 7919 + 13 + slot))
    slim = {k: v for k, v in built.items() if k not in _SAMPLE_IM_KEYS}
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    np.savez(tmp, **slim)
    os.replace(tmp, path)
    return slim


def train_sifnet(frames, part_labels, out_dir, crop_size, net_size,
                 epochs, samples, lr=1e-3, grid_ratio=0.01, preset="tiny",
                 seed=0):
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.models.sifnet import SIFNet, sifnet_preset
    from vistracker_tpu.core.camera import PerspectiveCamera
    from vistracker_tpu.data.datasets import PrefetchLoader
    from vistracker_tpu.fit.train import (TrainConfig, init_train_state,
                                          make_train_step)
    from vistracker_tpu.fit.trainer_loop import LoopConfig, train_loop

    # EXACTLY the --net-preset config real_track builds, so the orbax
    # checkpoint loads into the tracking model unchanged
    cfg = sifnet_preset(preset, crop_size=crop_size, remat=True)
    model = SIFNet(cfg, PerspectiveCamera(crop_size=crop_size))

    import collections
    import threading
    calls = collections.defaultdict(int)
    calls_lock = threading.Lock()
    # POOL independent sample sets per frame, built lazily and cycled
    # across epochs: keeps the epoch-diverse sampling that carves out
    # empty space (the round-2 fix — one fixed set let the overfit net
    # keep spurious low-df pockets) without paying the CPU-heavy boundary
    # sampling on every call (fresh-per-epoch sampling on one host core
    # starves the TPU: measured ~10 steps/min loader-bound vs ~23 steps
    # in ~30 s pooled).
    POOL = SAMPLE_POOL
    memo = {}
    # Disk-backed pool: a process restart (platform hangs are a known
    # axon-terminal failure mode) must not re-pay the CPU boundary
    # sampling for the whole pool — on the current 1-core host that is
    # ~720 sets x 1-2 s serialized. Sample sets are tiny (the per-frame
    # 8 MB image is NOT cached; it is re-attached from `frames`), keyed
    # by the exact rng seed + sampling params so any change invalidates.
    # Conventions live in build_sample_set/sample_cache_dir, shared with
    # scripts/prewarm_sample_cache.py.
    cache_dir = sample_cache_dir(osp.dirname(out_dir), samples, grid_ratio)
    os.makedirs(cache_dir, exist_ok=True)

    def _build(i, slot):
        return build_sample_set(frames, part_labels, i, slot, samples,
                                grid_ratio, cache_dir)

    def example(i):
        # a raised grid_ratio floods empty space with uniform points so
        # the tiny overfit net cannot keep spurious low-df pockets
        with calls_lock:
            c = calls[i]
            calls[i] += 1
        key = (i, c % POOL)
        if key not in memo:
            slim = _build(i, key[1])
            with calls_lock:
                memo.setdefault(key, slim)
        out = dict(memo[key])
        # images stay DEVICE-RESIDENT (table below); the batch ships only
        # the frame index. On the tunneled 1-core host the 32 MB/batch
        # image H2D was the steady-state bottleneck: 0.38 -> 1.90 st/s.
        out["frame_idx"] = np.int32(i)
        return out

    def val_example(i):
        # fixed slot 0 and NO `calls` bump: the val pass must not perturb
        # the train slot cycling (sharing the train example fn made which-
        # slot-trains-when depend on how many batches the bounded val
        # iteration happened to materialize — nondeterministic across
        # runs, so retrained checkpoints differed run to run)
        key = (i, 0)
        if key not in memo:
            slim = _build(i, 0)
            with calls_lock:
                memo.setdefault(key, slim)
        out = dict(memo[key])
        out["frame_idx"] = np.int32(i)
        return out

    # size the worker pool to the host: on the degraded 1-core terminal
    # 10 workers just thrash the scheduler (89% sys time observed); with
    # the disk-backed pool the per-item cost is a cache hit anyway
    n_workers = min(10, 2 * (os.cpu_count() or 1))
    loader = PrefetchLoader(example, len(frames), batch_size=4,
                            num_workers=n_workers, seed=seed)
    val_loader = PrefetchLoader(val_example, len(frames), batch_size=4,
                                num_workers=n_workers)
    # df clamp: the release value (clamp_thres 0.1, torch.clamp semantics =
    # zero gradient above the clamp) is a TRAP at this overfit scale — the
    # x1000-weighted center/vis losses shift the shared features until
    # every df output sits above 0.1 and the df gradient dies permanently
    # (observed: loss_df_* flat, min pred 0.12 > clamp). A 1.0 clamp keeps
    # the gradient alive; loss-math parity with the reference is pinned by
    # the unit tests, the fixture only needs a usable field.
    tcfg = TrainConfig(learning_rate=lr, max_dist=1.0)
    to_dev = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
    # one-time H2D of the whole frame stack (90 x 256^2 x 8ch ~ 190 MB);
    # every step then gathers its batch's images on-device from indices
    images_all = jnp.asarray(np.stack([f["image"] for f in frames])
                             .astype(np.float32))
    # init batch built DIRECTLY from val_example (which never bumps
    # `calls`): drawing it from the train loader spawned a timing-
    # dependent number of prefetch producers before the iterator was
    # abandoned, each bumping calls[i] and shifting that frame's
    # sample-pool slot — first-epoch sample assignment (and hence the
    # trained checkpoint) varied run to run
    _ex0 = [val_example(i) for i in range(4)]
    b0 = to_dev({k: np.stack([e[k] for e in _ex0], 0) for k in _ex0[0]})
    state = init_train_state(
        model, jax.random.PRNGKey(seed),
        dict(b0, images=images_all[b0["frame_idx"]]), tcfg)
    inner = make_train_step(model, tcfg)

    @jax.jit
    def step_gather(state, batch, images):
        # images passed as an ARGUMENT, not closed over: closed-over
        # device arrays become embedded compile-payload constants and the
        # axon tunnel rejects large payloads (PERF_NOTES round 1)
        b = dict(batch)
        b["images"] = images[b.pop("frame_idx")]
        return inner(state, b)

    step = lambda state, batch: step_gather(state, batch, images_all)
    # tiny 22-step epochs: per-epoch orbax save + val costs ~25 s on the
    # 1-core host — checkpoint every 10 epochs instead (still bounded
    # restart loss; platform hangs are a known failure mode)
    lcfg = LoopConfig(num_epochs=epochs, out_dir=out_dir, ck_period_min=1e9,
                      max_val_batches=4, epoch_ck_period=10)

    def val_fn(state, batch):
        _, loss, _ = step(state, batch)
        return loss

    state = train_loop(state, step, loader, val_loader=val_loader,
                       val_loss_fn=val_fn, cfg=lcfg, to_device=to_dev)
    return out_dir


def train_smoothnets(fxs, out_smpl, out_rot, epochs=40, noise=0.03):
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.core.rotations import axis_angle_to_rot6d, \
        rotmat_to_rot6d
    from vistracker_tpu.data.datasets import PrefetchLoader
    from vistracker_tpu.fit.trainer_loop import (LoopConfig, train_loop,
                                                 make_smoothnet_train_step)
    from vistracker_tpu.fit.smoothing import smplh_to_smpl_pose
    from vistracker_tpu.models.smoothnet import SmoothNet, SmoothNetSMPL
    from vistracker_tpu.ops.window_ops import seq_to_windows, pad_to_window

    W = 64
    rng = np.random.RandomState(0)
    feats_list, rot6d_obj_list = [], []
    for fx in fxs:  # windows never cross sequence boundaries
        T = len(fx["poses"])
        p72 = smplh_to_smpl_pose(fx["poses"])
        rot6d = np.asarray(axis_angle_to_rot6d(
            jnp.asarray(p72.reshape(-1, 3)))).reshape(T, 144)
        feats_list.append(np.concatenate(
            [rot6d, fx["betas"], fx["trans"]], 1).astype(np.float32))
        rot6d_obj_list.append(np.asarray(rotmat_to_rot6d(
            jnp.asarray(fx["rot_gt"]))).astype(np.float32))

    def windows(seqs):
        ws = []
        for s in seqs:
            padded, _ = pad_to_window(s, W)
            w = np.asarray(seq_to_windows(jnp.asarray(padded), W, 1))
            ws.append(w.transpose(0, 2, 1))  # (N, C, W)
        return np.concatenate(ws, 0)

    for gt_seqs, model, out_dir, nz in (
            (feats_list, SmoothNetSMPL(window_size=W, output_size=W),
             out_smpl, noise),
            (rot6d_obj_list, SmoothNet(window_size=W, output_size=W),
             out_rot, noise)):
        gt_w = windows(gt_seqs)
        noisy = gt_w + rng.randn(*gt_w.shape).astype(np.float32) * nz

        def example(i, noisy=noisy, gt_w=gt_w):
            return dict(noisy=noisy[i], gt=gt_w[i])

        loader = PrefetchLoader(example, len(gt_w), batch_size=8,
                                num_workers=2)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1,) + gt_w.shape[1:]))
        init_state, step_fn, val_fn = make_smoothnet_train_step(model, 1e-3)
        state = init_state(params)
        lcfg = LoopConfig(num_epochs=epochs, out_dir=out_dir,
                          ck_period_min=1e9, max_val_batches=2)
        to_dev = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
        train_loop(state, step_fn, loader, val_loader=loader,
                   val_loss_fn=val_fn, cfg=lcfg, to_device=to_dev)
    return out_smpl, out_rot


def train_infiller(fxs, out_dir, epochs=60):
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.data.datasets import PrefetchLoader, InfillerClips
    from vistracker_tpu.fit.trainer_loop import (LoopConfig, train_loop,
                                                 make_infiller_train_step)
    from vistracker_tpu.models.infiller import (ConditionalMInfiller,
                                                InfillerConfig)
    # release config (clip 180, window 30) — the one real_track builds
    cfg = InfillerConfig()
    seqs = []
    for fx in fxs:
        reps = int(np.ceil((cfg.clip_len + 40) / len(fx["poses"])))
        seqs.append(dict(
            poses=np.tile(fx["poses"], (reps, 1)),
            trans=np.tile(fx["trans"], (reps, 1)),
            obj_rot_real=np.tile(fx["rot_gt"], (reps, 1, 1))))
    clips = InfillerClips(seqs, clip_len=cfg.clip_len)
    model = ConditionalMInfiller(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.clip_len, 147)),
                        jnp.zeros((1, cfg.clip_len), bool),
                        jnp.zeros((1, cfg.clip_len, 6)),
                        jnp.zeros((1, cfg.clip_len), bool))
    init_state, step_fn, val_fn = make_infiller_train_step(model, 1e-3)
    state = init_state(params)
    loader = PrefetchLoader(clips.example, len(clips), batch_size=8,
                            num_workers=2)
    lcfg = LoopConfig(num_epochs=epochs, out_dir=out_dir, ck_period_min=1e9,
                      max_val_batches=2)
    to_dev = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
    train_loop(state, step_fn, loader, val_loader=loader,
               val_loss_fn=val_fn, cfg=lcfg, to_device=to_dev)
    return out_dir


def _load_fx(args, heldout=False, k=0):
    """Load (or generate) the k-th training fixture (or the held-out one)
    and the shared assets.

    heldout=True generates/loads a held-out sequence with different motion
    (same humanoid/assets/template — data/fixture.py motion_seed) used to
    evaluate generalization of the nets trained on the training pool.
    Training sequences k=0..train_seqs-1 use motion seeds 0, 101, 102, ...
    (all distinct from the held-out seed); their humanoid model, assets and
    object template are byte-identical, only the motion differs.
    """
    from vistracker_tpu.data.fixture import generate_fixture_sequence
    if heldout:
        sub, meta, seed = "data_heldout", "fixture2_meta.npz", \
            args.heldout_motion_seed
    else:
        sub = "data" if k == 0 else f"data_s{k}"
        meta = "fixture_meta.npz" if k == 0 else f"fixture_meta_s{k}.npz"
        seed = 0 if k == 0 else 100 + k
    data_dir = osp.join(args.out, sub)
    meta_path = osp.join(args.out, meta)
    real_assets = ("/root/reference/assets"
                   if osp.isdir("/root/reference/assets") else None)
    if osp.isfile(meta_path):
        m = np.load(meta_path)
        fx = {k_: m[k_] for k_ in m.files}
        fx.update(seq_dir=str(fx["seq_dir"]), gt_pack=str(fx["gt_pack"]),
                  model_pkl=str(fx["model_pkl"]),
                  objects_root=str(fx["objects_root"]),
                  seq_name=str(fx["seq_name"]))
    else:
        log(f"generating {'held-out ' if heldout else f'train-{k} '}fixture "
            f"({args.frames} frames, motion_seed {seed})...")
        fx = generate_fixture_sequence(
            data_dir, T=args.frames, raster=args.raster,
            real_assets=real_assets, motion_seed=seed,
            object_shape=args.object_shape)
        np.savez(meta_path, **fx)
    return fx, osp.join(data_dir, "assets")


def load_train_fixtures(args):
    """All training fixtures (list of fx dicts) + the seq-0 assets dir."""
    fxs = []
    assets = None
    for k in range(getattr(args, "train_seqs", 1)):
        fx, a = _load_fx(args, k=k)
        fxs.append(fx)
        if k == 0:
            assets = a
    return fxs, assets


def _done(path):
    return osp.isfile(osp.join(path, "DONE"))


def _mark_done(path):
    with open(osp.join(path, "DONE"), "w") as f:
        f.write("ok\n")


def run_phase(args):
    """One phase in this process. Phases run in SEPARATE subprocesses:
    the axon TPU worker accumulates state across big compiled programs and
    crashes when one process compiles too many (PERF_NOTES round 2; the
    single-process version of this script died in stage 6 after training
    all three model families)."""
    from vistracker_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # phases are fresh subprocesses re-running the
    # same jit programs (and box/lbox runs share them entirely)
    from vistracker_tpu.core.smpl import load_smpl_pkl
    from vistracker_tpu.core.landmarks import (load_landmarks,
                                               load_part_labels,
                                               part_labels_array)
    phase = args.phase
    heldout = phase.startswith("heldout")
    if heldout:
        fx, assets = _load_fx(args, heldout=True)
        fxs = [fx]
    else:
        fxs, assets = load_train_fixtures(args)
        fx = fxs[0]
    if phase in ("generate", "heldout-gen"):
        return  # _load_fx did the work

    model = load_smpl_pkl(fx["model_pkl"])
    # sifnet checkpoint / recon / results paths carry the net preset so
    # differently-sized runs coexist under one --out
    psuf = "" if args.net_preset == "tiny" else f"_{args.net_preset}"
    # recon/results dirs optionally carry an extra tag (e.g. the B-ladder's
    # chunk-size variants) while the checkpoint dirs stay shared
    rsuf = psuf + (f"_{args.recon_tag}" if args.recon_tag else "")
    if phase == "train-sif":
        out = osp.join(args.out, "sifnet" + psuf)
        if _done(out):
            return log("train-sif already done")
        landmarks = load_landmarks(assets)
        part_labels = np.asarray(part_labels_array(
            load_part_labels(assets), num_verts=model.v_template.shape[0]))
        log(f"building SIF-Net training frames ({len(fxs)} sequence(s))...")
        frames = []
        for f in fxs:  # concatenated: sample-cache indices stay global
            fr, _, _ = build_training_frames(f, model, landmarks,
                                             args.crop_size, args.net_size)
            frames.extend(fr)
        log(f"training SIF-Net (preset {args.net_preset}, "
            f"{len(frames)} frames from {len(fxs)} sequence(s))...")
        train_sifnet(frames, part_labels, out, args.crop_size,
                     args.net_size, args.sif_epochs, args.sif_samples,
                     grid_ratio=args.grid_ratio, preset=args.net_preset,
                     seed=getattr(args, "train_seed", 0))
        return _mark_done(out)
    if phase == "train-sn":
        out_s, out_r = osp.join(args.out, "sn_smpl"), osp.join(args.out,
                                                               "sn_rot")
        if _done(out_s) and _done(out_r):
            return log("train-sn already done")
        log("training SmoothNets...")
        train_smoothnets(fxs, out_s, out_r)
        _mark_done(out_s)
        return _mark_done(out_r)
    if phase == "train-inf":
        out = osp.join(args.out, "infiller")
        if _done(out):
            return log("train-inf already done")
        log("training HVOP-Net...")
        train_infiller(fxs, out)
        return _mark_done(out)
    if phase in ("track", "heldout-track"):
        log("tracking with the real pipeline"
            + (" (held-out motion, seq-1 checkpoints)..." if heldout
               else "..."))
        from vistracker_tpu.cli.main import build_parser
        from vistracker_tpu.cli.real_track import run_real_track
        targs = build_parser().parse_args([
            "track", "--seq", fx["seq_dir"], "--out",
            # rsuf (not psuf): --recon-tag variants (B-ladder chunk sizes,
            # --collision) must land in their own recon dir or is_done
            # resume on the untagged dir silently skips the re-track
            osp.join(args.out,
                     ("recon_heldout" if heldout else "recon") + rsuf),
            "--smpl-model", fx["model_pkl"], "--assets", assets,
            "--objects-root", fx["objects_root"],
            "--sifnet-ckpt", osp.join(args.out, "sifnet" + psuf),
            "--infiller-ckpt", osp.join(args.out, "infiller"),
            "--smoothnet-smpl-ckpt", osp.join(args.out, "sn_smpl"),
            "--smoothnet-objrot-ckpt", osp.join(args.out, "sn_rot"),
            "--net-preset", args.net_preset,
            "--chunk-size", str(args.chunk_size),
            "--net-size", str(args.net_size),
            # bounded device programs: the tunnel kills multi-minute
            # single executions (full-budget stage-6 phases exceed that)
            "--segment-iters", "5",
            # median center/pca aggregation: robust to the tiny net's
            # residual spurious-low-df pockets (see --grid-ratio note)
            "--robust-centers",
            "--crop-size", str(args.crop_size), "--save-name", "fixture"]
            + (["--collision"] if args.collision else [])
            + (["--sil-backend", getattr(args, "sil_backend", "auto")]
               if getattr(args, "sil_backend", "auto") != "auto" else [])
            # explicit either way: the track CLI defaults --fast-gen ON
            # (round-5 A/B: metric-neutral), but the runner's recorded
            # results were produced with funnel-off baselines, so it pins
            # its own semantics instead of inheriting the CLI default
            + (["--fast-gen"] if getattr(args, "fast_gen", False)
               else ["--no-fast-gen"])
            + (["--ocent", str(getattr(args, "ocent", 0.0))]
               if getattr(args, "ocent", 0.0) else []))
        run_real_track(targs)  # is_done resume: skips if the pack exists
        return
    if phase in ("eval", "heldout-eval"):
        log("evaluating vs GT...")
        from vistracker_tpu.cli.main import _eval_one
        from vistracker_tpu.eval.evaluator import format_errors
        from vistracker_tpu.utils.mesh import load_ply
        recon_pkl = osp.join(
            args.out, ("recon_heldout" if heldout else "recon") + rsuf,
            "recon_fixture", f"{fx['seq_name']}_k1.pkl")
        temp_v, temp_f = load_ply(osp.join(fx["objects_root"], "boxmedium",
                                           "boxmedium.ply"))
        temp_v = temp_v - temp_v.mean(0)
        if heldout:
            note = ("HELD-OUT motion sequence (motion_seed="
                    f"{args.heldout_motion_seed}): tracked with nets "
                    "trained only on the default fixture sequence — "
                    "generalization evidence across body sway / object "
                    "orbit / occlusion phases")
        else:
            note = ("high-fidelity fixture (capsule-humanoid SMPL-H, "
                    "rendered masks/keypoints at Kinect geometry); "
                    "nets self-trained on the same sequence — "
                    "pipeline accuracy evidence, not generalization")
        report = {"frames": int(args.frames),
                  "net_preset": args.net_preset,
                  "train_seqs": int(getattr(args, "train_seqs", 1)),
                  "note": note}
        for wname, w in (("W1_chore_protocol", 1),
                         ("W300_video_protocol", 300)):
            errs = _eval_one(model, recon_pkl, fx["gt_pack"], temp_v,
                             temp_f, window=w, smpl_only=False)
            report[wname] = format_errors(errs)
        results = args.heldout_results if heldout else args.results
        os.makedirs(osp.dirname(results) or ".", exist_ok=True)
        with open(results, "w") as f:
            json.dump(report, f, indent=2)
        log(f"wrote {results}")
        print(json.dumps(
            {k: v for k, v in report["W1_chore_protocol"].items()
             if k in ("smpl_v2v", "obj_v2v")}, indent=1))
        return
    raise SystemExit(f"unknown phase {phase}")


PHASES = ("generate", "train-sif", "train-sn", "train-inf", "track", "eval")
HELDOUT_PHASES = ("heldout-gen", "heldout-track", "heldout-eval")


def build_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fixture_run")
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--raster", type=int, default=512)
    ap.add_argument("--net-size", type=int, default=256)
    ap.add_argument("--crop-size", type=int, default=1200)
    ap.add_argument("--chunk-size", type=int, default=30)
    ap.add_argument("--recon-tag", default="",
                    help="extra suffix for the recon/results paths (keeps "
                         "checkpoints shared across e.g. chunk-size "
                         "variants)")
    ap.add_argument("--train-seqs", type=int, default=1,
                    help="number of training sequences (motion seeds 0, "
                         "101, 102, ...); nets train on the pool — the "
                         "held-out eval then measures generalization "
                         "from a multi-sequence corpus")
    ap.add_argument("--sif-epochs", type=int, default=60)
    ap.add_argument("--train-seed", type=int, default=0,
                    help="SIF-Net init + loader shuffle seed (training is "
                         "bit-deterministic per seed; vary for a "
                         "run-to-run variance bar)")
    ap.add_argument("--sif-samples", type=int, default=2500)
    ap.add_argument("--grid-ratio", type=float, default=0.15,
                    help="uniform far-field sample fraction during SIF-Net "
                         "training (reference 0.01; the overfit-scale "
                         "fixture needs dense empty-space coverage)")
    ap.add_argument("--results", default=None,
                    help="output JSON (default results/fixture_eval"
                         "[_PRESET].json)")
    ap.add_argument("--net-preset", choices=("tiny", "small", "release"),
                    default="tiny",
                    help="SIF-Net size preset for training AND tracking "
                         "(models/sifnet.py:sifnet_preset); non-tiny runs "
                         "suffix the sifnet/recon/results paths")
    ap.add_argument("--heldout", action="store_true",
                    help="run ONLY the held-out generalization phases "
                         "(generate a second motion sequence, track it "
                         "with the seq-1 checkpoints, evaluate)")
    ap.add_argument("--heldout-motion-seed", type=int, default=1)
    ap.add_argument("--object-shape", choices=("box", "lbox"),
                    default="box",
                    help="fixture object template: 'box' (has exact "
                         "180-deg rotational self-symmetries — an "
                         "irreducible rotation-ambiguity floor) or "
                         "'lbox' (asymmetric corner-flanged box, pose "
                         "fully observable). Use a fresh --out per shape")
    ap.add_argument("--heldout-results", default=None)
    ap.add_argument("--collision", action="store_true",
                    help="enable the stage-6 SDF collision term in the "
                         "track phases (pair with --recon-tag coll)")
    ap.add_argument("--sil-backend", default="auto",
                    choices=("auto", "pallas", "xla"),
                    help="forwarded to the track phases (stage-6 soft-"
                         "silhouette implementation A/B)")
    ap.add_argument("--fast-gen", action="store_true",
                    help="forward track --fast-gen (stage-4 funnel "
                         "harvest) to the track phases")
    ap.add_argument("--ocent", type=float, default=0.0,
                    help="stage-6 object-center anchor weight (see "
                         "real_track --ocent; pair with --recon-tag)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--phase", choices=PHASES + HELDOUT_PHASES, default=None)
    ap.add_argument("--single-process", action="store_true",
                    help="run all phases in this process (CPU/tests)")
    return ap


def main():
    args = build_parser().parse_args()
    rsuf = "" if args.net_preset == "tiny" else f"_{args.net_preset}"
    if args.results is None:
        args.results = f"results/fixture_eval{rsuf}.json"
    if args.heldout_results is None:
        args.heldout_results = f"results/fixture_eval_heldout{rsuf}.json"
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    phases = HELDOUT_PHASES if args.heldout else PHASES
    if args.phase:
        return run_phase(args)
    if args.single_process:
        for ph in phases:
            args.phase = ph
            run_phase(args)
        return
    import subprocess
    base = [sys.executable, osp.abspath(__file__)]
    # forward EVERY parser option to the phase subprocesses, derived from
    # the parser itself. A hand-maintained forward list silently dropped
    # newly added flags twice (round-3: --ocent broke the runner test;
    # round-4: --sil-backend never reached the track phase, voiding a
    # kernel A/B run — the "different backend" produced a bitwise-
    # identical recon pack).
    fwd = forwarded_args(args)
    for ph in phases:
        log(f"=== phase {ph} (subprocess) ===")
        rc = subprocess.run(base + fwd + ["--phase", ph]).returncode
        if rc != 0:
            raise SystemExit(f"phase {ph} failed rc={rc}")


def forwarded_args(args):
    """CLI tokens reproducing `args` for a phase subprocess, derived from
    build_parser() so new options can never be silently dropped."""
    import argparse
    fwd = []
    for act in build_parser()._actions:
        if not act.option_strings or act.dest in ("help", "phase",
                                                  "single_process"):
            continue
        val = getattr(args, act.dest)
        if isinstance(act, argparse._StoreTrueAction):
            if val:
                fwd.append(act.option_strings[0])
        elif val is None:
            continue
        else:
            fwd += [act.option_strings[0], str(val)]
    return fwd


if __name__ == "__main__":
    main()
