"""MFU / roofline accounting for the three hot programs (VERDICT r2 #7).

Programs (release shapes, mirroring bench.py's construction):
  * encode     SIF-Net image encoder + cache packing, bs 8, 512px
  * smpl       one Adam step of the stage-6 SMPL pose+kpts phase (B frames,
               all 6890 verts queried)
  * object     one Adam step of each stage-6 object phase (object / sil /
               joint) at B frames, 3000 template points

Method: fit/joint.py's phase steppers expose `cost_probe` hooks that
compile the LOOP-FREE one-Adam-step program (XLA's HLO cost analysis
counts while/scan bodies once, so lowering the scan'd program would
undercount; the unrolled single step is exact). For each program we take
cost_analysis() FLOPs + bytes accessed, measure wall time (synchronous
fetch, RPC floor subtracted), and compare against the chip's peak FLOP/s
and HBM bandwidth:

  t_sol    = max(flops / peak_flops, bytes / peak_bw)   (speed of light)
  mfu      = flops / t_meas / peak_flops
  bw_util  = bytes / t_meas / peak_bw
  binding resource = whichever of the two dominates t_sol

Caveats: cost_analysis 'bytes accessed' is XLA's pre-fusion estimate (it
can overcount fused producers), and matmuls run at bf16 inputs by default
(jax_default_matmul_precision) — peak table uses bf16 MXU numbers.

Writes results/roofline.json and prints a table.  Runs on the real TPU.
Usage: python scripts/roofline.py [--batch 8]
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# (bf16 MXU FLOP/s, HBM bytes/s) per chip generation
PEAKS = {
    "v4": (275e12, 1228e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v6e": (918e12, 1640e9),
}


def log(msg):
    print(f"[roofline {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="stage-6 frame-chunk size (bench default)")
    ap.add_argument("--results", default="results/roofline.json")
    ap.add_argument("--gen", default=None,
                    help="chip generation override (default: "
                         "PALLAS_AXON_TPU_GEN or v5e)")
    args = ap.parse_args()
    gen = args.gen or os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak_flops, peak_bw = PEAKS.get(gen, PEAKS["v5e"])

    import jax
    import jax.numpy as jnp
    from vistracker_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import functools
    from bench import _fetch, _measure_floor
    from vistracker_tpu.models.sifnet import SIFNet, SIFNetConfig, pack_cache
    from vistracker_tpu.core.camera import PerspectiveCamera
    from vistracker_tpu.core import smpl as S
    from vistracker_tpu.core.smpl import lbs_forward
    from vistracker_tpu.core.landmarks import BodyLandmarks
    from vistracker_tpu.core.priors import MahalanobisPrior, HandPrior
    from vistracker_tpu.fit.smplt import SMPLTParams
    from vistracker_tpu.fit.joint import (JointFitConfig, make_smpl_optimizer,
                                          make_object_optimizer)
    from vistracker_tpu.data.silprep import prepare_sil_refs

    floor_s = _measure_floor(jnp, jax)
    log(f"gen={gen} peak={peak_flops/1e12:.0f} TFLOP/s "
        f"{peak_bw/1e9:.0f} GB/s, rpc floor {floor_s*1e3:.1f} ms")

    rng = np.random.RandomState(0)
    cam = PerspectiveCamera(crop_size=1200)
    cfg = SIFNetConfig()
    model = SIFNet(cfg, cam)
    H, B, V = 512, args.batch, 6890

    images = jnp.asarray(rng.rand(B, H, H, 8).astype(np.float32))
    cc = jnp.tile(jnp.asarray([[1018.0, 779.0]]), (B, 1))
    bc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.2]]), (B, 1))
    pts0 = jnp.asarray((rng.randn(B, 16, 3) * 0.4
                        + np.array([0, 0, 2.2])).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images[:1], pts0[:1],
                        cc[:1], bc[:1])

    hg_bytes = 4 * B * (H // 4) ** 2 * 4 * (
        cfg.hourglass_dim + 3 * cfg.triplane_hg_dim)
    tmpx_bytes = 4 * B * (H // 2) ** 2 * 4 * (
        cfg.tmpx_dim + 3 * cfg.triplane_tmpx_dim)
    pack_tmpx, pack_hg = tmpx_bytes < 2e9, hg_bytes < 2e9

    def encode_fn(params, images):
        return pack_cache(model.apply(params, images, method=SIFNet.encode),
                          pack_tmpx=pack_tmpx, pack_hg=pack_hg)

    def encode_timed(params, images):
        # Reduce the ~0.5 GB cache to a scalar ON DEVICE: fetching a cache
        # leaf would time the ~30 MB/s tunnel transfer, not the encoder
        # (block_until_ready does not wait for remote execution here, so
        # every timed region must end in a small host fetch). The tree-sum
        # adds ~1 GB of the ~100 GB counted bytes — negligible.
        c = encode_fn(params, images)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(c))

    programs = {}  # name -> (compiled, args, steps_per_budget)
    log("compiling encode...")
    enc_t = jax.jit(encode_timed).lower(params, images).compile()
    programs["encode"] = (enc_t, (params, images), 1)

    cache = jax.jit(encode_fn)(params, images)
    ctx = dict(params=params, cache=cache, cc=cc, bc=bc)

    smpl_model = S.random_smpl_model(1, num_joints=52, num_verts=V)
    reg = rng.rand(25, V).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    lms = BodyLandmarks(body25=jnp.asarray(reg), face=jnp.asarray(reg[:1]),
                        hand=jnp.asarray(reg[:1]))
    bp = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hp = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                   rhand_prec=jnp.eye(45) * 0.1)
    part_labels = jnp.asarray(rng.randint(0, 14, V).astype(np.int32))
    jcfg = JointFitConfig()

    def query_smpl_step(ctx, points):
        return model.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                           ctx["bc"], method=SIFNet.query_heads,
                           heads=("df", "parts"))

    def query_df_step(ctx, points):
        return model.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                           ctx["bc"], method=SIFNet.query_heads,
                           heads=("df",))

    def query_fn(ctx, points):
        return model.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                           ctx["bc"], method=SIFNet.query)[-1]

    def project_norm(ctx, joints):
        return cam.project_points(joints, ctx["cc"])[..., :2]

    def project_px(ctx, points):
        return cam.project_screen(points)

    opt_smpl = make_smpl_optimizer(query_smpl_step, project_norm, smpl_model,
                                   lms, bp, hp, part_labels, jcfg,
                                   segment_iters=8)
    opt_obj = make_object_optimizer(query_df_step, project_px, jcfg,
                                    segment_iters=8,
                                    contact_query_fn=query_fn)

    init = SMPLTParams.from_full(
        jnp.asarray(rng.randn(B, 156).astype(np.float32) * 0.05),
        jnp.zeros((B, 10)),
        jnp.asarray(np.tile([[0.0, 0.0, 2.2]], (B, 1)).astype(np.float32)))
    kpts = jnp.asarray(np.concatenate(
        [rng.rand(B, 25, 2).astype(np.float32) * 2 - 1,
         np.ones((B, 25, 1), np.float32)], -1))

    log("compiling stage-6 smpl one-step...")
    programs.update({f"stage6_{k}": v for k, v in
                     opt_smpl.cost_probe(init, kpts, ctx).items()})

    verts_f, _, _, _ = lbs_forward(smpl_model, init.pose, init.betas,
                                   init.trans)
    obj_pts = jnp.broadcast_to(
        jnp.asarray((rng.randn(3000, 3) * 0.15).astype(np.float32)),
        (B, 3000, 3))
    sil_faces = jnp.asarray(rng.randint(0, 3000, (2500, 3)).astype(np.int32))
    pm = (rng.rand(B, jcfg.sil_size, jcfg.sil_size) > 0.7).astype(np.float32)
    om = (rng.rand(B, jcfg.sil_size, jcfg.sil_size) > 0.8).astype(np.float32)
    sil = prepare_sil_refs(pm, om, np.tile([[1018.0, 779.0]], (B, 1)),
                           1200, jcfg.sil_size, jcfg.sil_size)
    r0 = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    t0v = jnp.asarray(np.tile([[0.1, 0.0, 2.3]], (B, 1)).astype(np.float32))

    log("compiling stage-6 object one-steps...")
    programs.update({f"stage6_{k}": v for k, v in opt_obj.cost_probe(
        r0, t0v, jnp.ones(B), obj_pts, verts_f, part_labels, jnp.ones(B),
        sil, obj_pts, sil_faces, ctx).items()})

    report = {"gen": gen, "peak_tflops_bf16": peak_flops / 1e12,
              "peak_hbm_gbps": peak_bw / 1e9, "batch": B,
              "rpc_floor_ms": floor_s * 1e3, "programs": {}}
    for name, (compiled, pargs, steps) in programs.items():
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
        out = compiled(*pargs)
        _fetch(jax.tree.leaves(out)[0])  # warm
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            out = compiled(*pargs)
            _fetch(jax.tree.leaves(out)[0])
        t = max((time.perf_counter() - t0) / n - floor_s, 1e-6)
        t_flops = flops / peak_flops
        t_bytes = nbytes / peak_bw
        t_sol = max(t_flops, t_bytes)
        entry = dict(
            flops=flops, bytes_accessed=nbytes, seconds=t,
            steps_per_full_budget=steps,
            achieved_tflops=flops / t / 1e12,
            achieved_gbps=nbytes / t / 1e9,
            mfu_pct=100.0 * flops / t / peak_flops,
            bw_util_pct=100.0 * nbytes / t / peak_bw,
            sol_seconds=t_sol,
            sol_fraction=t_sol / t,
            bound="flops" if t_flops >= t_bytes else "bytes",
        )
        report["programs"][name] = entry
        log(f"{name:16s} {t*1e3:8.1f} ms  {entry['achieved_tflops']:6.2f} "
            f"TF/s ({entry['mfu_pct']:4.1f}%)  {entry['achieved_gbps']:7.1f} "
            f"GB/s ({entry['bw_util_pct']:4.1f}%)  bound={entry['bound']} "
            f"sol={entry['sol_fraction']*100:4.1f}%")

    os.makedirs(osp.dirname(args.results) or ".", exist_ok=True)
    with open(args.results, "w") as f:
        json.dump(report, f, indent=2)
    log(f"wrote {args.results}")


if __name__ == "__main__":
    main()
