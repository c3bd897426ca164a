"""Frame-axis sharding evidence on the 8-virtual-device CPU mesh (VERDICT
r2 #8): collective inventory of the compiled stage-6 HLO at B=96 over 8
devices, plus a sharded-vs-single wall-clock sanity ratio.

What this shows:
  * which XLA collectives GSPMD inserts for the frame-sharded stage-6
    one-step programs (expected: collective-permute halos for the +/-1/2
    frame temporal stencils, all-reduces only for the scalar loss/mean
    reductions) — pathological all-gathers of the big per-frame tensors
    would show up here long before real multi-chip hardware is available;
  * a CPU wall-clock ratio for the SMPL-T fitter at an identical budget
    (noisy — host threads share cores — but catches order-of-magnitude
    sharding blowups).

Backs the multi-chip projection in PERF_NOTES.  Runs CPU-only: re-execs
itself with the accelerator env stripped and 8 forced host devices.
Usage: python scripts/sharding_inventory.py
"""
import json
import os
import os.path as osp
import re
import subprocess
import sys
import time

N_DEV = 8

if os.environ.get("_SHARDING_INV_CHILD") != "1":
    env = dict(os.environ)
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "PJRT_")):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(f"--xla_force_host_platform_device_count={N_DEV}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["_SHARDING_INV_CHILD"] = "1"
    raise SystemExit(subprocess.run(
        [sys.executable, osp.abspath(__file__)] + sys.argv[1:],
        env=env).returncode)

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all")


def log(msg):
    print(f"[shardinv {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def collective_counts(hlo_text: str) -> dict:
    counts = {}
    for c in COLLECTIVES:
        # op instances like `%all-reduce.12 = ...` / start/done variants
        n = len(re.findall(rf"= \S* ?{c}(?:-start)?\(", hlo_text))
        if n:
            counts[c] = n
    return counts


def main():
    import jax
    import jax.numpy as jnp
    assert len(jax.devices()) == N_DEV, jax.devices()
    from vistracker_tpu.parallel.mesh import (make_mesh, shard_leading,
                                              replicate)
    from vistracker_tpu.models.sifnet import SIFNet, sifnet_preset, \
        pack_cache
    from vistracker_tpu.core.camera import PerspectiveCamera
    from vistracker_tpu.core import smpl as S
    from vistracker_tpu.core.smpl import lbs_forward
    from vistracker_tpu.core.landmarks import BodyLandmarks
    from vistracker_tpu.core.priors import MahalanobisPrior, HandPrior
    from vistracker_tpu.fit.smplt import (SMPLTFitConfig, SMPLTParams,
                                          fit_smplt, project_pixels)
    from vistracker_tpu.fit.joint import (JointFitConfig, make_smpl_optimizer,
                                          make_object_optimizer)
    from vistracker_tpu.data.silprep import prepare_sil_refs

    rng = np.random.RandomState(0)
    mesh = make_mesh(N_DEV, "frames")
    B, V = 96, 6890
    report = {"devices": N_DEV, "batch": B, "programs": {}}

    # ---- stage-6 one-step programs, frame axis sharded ----
    # tiny SIF-Net at 64px: the COLLECTIVE STRUCTURE (what gets halo'd /
    # reduced along the frame axis) is architecture-size independent —
    # every per-frame tensor shards the same way at release sizes.
    H = 64
    cam = PerspectiveCamera(crop_size=1200)
    cfg = sifnet_preset("tiny", crop_size=1200)
    net = SIFNet(cfg, cam)
    images = jnp.asarray(rng.rand(B, H, H, 8).astype(np.float32))
    cc = jnp.tile(jnp.asarray([[1018.0, 779.0]]), (B, 1))
    bc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.2]]), (B, 1))
    pts0 = jnp.asarray((rng.randn(B, 16, 3) * 0.4
                        + np.array([0, 0, 2.2])).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), images[:1], pts0[:1],
                      cc[:1], bc[:1])
    cache = pack_cache(net.apply(params, images, method=SIFNet.encode))
    # shard every per-frame tensor over the mesh; replicate weights
    params_r = replicate(mesh, params)
    ctx = dict(params=params_r, cache=shard_leading(mesh, cache),
               cc=shard_leading(mesh, cc), bc=shard_leading(mesh, bc))

    smpl_model = replicate(mesh, S.random_smpl_model(1, num_joints=52,
                                                     num_verts=V))
    reg = rng.rand(25, V).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    lms = replicate(mesh, BodyLandmarks(body25=jnp.asarray(reg),
                                        face=jnp.asarray(reg[:1]),
                                        hand=jnp.asarray(reg[:1])))
    bp = replicate(mesh, MahalanobisPrior(mean=jnp.zeros(63),
                                          prec=jnp.eye(63) * 0.1))
    hp = replicate(mesh, HandPrior(mean=jnp.zeros(90),
                                   lhand_prec=jnp.eye(45) * 0.1,
                                   rhand_prec=jnp.eye(45) * 0.1))
    part_labels = replicate(mesh, jnp.asarray(
        rng.randint(0, 14, V).astype(np.int32)))
    jcfg = JointFitConfig()

    def query_smpl_step(ctx, points):
        return net.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                         ctx["bc"], method=SIFNet.query_heads,
                         heads=("df", "parts"))

    def query_df_step(ctx, points):
        return net.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                         ctx["bc"], method=SIFNet.query_heads,
                         heads=("df",))

    def query_fn(ctx, points):
        return net.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
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
        shard_leading(mesh, jnp.asarray(
            rng.randn(B, 156).astype(np.float32) * 0.05)),
        shard_leading(mesh, jnp.zeros((B, 10))),
        shard_leading(mesh, jnp.asarray(
            np.tile([[0.0, 0.0, 2.2]], (B, 1)).astype(np.float32))))
    kpts = shard_leading(mesh, jnp.asarray(np.concatenate(
        [rng.rand(B, 25, 2).astype(np.float32) * 2 - 1,
         np.ones((B, 25, 1), np.float32)], -1)))

    log("compiling sharded stage-6 smpl one-step (B=96, 8 devices)...")
    probes = dict(opt_smpl.cost_probe(init, kpts, ctx))

    verts_f, _, _, _ = lbs_forward(smpl_model, init.pose, init.betas,
                                   init.trans)
    obj_pts = shard_leading(mesh, jnp.broadcast_to(
        jnp.asarray((rng.randn(3000, 3) * 0.15).astype(np.float32)),
        (B, 3000, 3)))
    sil_faces = replicate(mesh, jnp.asarray(
        rng.randint(0, 3000, (2500, 3)).astype(np.int32)))
    pm = (rng.rand(B, jcfg.sil_size, jcfg.sil_size) > 0.7).astype(np.float32)
    om = (rng.rand(B, jcfg.sil_size, jcfg.sil_size) > 0.8).astype(np.float32)
    sil = shard_leading(mesh, prepare_sil_refs(
        pm, om, np.tile([[1018.0, 779.0]], (B, 1)), 1200, jcfg.sil_size,
        jcfg.sil_size))
    r0 = shard_leading(mesh, jnp.broadcast_to(jnp.eye(3), (B, 3, 3)))
    t0v = shard_leading(mesh, jnp.asarray(
        np.tile([[0.1, 0.0, 2.3]], (B, 1)).astype(np.float32)))
    occ = shard_leading(mesh, jnp.ones(B))

    log("compiling sharded stage-6 object one-steps...")
    probes.update(opt_obj.cost_probe(
        r0, t0v, occ, obj_pts, verts_f, part_labels, occ, sil, obj_pts,
        sil_faces, ctx))

    for name, (compiled, _, _) in probes.items():
        hlo = compiled.as_text()
        counts = collective_counts(hlo)
        report["programs"][f"stage6_{name}"] = counts
        log(f"stage6_{name}: {counts or 'NO collectives'}")

    # ---- wall-clock: SMPL-T fitter sharded vs single, same budget ----
    fcfg = SMPLTFitConfig(global_iters=1, max_iters=12)
    model1 = S.random_smpl_model(0, num_joints=52, num_verts=512)
    reg2 = rng.rand(25, 512).astype(np.float32)
    reg2 /= reg2.sum(1, keepdims=True)
    lms1 = BodyLandmarks(body25=jnp.asarray(reg2), face=jnp.asarray(reg2[:1]),
                         hand=jnp.asarray(reg2[:1]))
    bp1 = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hp1 = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                    rhand_prec=jnp.eye(45) * 0.1)
    pose = np.zeros((B, 156), np.float32)
    trans = np.tile(np.array([0, 0, 2.2], np.float32), (B, 1))
    verts, _, _, _ = lbs_forward(model1, jnp.asarray(pose),
                                 jnp.zeros((B, 10)), jnp.asarray(trans))
    kpts2d = np.asarray(project_pixels(lms1.body_joints(verts), fcfg))
    kpts_np = np.concatenate([kpts2d, np.ones((B, 25, 1), np.float32)], -1)
    init1 = SMPLTParams.from_full(
        jnp.zeros((B, 156)), jnp.zeros((B, 10)),
        jnp.asarray(trans + np.array([0.1, 0.05, 0.1], np.float32)))

    def timeit(model_x, lms_x, bp_x, hp_x, kpts_x, init_x):
        p, l = fit_smplt(model_x, lms_x, bp_x, hp_x, kpts_x, init_x, fcfg)
        np.asarray(p.trans)  # compile+warm
        t0 = time.perf_counter()
        p, l = fit_smplt(model_x, lms_x, bp_x, hp_x, kpts_x, init_x, fcfg)
        np.asarray(p.trans)
        return time.perf_counter() - t0

    t_single = timeit(model1, lms1, bp1, hp1, jnp.asarray(kpts_np), init1)
    t_shard = timeit(replicate(mesh, model1), replicate(mesh, lms1),
                     replicate(mesh, bp1), replicate(mesh, hp1),
                     shard_leading(mesh, jnp.asarray(kpts_np)),
                     shard_leading(mesh, init1))
    report["smplt_wallclock"] = dict(
        single_s=t_single, sharded_s=t_shard,
        ratio_sharded_over_single=t_shard / t_single,
        note="8 virtual CPU devices share one physical host — parity "
             "(ratio ~1) is the healthy outcome; >>1 would indicate a "
             "sharding-induced communication blowup")
    log(f"smplt wall-clock: single {t_single:.2f}s sharded {t_shard:.2f}s "
        f"(ratio {t_shard/t_single:.2f})")

    out = "results/sharding_inventory.json"
    os.makedirs("results", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
