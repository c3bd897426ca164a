"""Profile stage-6 per-step cost: full 5-head query vs head-restricted.

The per-step losses only read df (object phases) / df+parts (smpl phase);
this measures, at release sizes (B=8, 512^2 inputs, release net, packed
cache), how much of the step time the dead decoder heads cost. Reduced
budgets (same per-step math) keep the run short; the per-step ratio is
what transfers to the full budget.

Run on the TPU: python scripts/profile_stage6_heads.py
"""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _fetch(x):
    return np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp
    import functools
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

    rng = np.random.RandomState(0)
    cam = PerspectiveCamera(crop_size=1200)
    cfg = SIFNetConfig()
    model = SIFNet(cfg, cam)
    H, B, V = 512, 8, 6890

    images = jnp.asarray(rng.rand(B, H, H, 8).astype(np.float32))
    cc = jnp.tile(jnp.asarray([[1018.0, 779.0]]), (B, 1))
    bc = jnp.tile(jnp.asarray([[0.0, 0.0, 2.2]]), (B, 1))
    pts0 = jnp.asarray((rng.randn(1, 16, 3) * 0.4
                        + np.array([0, 0, 2.2])).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images[:1], pts0, cc[:1],
                        bc[:1])

    @jax.jit
    def encode_packed(params, images):
        return pack_cache(model.apply(params, images, method=SIFNet.encode))

    cache = encode_packed(params, images)
    ctx = dict(params=params, cache=cache, cc=cc, bc=bc)

    def query_full(ctx, points):
        return model.apply(ctx["params"], ctx["cache"], points, ctx["cc"],
                           ctx["bc"], method=SIFNet.query)[-1]

    def make_query_heads(heads):
        def q(ctx, points):
            out = model.apply(ctx["params"], ctx["cache"], points,
                              ctx["cc"], ctx["bc"],
                              method=SIFNet.query_heads, heads=heads)
            # contact_masks (run once) reads parts even in df-only mode
            if "parts" not in out:
                out = dict(out, parts=jnp.zeros(
                    points.shape[:-1] + (cfg.num_parts,)))
            return out
        return q

    def project_norm(ctx, joints):
        return cam.project_points(joints, ctx["cc"])[..., :2]

    def project_px(ctx, points):
        return cam.project_screen(points)

    smpl_model = S.random_smpl_model(1, num_joints=52, num_verts=V)
    reg = rng.rand(25, V).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    lms = BodyLandmarks(body25=jnp.asarray(reg), face=jnp.asarray(reg[:1]),
                        hand=jnp.asarray(reg[:1]))
    bp = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hp = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                   rhand_prec=jnp.eye(45) * 0.1)
    part_labels = jnp.asarray(rng.randint(0, 14, V).astype(np.int32))

    # reduced budgets: smpl 1+1+1+10 iters; object 5+5+10
    jcfg = JointFitConfig(smpl_max_iter=10, iter_obj=5, iter_sil=5,
                          joint_max_iter=10)
    smpl_steps = (jcfg.iter_betas + jcfg.iter_pose + jcfg.iter_kpts
                  + jcfg.smpl_max_iter) * jcfg.steps_per_iter
    obj_steps = (jcfg.iter_obj + jcfg.iter_sil
                 + jcfg.joint_max_iter) * jcfg.steps_per_iter
    SEG = 8

    init = SMPLTParams.from_full(
        jnp.asarray(rng.randn(B, 156).astype(np.float32) * 0.05),
        jnp.zeros((B, 10)),
        jnp.asarray(np.tile([[0.0, 0.0, 2.2]], (B, 1)).astype(np.float32)))
    kpts = jnp.asarray(np.concatenate(
        [rng.rand(B, 25, 2).astype(np.float32) * 2 - 1,
         np.ones((B, 25, 1), np.float32)], -1))

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
    occ = jnp.ones(B)

    def time_smpl(qfn, label):
        opt = make_smpl_optimizer(qfn, project_norm, smpl_model, lms, bp,
                                  hp, part_labels, jcfg, segment_iters=SEG)
        out, _ = opt(init, kpts, ctx)
        _fetch(out.trans)  # compile + warm
        t0 = time.perf_counter()
        out, _ = opt(init, kpts, ctx)
        _fetch(out.trans)
        dt = time.perf_counter() - t0
        print(f"smpl   {label:12s}: {dt:7.2f} s "
              f"({dt / smpl_steps * 1e3:6.1f} ms/step)", flush=True)
        return dt

    def time_obj(qfn, label):
        opt = make_object_optimizer(qfn, project_px, jcfg, segment_iters=SEG)
        r, t, _ = opt(r0, t0v, jnp.ones(B), obj_pts, verts_f, part_labels,
                      occ, sil, obj_pts, sil_faces, ctx)
        _fetch(t)  # compile + warm
        t0 = time.perf_counter()
        r, t, _ = opt(r0, t0v, jnp.ones(B), obj_pts, verts_f, part_labels,
                      occ, sil, obj_pts, sil_faces, ctx)
        _fetch(t)
        dt = time.perf_counter() - t0
        print(f"object {label:12s}: {dt:7.2f} s "
              f"({dt / obj_steps * 1e3:6.1f} ms/step)", flush=True)
        return dt

    print(f"[profile] B={B}, smpl_steps={smpl_steps}, obj_steps={obj_steps}",
          flush=True)
    a = time_smpl(query_full, "full-5-head")
    b = time_smpl(make_query_heads(("df", "parts")), "df+parts")
    c = time_obj(query_full, "full-5-head")
    d = time_obj(make_query_heads(("df",)), "df-only")
    print(f"smpl speedup  {a / b:.2f}x   object speedup {c / d:.2f}x",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
