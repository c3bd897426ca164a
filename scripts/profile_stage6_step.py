"""Decompose the stage-6 per-step cost at release sizes (B=8).

The composite bench shows stage 6 is ~95% of the single-chip pipeline
cost (PERF_NOTES round 2: smpl 14.3 ms/step, object ~24 ms/step at B=8).
This times the step's ingredients separately so the next optimization
targets the real bottleneck:

  * LBS forward (8x6890 verts, 52 joints) and its value_and_grad
  * packed-cache query forward at the smpl (8x6890) and object (8x3000)
    point counts
  * query value_and_grad w.r.t. POINTS (the optimizer's gradient path:
    cache is frozen, gradients flow through the bilinear sample coords)
  * contact loss (label-compatible NN 6890<->3000) value_and_grad
  * full smpl-phase and joint-phase losses via the actual joint.py
    closures (timed as single fused value_and_grad programs)

Run on the TPU: python scripts/profile_stage6_step.py
"""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _fetch(x):
    return np.asarray(x)


def _time(fn, *args, n=20, floor=0.0):
    _fetch(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        _fetch(fn(*args))
    return ((time.perf_counter() - t0) / n - floor) * 1e3


def main():
    from vistracker_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.models.sifnet import SIFNet, SIFNetConfig, pack_cache
    from vistracker_tpu.core.camera import PerspectiveCamera
    from vistracker_tpu.core import smpl as S
    from vistracker_tpu.core.smpl import lbs_forward
    from vistracker_tpu.ops.chamfer import label_compatible_nn

    rng = np.random.RandomState(0)
    cam = PerspectiveCamera(crop_size=1200)
    cfg = SIFNetConfig()
    model = SIFNet(cfg, cam)
    H, B, V, NO = 512, 8, 6890, 3000

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

    # RPC floor
    @jax.jit
    def tiny(x):
        return (x * 2.0).mean()

    x8 = jnp.ones((8, 8))
    float(tiny(x8))
    t0 = time.perf_counter()
    for _ in range(20):
        float(tiny(x8))
    floor = (time.perf_counter() - t0) / 20
    print(f"rpc floor {floor * 1e3:.1f} ms")

    smpl_model = S.random_smpl_model(1, num_joints=52, num_verts=V)
    pose = jnp.asarray(rng.randn(B, 156).astype(np.float32) * 0.05)
    betas = jnp.zeros((B, 10))
    trans = jnp.asarray(np.tile([[0.0, 0.0, 2.2]], (B, 1)).astype(np.float32))
    pts_h = jnp.asarray((rng.randn(B, V, 3) * 0.3
                         + np.array([0, 0, 2.2])).astype(np.float32))
    pts_o = jnp.asarray((rng.randn(B, NO, 3) * 0.15
                         + np.array([0, 0, 2.2])).astype(np.float32))
    labels_h = jnp.asarray(rng.randint(0, 14, V).astype(np.int32))
    labels_o = jnp.asarray(rng.randint(0, 14, (B, NO)).astype(np.int32))
    mask_h = jnp.asarray(rng.rand(B, V) < 0.1)
    mask_o = jnp.asarray(rng.rand(B, NO) < 0.3)

    # ---- LBS ----
    @jax.jit
    def lbs_f(pose, betas, trans):
        v, _, _, _ = lbs_forward(smpl_model, pose, betas, trans)
        return v.sum()

    lbs_g = jax.jit(jax.value_and_grad(
        lambda p: lbs_f(p, betas, trans)))
    print(f"LBS fwd 8x6890:            {_time(lbs_f, pose, betas, trans, floor=floor):7.2f} ms")
    print(f"LBS val+grad:              {_time(lambda p: lbs_g(p)[0], pose, floor=floor):7.2f} ms")

    # ---- query ----
    # cache/params are ARGUMENTS, not closure constants: capturing the
    # ~2 GB packed cache bakes it into the executable (hour-long lowering
    # on this host + a giant program transfer through the tunnel); the
    # real steppers in fit/joint.py pass it as an arg too.
    def qdf(cache, points):
        return model.apply(params, cache, points, cc, bc,
                           method=SIFNet.query_heads,
                           heads=("df",))["df"].sum()

    qdf_h = jax.jit(qdf)
    qdf_g = jax.jit(jax.value_and_grad(qdf, argnums=1))
    print(f"query df fwd 8x6890:       {_time(qdf_h, cache, pts_h, floor=floor):7.2f} ms")
    print(f"query df val+grad 8x6890:  {_time(lambda c, p: qdf_g(c, p)[0], cache, pts_h, floor=floor):7.2f} ms")
    print(f"query df fwd 8x3000:       {_time(qdf_h, cache, pts_o, floor=floor):7.2f} ms")
    print(f"query df val+grad 8x3000:  {_time(lambda c, p: qdf_g(c, p)[0], cache, pts_o, floor=floor):7.2f} ms")

    def qdp(cache, points):
        out = model.apply(params, cache, points, cc, bc,
                          method=SIFNet.query_heads, heads=("df", "parts"))
        return out["df"].sum() + out["parts"].sum()

    qdp_g = jax.jit(jax.value_and_grad(qdp, argnums=1))
    print(f"query df+parts v+g 8x6890: {_time(lambda c, p: qdp_g(c, p)[0], cache, pts_h, floor=floor):7.2f} ms")

    # ---- contact ----
    def contact(obj):
        def one(sv, ov, mh, mo, lh, lo):
            d_h = label_compatible_nn(sv, lh, ov, lo, mo)
            d_o = label_compatible_nn(ov, lo, sv, lh, mh)
            return d_h.sum() + d_o.sum()
        return jax.vmap(one)(pts_h, obj, mask_h, mask_o,
                             jnp.broadcast_to(labels_h, (B, V)),
                             labels_o).sum()

    con_g = jax.jit(jax.value_and_grad(contact))
    print(f"contact v+g 6890<->3000:   {_time(lambda p: con_g(p)[0], pts_o, floor=floor):7.2f} ms")

    # ---- fused smpl-phase-like loss ----
    def smpl_loss(pose, cache):
        v, _, _, _ = lbs_forward(smpl_model, pose, betas, trans)
        out = model.apply(params, cache, v, cc, bc,
                          method=SIFNet.query_heads, heads=("df", "parts"))
        df = jnp.minimum(out["df"][..., 0], 0.1).mean()
        lp = jax.nn.log_softmax(out["parts"], -1)
        ce = -jnp.take_along_axis(
            lp, jnp.broadcast_to(labels_h, (B, V))[..., None], -1).mean()
        vdiff = ((v[2:] - 2 * v[1:-1] + v[:-2]) ** 2).mean()
        return df + 0.0025 * ce + 1e4 * vdiff

    sl_g = jax.jit(jax.value_and_grad(smpl_loss, argnums=0))
    print(f"smpl-phase-like loss v+g:  {_time(lambda p, c: sl_g(p, c)[0], pose, cache, floor=floor):7.2f} ms")


if __name__ == "__main__":
    sys.exit(main())
