"""Micro-benchmark: stage-6 silhouette-phase cost structure.

The full-budget stage-6 measurement (PERF_NOTES round-2 session 3) put the
object phases at 84 s / 1550 steps (B=8) vs 14.8 s / 1030 steps for the
smpl phase. The object-only and joint phases query only 3k points, so the
hypothesis is that the sil phase's soft_silhouette value_and_grad
dominates: at sil_face_chunk=32 one eval runs ceil(2500/32)=79 sequential
checkpointed scan steps of a tiny K=3 einsum — latency-bound, not
FLOP-bound.

Times one value_and_grad of an occlusion-weighted silhouette L2 (the
sil-phase Adam-step body) at release sizes (B=8 frames, 2500 faces, 256^2)
across face-chunk sizes and formulations (einsum vs broadcast-FMA).
Synchronous-fetch timing minus the RPC floor (bench.py methodology).

Usage: python scripts/bench_sil_phase.py [--chunks 32,128,512] [--fma]
"""
import argparse
import functools
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="32,128,512")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--faces", type=int, default=2500)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scene", default="random", choices=["random", "grid"],
                    help="random = giant unconnected triangles (worst case "
                         "for block culling); grid = triangulated grid of "
                         "small faces over the ROI (realistic template "
                         "mesh shape)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.ops.rasterizer import soft_silhouette
    from vistracker_tpu.ops.pallas_raster import soft_silhouette_batch

    B, F, S = args.batch, args.faces, args.size
    rng = np.random.RandomState(0)
    if args.scene == "grid":
        # triangulated grid over [-0.6, 0.6]^2: ~F small compact faces,
        # the shape of a real projected template mesh
        n = max(2, int(round(np.sqrt(F / 2.0))))
        xs = np.linspace(-0.6, 0.6, n + 1, dtype=np.float32)
        gx, gy = np.meshgrid(xs, xs, indexing="ij")
        grid_v = np.stack([gx, gy], axis=-1).reshape(-1, 2)
        V = grid_v.shape[0]
        v2d = np.tile(grid_v[None], (B, 1, 1))
        v2d += rng.randn(B, V, 2).astype(np.float32) * 0.003
        idx = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
        qa, qb = idx[:-1, :-1].ravel(), idx[1:, :-1].ravel()
        qc, qd = idx[:-1, 1:].ravel(), idx[1:, 1:].ravel()
        faces = np.concatenate([np.stack([qa, qb, qd], -1),
                                np.stack([qa, qd, qc], -1)]) \
            .astype(np.int32)
        F = faces.shape[0]
        print(f"grid scene: {V} verts, {F} faces", flush=True)
    else:
        # giant unconnected triangles: verts spread over the ROI
        V = 1300
        v2d = rng.randn(B, V, 2).astype(np.float32) * 0.3
        faces = rng.randint(0, V, (F, 3)).astype(np.int32)
    ref = (rng.rand(B, S, S) > 0.5).astype(np.float32)
    occ = np.ones(B, np.float32)

    @jax.jit
    def floor_fn(x):
        return (x * 2.0).mean()

    xs = jnp.ones((8, 8))
    float(floor_fn(xs))
    t0 = time.perf_counter()
    for _ in range(10):
        float(floor_fn(xs))
    floor = (time.perf_counter() - t0) / 10
    print(f"rpc floor {floor*1e3:.1f} ms", flush=True)

    faces_j = jnp.asarray(faces)
    ref_j = jnp.asarray(ref)
    occ_j = jnp.asarray(occ)

    def time_one(name, loss_grad):
        v = jnp.asarray(v2d)
        l, g = loss_grad(v)
        np.asarray(l)  # compile + warm
        t0 = time.perf_counter()
        for i in range(args.reps):
            l, g = loss_grad(v + i * 1e-6)
            np.asarray(l)
        dt = ((time.perf_counter() - t0) / args.reps - floor) * 1e3
        print(f"{name}: {dt:8.1f} ms / value_and_grad "
              f"(loss {float(l):.1f})", flush=True)

    for chunk in [int(c) for c in args.chunks.split(",") if c]:
        @functools.partial(jax.jit, static_argnames=("ch",))
        def loss_grad(v2d, ch=chunk):
            def loss(v2d):
                def one(v):
                    return soft_silhouette(v, faces_j, S, 1.0 / 128.0,
                                           chunk=ch)
                imgs = jax.vmap(one)(v2d)
                per_ex = ((imgs - ref_j) ** 2).sum((1, 2))
                return (per_ex * occ_j).mean()
            return jax.value_and_grad(loss)(v2d)

        time_one(f"xla chunk {chunk:4d}", loss_grad)

    @jax.jit
    def loss_grad_pl(v2d):
        def loss(v2d):
            imgs = soft_silhouette_batch(v2d, faces_j, S, 1.0 / 128.0)
            per_ex = ((imgs - ref_j) ** 2).sum((1, 2))
            return (per_ex * occ_j).mean()
        return jax.value_and_grad(loss)(v2d)

    time_one("pallas fused   ", loss_grad_pl)


if __name__ == "__main__":
    main()
