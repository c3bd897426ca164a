"""On-TPU parity check of the Pallas kernels vs their XLA reference paths
at realistic eval shapes (the tests only run interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.RandomState(0)


def sphere_mesh(n=60, r=0.5, c=(0, 0, 2.2)):
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([r * np.sin(T) * np.cos(P), r * np.sin(T) * np.sin(P),
                  r * np.cos(T)], -1).reshape(-1, 3) + np.asarray(c)
    idx = lambda i, j: i * n + (j % n)
    f = []
    for i in range(n - 1):
        for j in range(n):
            f.append([idx(i, j), idx(i + 1, j), idx(i, j + 1)])
            f.append([idx(i + 1, j), idx(i + 1, j + 1), idx(i, j + 1)])
    return v.astype(np.float32), np.asarray(f, np.int32)


print("backend:", jax.default_backend())

# ---- 1. stage-3 triplane coverage masks -----------------------------------
from vistracker_tpu.ops.rasterizer import render_triplane_masks_batch

B = 8
for n, size in ((84, 512), (60, 512), (84, 256)):
    v, f = sphere_mesh(n)
    verts = jnp.asarray(v)[None] + jnp.asarray(
        rng.randn(B, 1, 3).astype(np.float32) * 0.05)
    bc = jnp.asarray(v.mean(0))[None] + jnp.zeros((B, 3), jnp.float32)
    try:
        mp = render_triplane_masks_batch(verts, jnp.asarray(f), bc, size,
                                         backend="pallas")
        mx = render_triplane_masks_batch(verts, jnp.asarray(f), bc, size,
                                         backend="xla")
        mp, mx = np.asarray(mp), np.asarray(mx)
        mis = (mp != mx).mean()
        print(f"coverage_mask {size}^2 {len(f)} faces: mismatch frac "
              f"{mis:.2e} ({int((mp != mx).sum())} px), pallas on "
              f"{mp.mean():.4f} xla on {mx.mean():.4f}")
    except Exception as e:
        print(f"coverage_mask {size}^2 {len(f)} faces: FAILED "
              f"{str(e).splitlines()[0][:140]}")

# ---- 2. stage-6 soft silhouette -------------------------------------------
from vistracker_tpu.ops.rasterizer import soft_silhouette
from vistracker_tpu.ops.pallas_raster import soft_silhouette_batch

v2, f2 = sphere_mesh(36)  # ~2.5k faces
SIZE, SIGMA = 256, 2.0 / 256
v2d = jnp.asarray(
    (v2[:, :2] - v2[:, :2].mean(0)) * 1.8)[None] + jnp.asarray(
    rng.randn(B, 1, 2).astype(np.float32) * 0.05)
faces2 = jnp.asarray(f2)
ref = jax.jit(jax.vmap(lambda vv: soft_silhouette(vv, faces2, SIZE, SIGMA,
                                                  chunk=512)))(v2d)
out = soft_silhouette_batch(v2d, faces2, SIZE, SIGMA)
ref, outn = np.asarray(ref), np.asarray(out)
d = np.abs(ref - outn)
print(f"soft_sil fwd 256^2 2.5k faces: max |d| {d.max():.3e} mean {d.mean():.3e}")

target = jnp.asarray((rng.rand(B, SIZE, SIZE) > 0.5).astype(np.float32))
lr, gr = jax.value_and_grad(
    lambda vv: ((jax.vmap(lambda vi: soft_silhouette(vi, faces2, SIZE, SIGMA,
                                                     chunk=512))(vv)
                 - target) ** 2).sum())(v2d)
lp, gp = jax.value_and_grad(
    lambda vv: ((soft_silhouette_batch(vv, faces2, SIZE, SIGMA)
                 - target) ** 2).sum())(v2d)
gr, gp = np.asarray(gr), np.asarray(gp)
gd = np.abs(gr - gp) / (np.abs(gr).max() + 1e-9)
print(f"soft_sil grad: loss ref {float(lr):.5f} pallas {float(lp):.5f}; "
      f"rel grad max |d| {gd.max():.3e}")

# ---- 3. contact label-NN ---------------------------------------------------
from vistracker_tpu.ops.pallas_nn import label_compatible_nn_pallas
import inspect
print(inspect.signature(label_compatible_nn_pallas))
