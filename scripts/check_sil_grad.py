"""Localize the soft-sil gradient mismatch: same realistic scene, pallas
kernel vs XLA path, on whatever backend this process runs (cpu ->
interpret mode, tpu -> real kernel)."""
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.ops.rasterizer import soft_silhouette
from vistracker_tpu.ops.pallas_raster import soft_silhouette_batch

rng = np.random.RandomState(0)


def sphere_mesh(n=36, r=0.5):
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([r * np.sin(T) * np.cos(P), r * np.sin(T) * np.sin(P),
                  r * np.cos(T)], -1).reshape(-1, 3)
    idx = lambda i, j: i * n + (j % n)
    f = []
    for i in range(n - 1):
        for j in range(n):
            f.append([idx(i, j), idx(i + 1, j), idx(i, j + 1)])
            f.append([idx(i + 1, j), idx(i + 1, j + 1), idx(i, j + 1)])
    return v.astype(np.float32), np.asarray(f, np.int32)


B, SIZE, SIGMA = 8, 256, 2.0 / 256
v2, f2 = sphere_mesh(36)
v2d = jnp.asarray(
    (v2[:, :2] - v2[:, :2].mean(0)) * 1.8)[None] + jnp.asarray(
    rng.randn(B, 1, 2).astype(np.float32) * 0.05)
faces2 = jnp.asarray(f2)
target = jnp.asarray((rng.rand(B, SIZE, SIZE) > 0.5).astype(np.float32))
interp = jax.default_backend() != "tpu"
print("backend", jax.default_backend(), "interpret", interp)

gr = jax.grad(lambda vv: ((jax.vmap(lambda vi: soft_silhouette(
    vi, faces2, SIZE, SIGMA, chunk=512))(vv) - target) ** 2).sum())(v2d)
gp = jax.grad(lambda vv: ((soft_silhouette_batch(
    vv, faces2, SIZE, SIGMA, interpret=interp) - target) ** 2).sum())(v2d)
gr, gp = np.asarray(gr), np.asarray(gp)
d = np.abs(gr - gp)
rel = d / (np.abs(gr).max() + 1e-9)
print(f"rel max {rel.max():.3e}  ||d||/||g|| {np.linalg.norm(d)/np.linalg.norm(gr):.3e}")
print(f"n verts with rel>1e-2: {(rel.max(-1) > 1e-2).sum()} of {rel.shape[0]*rel.shape[1]}")
bad = np.argwhere(rel.max(-1) > 1e-2)
for b, vi in bad[:8]:
    print(f"  b={b} v={vi} gr={gr[b, vi]} gp={gp[b, vi]}")
