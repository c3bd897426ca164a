"""Fused Pallas soft-silhouette kernel parity (interpret mode on CPU):
forward values and v2d gradients must match the XLA scan path
(ops/rasterizer.py:soft_silhouette), including degenerate faces and
face-block padding."""
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.ops.rasterizer import soft_silhouette
from vistracker_tpu.ops.pallas_raster import soft_silhouette_batch

SIZE = 32
SIGMA = 2.0 / SIZE


def _scene(rng, B=2, V=24, F=37):
    """Random faces incl. a degenerate (repeated-vertex) one; F=37 also
    exercises padding to the 128 face-block."""
    v2d = rng.randn(B, V, 2).astype(np.float32) * 0.5
    faces = rng.randint(0, V, (F, 3)).astype(np.int32)
    faces[5] = [3, 3, 7]  # zero-area
    return jnp.asarray(v2d), jnp.asarray(faces)


def test_forward_matches_xla(rng):
    v2d, faces = _scene(rng)
    ref = jax.vmap(lambda v: soft_silhouette(v, faces, SIZE, SIGMA,
                                             chunk=64))(v2d)
    out = soft_silhouette_batch(v2d, faces, SIZE, SIGMA, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_grad_matches_xla(rng):
    v2d, faces = _scene(rng)
    target = jnp.asarray((rng.rand(2, SIZE, SIZE) > 0.5).astype(np.float32))

    def loss_ref(v):
        imgs = jax.vmap(lambda vi: soft_silhouette(vi, faces, SIZE, SIGMA,
                                                   chunk=64))(v)
        return ((imgs - target) ** 2).sum()

    def loss_pl(v):
        imgs = soft_silhouette_batch(v, faces, SIZE, SIGMA, interpret=True)
        return ((imgs - target) ** 2).sum()

    l0, g0 = jax.value_and_grad(loss_ref)(v2d)
    l1, g1 = jax.value_and_grad(loss_pl)(v2d)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    # gradients through coeffs -> v2d; ties (saturated sigmoid) carry zero
    # cotangent under both conventions (module docstring)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-3, atol=1e-5)


def test_grad_nonzero_and_descends(rng):
    """Sanity: the kernel's gradient actually moves a mesh toward a mask."""
    v2d, faces = _scene(rng, B=1)
    target = jax.vmap(lambda v: soft_silhouette(v, faces, SIZE, SIGMA,
                                                chunk=64))(v2d)
    v0 = v2d + 0.08

    def loss(v):
        imgs = soft_silhouette_batch(v, faces, SIZE, SIGMA, interpret=True)
        return ((imgs - target) ** 2).sum()

    l0, g = jax.value_and_grad(loss)(v0)
    assert float(jnp.abs(g).max()) > 0.0
    l1 = loss(v0 - 0.01 * g / (jnp.abs(g).max() + 1e-9))
    assert float(l1) < float(l0)
