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


def test_grad_cross_block_ties(rng):
    """Faces duplicated across face-block boundaries produce exact max
    ties in DIFFERENT 128-face blocks: the forward's incremental tie
    count must still match jnp.max's equal-split vjp (XLA path)."""
    v2d = jnp.asarray(rng.randn(1, 24, 2).astype(np.float32) * 0.5)
    base = rng.randint(0, 24, (150, 3)).astype(np.int32)
    faces = jnp.asarray(np.concatenate([base, base], axis=0))  # 300 = 3 blocks
    target = jnp.asarray((rng.rand(1, SIZE, SIZE) > 0.5).astype(np.float32))

    def loss(fn):
        def f(v):
            imgs = fn(v)
            return ((imgs - target) ** 2).sum()
        return f

    ref = loss(lambda v: jax.vmap(
        lambda vi: soft_silhouette(vi, faces, SIZE, SIGMA, chunk=512))(v))
    out = loss(lambda v: soft_silhouette_batch(v, faces, SIZE, SIGMA,
                                               interpret=True))
    l0, g0 = jax.value_and_grad(ref)(v2d)
    l1, g1 = jax.value_and_grad(out)(v2d)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-3, atol=1e-5)


def test_culling_scene_matches_xla(rng):
    """Small faces clustered near the image top: for most row strips the
    liveness bound proves no face can reach m >= -_CUT_SIGMAS*sigma and
    the cell is culled, which must not change forward or gradient beyond
    the sigmoid(-20) ~ 2e-9 tail. randn triangles include slivers whose
    ghost rays (module docstring) keep distant strips live — the bound,
    unlike a bbox apron, must keep those exact."""
    size, sigma = 64, 1.0 / 64.0
    centers = rng.uniform(-0.3, 0.3, (40, 1, 2)).astype(np.float32)
    centers[..., 1] = centers[..., 1] * 0.25 - 0.75      # y in [-0.82, -0.68]
    tri = rng.randn(40, 3, 2).astype(np.float32) * 0.03  # tiny faces
    v2d = jnp.asarray((centers + tri).reshape(1, 120, 2))
    faces = jnp.asarray(np.arange(120, dtype=np.int32).reshape(40, 3))
    target = jnp.asarray((rng.rand(1, size, size) > 0.5).astype(np.float32))

    # compact (equilateral) faces at the same spot must actually cull:
    # rebuild the kernel's liveness mask and require culled cells. (The
    # randn sliver scene itself may stay fully live through ghost rays —
    # that is correct behaviour, checked by the parity asserts below.)
    from vistracker_tpu.ops import pallas_raster as pr
    ang = np.deg2rad([90.0, 210.0, 330.0]).astype(np.float32)
    eq = 0.03 * np.stack([np.cos(ang), np.sin(ang)], axis=-1)[None]
    v2d_eq = jnp.asarray((centers + eq).reshape(1, 120, 2))
    act = np.asarray(pr._strip_active(pr._planes(v2d_eq, faces),
                                      size, sigma))
    assert (act == 0).any() and (act == 1).any()

    def loss(fn):
        def f(v):
            imgs = fn(v)
            return ((imgs - target) ** 2).sum()
        return f

    ref = loss(lambda v: jax.vmap(
        lambda vi: soft_silhouette(vi, faces, size, sigma, chunk=512))(v))
    out = loss(lambda v: soft_silhouette_batch(v, faces, size, sigma,
                                               interpret=True))
    l0, g0 = jax.value_and_grad(ref)(v2d)
    l1, g1 = jax.value_and_grad(out)(v2d)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    # atol 1e-4 (vs 1e-5 in the clean scenes): randn slivers make the
    # per-face planes nearly coincident, so 1-ulp differences between the
    # XLA einsum and the kernel's FMA evaluation can flip which plane is
    # the min at a near-tie, redistributing that pixel's cotangent between
    # planes of the SAME face — a tolerance artifact, not a convention
    # mismatch (module docstring, gradient notes).
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-3, atol=1e-4)


def test_coverage_mask_matches_xla(rng, monkeypatch):
    """Hard coverage mask (stage-3 triplane path): exact {0,1} equality
    with vmap(rasterize_mask), incl. degenerate faces, padding, offscreen
    faces, and a >_MASK_VIEWS batch (exercises the SMEM batch slicing)."""
    from vistracker_tpu.ops.rasterizer import rasterize_mask
    from vistracker_tpu.ops import pallas_raster as pr
    from vistracker_tpu.ops.pallas_raster import coverage_mask_batch
    # _mask_views is the adaptive SMEM guard (512^2 x 13776 SMPL faces
    # overflowed the old fixed 8-view slice). At this test's tiny shape
    # the adaptive budget yields ~16k views — shrink the BUDGET (not grow
    # B: 16k+3 examples x interpret-mode grid cells never finishes) so
    # the slicing path is exercised with a handful of examples.
    per_view = (SIZE // pr._RBLK) * (SIZE // pr._xblk(SIZE)) \
        * (256 // pr._FBLK) * 4
    monkeypatch.setattr(pr, "_MASK_SMEM_BUDGET", 4 * per_view)
    jax.clear_caches()  # coverage_mask_batch is jitted; drop stale traces
    B = pr._mask_views(SIZE, 256) + 3
    assert B == 7
    v2d = rng.randn(B, 40, 2).astype(np.float32) * 0.6
    v2d[:, 30:] += 3.0  # some fully offscreen verts/faces
    faces = rng.randint(0, 40, (150, 3)).astype(np.int32)
    faces[5] = [3, 3, 7]  # zero-area
    v2d, faces = jnp.asarray(v2d), jnp.asarray(faces)
    ref = jax.vmap(lambda v: rasterize_mask(v, faces, SIZE, chunk=64))(v2d)
    out = coverage_mask_batch(v2d, faces, SIZE, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_triplane_batch_matches_per_frame(rng):
    """render_triplane_masks_batch (pallas backend, interpret) equals the
    per-frame render_triplane_masks stack bit-exactly."""
    from vistracker_tpu.ops.rasterizer import (render_triplane_masks,
                                               render_triplane_masks_batch)
    B, V = 3, 30
    verts = jnp.asarray(
        (rng.randn(B, V, 3) * 0.3 + np.array([0, 0.3, 2.4]))
        .astype(np.float32))
    faces = jnp.asarray(rng.randint(0, V, (25, 3)).astype(np.int32))
    bc = jnp.asarray(verts.mean(axis=1))
    ref = jnp.stack([render_triplane_masks(verts[i], faces, bc[i], SIZE)
                     for i in range(B)])
    out = render_triplane_masks_batch(verts, faces, bc, SIZE,
                                      backend="pallas", interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    xla = render_triplane_masks_batch(verts, faces, bc, SIZE,
                                      backend="xla")
    np.testing.assert_array_equal(np.asarray(xla), np.asarray(ref))


def test_sil_batch_smem_slicing_matches(rng, monkeypatch):
    """soft_silhouette_batch with a batch larger than the SMEM view
    budget must slice and concatenate WITHOUT changing values or
    gradients (the slice boundary is differentiable)."""
    from vistracker_tpu.ops import pallas_raster as pr
    v2d, faces = _scene(rng, B=5)
    target = jnp.asarray((rng.rand(5, SIZE, SIZE) > 0.5).astype(np.float32))

    def loss(v):
        imgs = soft_silhouette_batch(v, faces, SIZE, SIGMA, interpret=True)
        return ((imgs - target) ** 2).sum()

    l0, g0 = jax.value_and_grad(loss)(v2d)
    # shrink the budget so 5 examples need 3 pallas_calls (2+2+1)
    per_view = (SIZE // pr._RBLK) * (SIZE // pr._xblk(SIZE)) \
        * (128 // pr._FBLK) * 4
    monkeypatch.setattr(pr, "_MASK_SMEM_BUDGET", 2 * per_view)
    assert pr._mask_views(SIZE, 128) == 2
    # soft_silhouette_batch is jitted: without clearing, the second call
    # reuses the UNSLICED executable traced above and the test is vacuous
    jax.clear_caches()
    calls = []
    real_max_logit = pr._max_logit
    monkeypatch.setattr(
        pr, "_max_logit",
        lambda *a, **k: (calls.append(1), real_max_logit(*a, **k))[1])
    l1, g1 = jax.value_and_grad(loss)(v2d)
    assert len(calls) == 3  # the sliced path actually ran (2+2+1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-6, atol=1e-7)
