"""Rasterizer and chamfer op tests."""
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.ops.rasterizer import (rasterize_mask, soft_silhouette,
                                           render_triplane_masks, pixel_grid)
from vistracker_tpu.ops.chamfer import chamfer_distance, nn_distances, nearest_index
from vistracker_tpu.ops.grid_sample import grid_sample_points


def test_rasterize_square():
    # unit square from two triangles covering [-0.5, 0.5]^2
    v = jnp.asarray([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]],
                    jnp.float32)
    f = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    size = 64
    m = np.asarray(rasterize_mask(v, f, size))
    # fraction of covered pixels ~ area 0.25 of the [-1,1]^2 domain
    frac = m.mean()
    assert abs(frac - 0.25) < 0.03, frac
    # center covered, corners not
    assert m[size // 2, size // 2] == 1.0
    assert m[0, 0] == 0.0 and m[-1, -1] == 0.0
    # orientation-independent: flipped winding gives same mask
    f2 = jnp.asarray([[0, 2, 1], [0, 3, 2]], jnp.int32)
    m2 = np.asarray(rasterize_mask(v, f2, size))
    np.testing.assert_array_equal(m, m2)


def test_raster_grid_sample_consistency():
    # a rendered mask, sampled at the vertices' NDC coords via grid_sample,
    # must return ~1 inside (same coordinate convention end to end)
    v = jnp.asarray([[-0.3, -0.2], [0.4, -0.1], [0.1, 0.5]], jnp.float32)
    f = jnp.asarray([[0, 1, 2]], jnp.int32)
    m = rasterize_mask(v, f, 128)
    centroid = v.mean(0, keepdims=True)
    val = grid_sample_points(m[None, :, :, None], centroid[None])
    assert float(val[0, 0, 0]) > 0.9


def test_soft_silhouette_matches_hard_mask():
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(20, 2).astype(np.float32) * 0.3)
    f = jnp.asarray(rng.randint(0, 20, (30, 3)).astype(np.int32))
    size = 96
    hard = np.asarray(rasterize_mask(v, f, size))
    soft = np.asarray(soft_silhouette(v, f, size, sigma=0.5 / size))
    # binarized soft ~ hard except a thin boundary band
    diff = np.abs((soft > 0.5).astype(np.float32) - hard).mean()
    assert diff < 0.02, diff


def test_soft_silhouette_gradients_flow():
    v = jnp.asarray([[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]], jnp.float32)
    f = jnp.asarray([[0, 1, 2]], jnp.int32)

    def loss(verts):
        sil = soft_silhouette(verts, f, 64, sigma=0.05)
        return (sil ** 2).sum()

    g = jax.grad(loss)(v)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0.0


def test_triplane_masks_shapes():
    rng = np.random.RandomState(1)
    verts = jnp.asarray(rng.randn(50, 3).astype(np.float32) * 0.3
                        + np.array([0, 0, 2.2], np.float32))
    faces = jnp.asarray(rng.randint(0, 50, (80, 3)).astype(np.int32))
    bc = jnp.asarray(np.array([0, 0, 2.2], np.float32))
    img = render_triplane_masks(verts, faces, bc, 128)
    assert img.shape == (128, 128, 3)
    assert 0.0 < float(np.asarray(img).mean()) < 1.0


def test_chamfer_matches_sklearn_semantics(rng):
    x = rng.randn(1, 300, 3).astype(np.float32)
    y = rng.randn(1, 200, 3).astype(np.float32)
    d = float(chamfer_distance(jnp.asarray(x), jnp.asarray(y), chunk=128)[0])
    # naive numpy
    dmat = np.linalg.norm(x[0][:, None] - y[0][None], axis=-1)
    expected = dmat.min(1).mean() + dmat.min(0).mean()
    np.testing.assert_allclose(d, expected, rtol=1e-4)


def test_chamfer_masked(rng):
    x = rng.randn(1, 64, 3).astype(np.float32)
    y = np.concatenate([x[:, :32], np.full((1, 32, 3), 100.0, np.float32)], 1)
    my = np.concatenate([np.ones((1, 32)), np.zeros((1, 32))], 1)
    # masked: the garbage padding in y is ignored both as target and source
    d = float(chamfer_distance(jnp.asarray(x[:, :32]), jnp.asarray(y),
                               mask2=jnp.asarray(my), chunk=64)[0])
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_nearest_index(rng):
    x = rng.randn(2, 50, 3).astype(np.float32)
    y = rng.randn(2, 40, 3).astype(np.float32)
    d, idx = nearest_index(jnp.asarray(x), jnp.asarray(y))
    dmat = np.linalg.norm(x[:, :, None] - y[:, None], axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), dmat.argmin(-1))
    np.testing.assert_allclose(np.asarray(d), (dmat.min(-1)) ** 2, rtol=1e-3,
                               atol=1e-5)


def test_soft_silhouette_no_ghost_rays():
    """An edge-on (collinear-projected) face must render as a hairline on
    its own segment, NOT a 0.5-intensity ray across the whole image: the
    endpoint-cap planes (_face_planes) clip the min-of-edge-lines sdf,
    which otherwise stays ~0 along the face's infinite support line.
    Generic during tracking — any box face sweeps through edge-on
    (reference neural_renderer via recon/obj_pose_roi.py:183-202 is a
    rasterizer and has no such failure mode)."""
    size = 64
    # collinear sliver on the horizontal midline, segment x in [-0.3, 0.0]
    v = jnp.asarray([[-0.3, 0.0], [0.0, 0.0], [-0.15, 1e-5]], jnp.float32)
    f = jnp.asarray([[0, 1, 2]], jnp.int32)
    img = np.asarray(soft_silhouette(v, f, size, sigma=2.0 / size))
    row = size // 2  # nearest row to y=0 sits at |y| ~ sigma/2
    # on-segment pixels read ~sigmoid(-1/2) = 0.38 (hairline half-pixel off)
    xs = np.linspace(-1.0, 1.0, size)
    on = (xs >= -0.28) & (xs <= -0.02)
    assert img[row, on].min() > 0.3
    # beyond the endpoints along the same line: dead, not a ray
    beyond = (xs > 0.15) | (xs < -0.45)
    assert img[row, beyond].max() < 0.05, img[row, beyond].max()
    # and off the line entirely
    assert img[row + 8].max() < 0.05


def test_soft_silhouette_smooth_under_subpixel_motion():
    """Sub-pixel translations of a mesh with exactly-degenerate faces (a
    lat-long sphere's pole ring) must change the image smoothly: the old
    absolute 1e-12 area cut sat below fp32 noise, so degenerate faces
    flickered in and out and splattered garbage (+-0.4 jumps for sub-mm
    moves — the round-4 stage-6 diagnostic that exposed this)."""
    th = np.linspace(0, np.pi, 9)
    ph = np.linspace(0, 2 * np.pi, 13)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    verts = 0.4 * np.stack([np.sin(tt) * np.cos(pp),
                            np.sin(tt) * np.sin(pp)], -1).reshape(-1, 2)
    idx = np.arange(9 * 13).reshape(9, 13)
    quads = np.stack([idx[:-1, :-1], idx[1:, :-1], idx[1:, 1:],
                      idx[:-1, 1:]], -1).reshape(-1, 4)
    faces = jnp.asarray(np.concatenate(
        [quads[:, [0, 1, 2]], quads[:, [0, 2, 3]]]).astype(np.int32))
    size = 32
    prev = None
    for dx in np.linspace(0.0, 2.0 / size, 9):  # one pixel, 8 substeps
        img = np.asarray(soft_silhouette(
            jnp.asarray(verts + np.array([dx, 0.0], np.float32)),
            faces, size, sigma=2.0 / size))
        if prev is not None:
            assert np.abs(img - prev).max() < 0.15, dx
        prev = img
