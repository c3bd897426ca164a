"""grid_sample and resize parity tests against torch CPU."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vistracker_tpu.ops.grid_sample import grid_sample_points, grid_sample_points_nchw
from vistracker_tpu.ops.resize import upsample2x_bicubic, interpolate2d, avg_pool2x


def test_grid_sample_matches_torch(rng):
    B, C, H, W, N = 2, 7, 13, 17, 50
    feat = rng.randn(B, C, H, W).astype(np.float32)
    uv = (rng.rand(B, N, 2).astype(np.float32) * 2.4 - 1.2)  # include OOB points

    t = F.grid_sample(torch.from_numpy(feat),
                      torch.from_numpy(uv).unsqueeze(2),
                      align_corners=True, mode="bilinear",
                      padding_mode="zeros")[:, :, :, 0].numpy()

    ours = np.asarray(grid_sample_points_nchw(jnp.asarray(feat), jnp.asarray(uv)))
    np.testing.assert_allclose(ours, t, atol=1e-5)

    # channels-last path agrees with channels-first path
    ours_cl = np.asarray(grid_sample_points(
        jnp.asarray(feat.transpose(0, 2, 3, 1)), jnp.asarray(uv)))
    np.testing.assert_allclose(ours_cl.transpose(0, 2, 1), t, atol=1e-5)


def test_grid_sample_exact_at_pixels(rng):
    # align_corners=True: uv=-1 is pixel 0, uv=+1 is pixel size-1
    B, C, H, W = 1, 3, 5, 9
    feat = rng.randn(B, C, H, W).astype(np.float32)
    uv = np.array([[[-1.0, -1.0], [1.0, 1.0], [1.0, -1.0]]], np.float32)
    out = np.asarray(grid_sample_points_nchw(jnp.asarray(feat), jnp.asarray(uv)))
    np.testing.assert_allclose(out[0, :, 0], feat[0, :, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, :, 1], feat[0, :, H - 1, W - 1], atol=1e-6)
    np.testing.assert_allclose(out[0, :, 2], feat[0, :, 0, W - 1], atol=1e-6)


def test_bicubic_upsample_matches_torch(rng):
    B, C, H, W = 2, 4, 10, 12
    x = rng.randn(B, C, H, W).astype(np.float32)
    t = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bicubic",
                      align_corners=True).numpy()
    ours = np.asarray(upsample2x_bicubic(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), t, atol=1e-4)


def test_bilinear_resize_matches_torch(rng):
    x = rng.randn(1, 3, 8, 8).astype(np.float32)
    t = F.interpolate(torch.from_numpy(x), size=(15, 11), mode="bilinear",
                      align_corners=False).numpy()
    ours = np.asarray(interpolate2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    (15, 11), "bilinear", False))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), t, atol=1e-5)


def test_avg_pool2x_matches_torch(rng):
    x = rng.randn(2, 6, 16, 16).astype(np.float32)
    t = F.avg_pool2d(torch.from_numpy(x), 2, stride=2).numpy()
    ours = np.asarray(avg_pool2x(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), t, atol=1e-6)


def test_packed_corner_sampling_matches_unpacked(rng):
    import jax
    from vistracker_tpu.ops.grid_sample import (pack_corners,
                                                grid_sample_points_packed)
    B, H, W, C, N = 2, 13, 17, 7, 500
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    uv = jnp.asarray(rng.rand(B, N, 2).astype(np.float32) * 2.6 - 1.3)
    ref = np.asarray(grid_sample_points(feat, uv))
    out = np.asarray(grid_sample_points_packed(pack_corners(feat), uv))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # gradients w.r.t. query positions match too (generator projection path)
    g1 = jax.grad(lambda u: grid_sample_points(feat, u).sum())(uv)
    g2 = jax.grad(lambda u: grid_sample_points_packed(
        pack_corners(feat), u).sum())(uv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_packed_cache_query_parity(rng):
    import jax
    from vistracker_tpu.models.sifnet import SIFNet, SIFNetConfig, pack_cache
    cfg = SIFNetConfig(num_stack=1, num_hourglass=1, hourglass_dim=32,
                       tmpx_dim=32, triplane_stack=1, triplane_hg_dim=32,
                       triplane_tmpx_dim=32, hidden_dim=16)
    model = SIFNet(cfg)
    B = 1
    imgs = jnp.asarray(rng.rand(B, 32, 32, 8).astype(np.float32))
    cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
    bc = jnp.asarray(np.array([[0, 0, 2.2]], np.float32))
    pts = jnp.asarray((rng.randn(B, 50, 3) * 0.3
                       + np.array([0, 0, 2.2])).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs, pts, cc, bc)
    cache = model.apply(params, imgs, method=SIFNet.encode)
    a = model.apply(params, cache, pts, cc, bc, method=SIFNet.query)[-1]
    b = model.apply(params, pack_cache(cache), pts, cc, bc,
                    method=SIFNet.query)[-1]
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-5, err_msg=k)


def test_selective_pack_cache_parity(rng):
    import jax
    from vistracker_tpu.models.sifnet import SIFNet, SIFNetConfig, pack_cache
    cfg = SIFNetConfig(num_stack=1, num_hourglass=1, hourglass_dim=32,
                       tmpx_dim=32, triplane_stack=1, triplane_hg_dim=32,
                       triplane_tmpx_dim=32, hidden_dim=16)
    model = SIFNet(cfg)
    imgs = jnp.asarray(rng.rand(1, 32, 32, 8).astype(np.float32))
    cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
    bc = jnp.asarray(np.array([[0, 0, 2.2]], np.float32))
    pts = jnp.asarray((rng.randn(1, 40, 3) * 0.3
                       + np.array([0, 0, 2.2])).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs, pts, cc, bc)
    cache = model.apply(params, imgs, method=SIFNet.encode)
    ref = model.apply(params, cache, pts, cc, bc, method=SIFNet.query)[-1]
    mixed = model.apply(params, pack_cache(cache, pack_tmpx=False), pts, cc,
                        bc, method=SIFNet.query)[-1]
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(mixed[k]),
                                   atol=1e-5, err_msg=k)
    # pack_hg=False leaves the hourglass maps raw (32-frame-chunk memory
    # policy); tmpx-only packing must still be exact
    mixed2 = model.apply(params, pack_cache(cache, pack_hg=False), pts, cc,
                         bc, method=SIFNet.query)[-1]
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(mixed2[k]),
                                   atol=1e-5, err_msg=k)


def test_grid_sample_bf16_map_close_and_fp32_out(rng):
    """bf16 feature maps (halved gather bandwidth) blend in fp32: output
    dtype is fp32 and values differ from the fp32 map only by the storage
    rounding (~2^-8 relative)."""
    from vistracker_tpu.ops.grid_sample import (pack_corners,
                                                grid_sample_points_packed)
    B, H, W, C, N = 2, 13, 17, 7, 300
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    uv = jnp.asarray(rng.rand(B, N, 2).astype(np.float32) * 2.4 - 1.2)
    ref = np.asarray(grid_sample_points(feat, uv))
    out = grid_sample_points(feat.astype(jnp.bfloat16), uv)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2)
    outp = grid_sample_points_packed(
        pack_corners(feat).astype(jnp.bfloat16), uv)
    assert outp.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(outp), ref, atol=2e-2)


def test_query_bf16_cache_close(rng):
    """cast_cache(bfloat16): full query head outputs stay close to the fp32
    cache (decoders run in fp32; only stored features are rounded)."""
    import jax
    from vistracker_tpu.models.sifnet import (SIFNet, SIFNetConfig,
                                              pack_cache, cast_cache)
    cfg = SIFNetConfig(num_stack=1, num_hourglass=1, hourglass_dim=32,
                       tmpx_dim=32, triplane_stack=1, triplane_hg_dim=32,
                       triplane_tmpx_dim=32, hidden_dim=16)
    model = SIFNet(cfg)
    imgs = jnp.asarray(rng.rand(1, 32, 32, 8).astype(np.float32))
    cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
    bc = jnp.asarray(np.array([[0, 0, 2.2]], np.float32))
    pts = jnp.asarray((rng.randn(1, 60, 3) * 0.3
                       + np.array([0, 0, 2.2])).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs, pts, cc, bc)
    cache = model.apply(params, imgs, method=SIFNet.encode)
    ref = model.apply(params, cache, pts, cc, bc, method=SIFNet.query)[-1]
    for pack in (False, True):
        c16 = cast_cache(cache, jnp.bfloat16)
        if pack:
            c16 = pack_cache(c16)
        got = model.apply(params, c16, pts, cc, bc, method=SIFNet.query)[-1]
        for k in ref:
            np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                       atol=5e-2, err_msg=f"{k} pack={pack}")
