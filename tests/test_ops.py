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
