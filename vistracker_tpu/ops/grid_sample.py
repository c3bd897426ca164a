"""Pixel-aligned feature sampling (grid_sample equivalent) for TPU.

Parity target: /root/reference/model/geometry.py:index — i.e.
torch.nn.functional.grid_sample(feat, uv[B,N,1,2], align_corners=True,
mode='bilinear', padding_mode='zeros') evaluated at N sparse points.

Instead of translating the CUDA gather kernel, the sample is expressed as two
flat gathers + bilinear blend; XLA lowers the gather to an efficient TPU
dynamic-gather and fuses the arithmetic. Channels-last layout (B, H, W, C) is
used natively (TPU conv layout); a channels-first wrapper is provided for
call sites that mirror the reference's (B, C, H, W) tensors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_points(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample of sparse points from a feature map.

    Args:
      feat: (B, H, W, C) feature maps.
      uv:   (B, N, 2) normalized coords in [-1, 1]; uv[..., 0] indexes W (x),
            uv[..., 1] indexes H (y) — same as torch grid_sample.

    Returns:
      (B, N, C) features; points outside [-1, 1] blend with zeros
      (padding_mode='zeros', align_corners=True).
    """
    B, H, W, C = feat.shape
    N = uv.shape[1]

    # align_corners=True: -1 -> 0, +1 -> size-1
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi):
        """Gather feat[b, yi, xi, :] with zero padding outside the image."""
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = feat.reshape(B, H * W, C)
        idx = yc * W + xc  # (B, N)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, C)
        return g * valid[..., None].astype(feat.dtype)

    f00 = corner(y0i, x0i)
    f01 = corner(y0i, x0i + 1)
    f10 = corner(y0i + 1, x0i)
    f11 = corner(y0i + 1, x0i + 1)

    wx = wx[..., None].astype(feat.dtype)
    wy = wy[..., None].astype(feat.dtype)
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_points_nchw(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """(B, C, H, W) + (B, N, 2) -> (B, C, N), mirroring the reference layout."""
    out = grid_sample_points(jnp.transpose(feat, (0, 2, 3, 1)), uv)
    return jnp.transpose(out, (0, 2, 1))
