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

    # blend in the promoted dtype: a bf16 cache (halved gather bandwidth —
    # the gather itself reads bf16 rows) still blends in fp32 so the
    # interpolation weights are not mantissa-truncated
    bdt = jnp.promote_types(feat.dtype, uv.dtype)

    def corner(yi, xi):
        """Gather feat[b, yi, xi, :] with zero padding outside the image."""
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = feat.reshape(B, H * W, C)
        idx = yc * W + xc  # (B, N)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, C)
        return g.astype(bdt) * valid[..., None].astype(bdt)

    f00 = corner(y0i, x0i)
    f01 = corner(y0i, x0i + 1)
    f10 = corner(y0i + 1, x0i)
    f11 = corner(y0i + 1, x0i + 1)

    wx = wx[..., None].astype(bdt)
    wy = wy[..., None].astype(bdt)
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_points_nchw(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """(B, C, H, W) + (B, N, 2) -> (B, C, N), mirroring the reference layout."""
    out = grid_sample_points(jnp.transpose(feat, (0, 2, 3, 1)), uv)
    return jnp.transpose(out, (0, 2, 1))


def pack_corners(feat: jax.Array) -> jax.Array:
    """Pack each position's 2x2 bilinear neighborhood into one row.

    (B, H, W, C) -> (B, H, W, 4C) with channels [f(y,x), f(y,x+1),
    f(y+1,x), f(y+1,x+1)] (zero beyond the border). TPU gathers are
    row-count bound with weak width dependence (PERF_NOTES.md), so sampling
    from a packed map needs ONE gather per point instead of four — ~2x on
    the query-path gather floor at 4x cache memory.
    """
    B, H, W, C = feat.shape
    p = jnp.pad(feat, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return jnp.concatenate([p[:, :H, :W], p[:, :H, 1:W + 1],
                            p[:, 1:H + 1, :W], p[:, 1:H + 1, 1:W + 1]], -1)


def grid_sample_points_packed(packed: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample from a pack_corners() map: one gather per point.

    packed: (B, H, W, 4C); uv: (B, N, 2) in [-1, 1]. Matches
    grid_sample_points(feat, uv) exactly (align_corners=True, zero pad).
    """
    B, H, W, C4 = packed.shape
    C = C4 // 4
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # blend in the promoted dtype (see grid_sample_points): the single
    # gather reads packed.dtype rows — that is the bandwidth term — and the
    # bilinear arithmetic runs at uv precision
    bdt = jnp.promote_types(packed.dtype, uv.dtype)
    wx = (x - x0)[..., None].astype(bdt)
    wy = (y - y0)[..., None].astype(bdt)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    base_valid = (x0i >= -1) & (x0i < W) & (y0i >= -1) & (y0i < H)
    xc = jnp.clip(x0i, 0, W - 1)
    yc = jnp.clip(y0i, 0, H - 1)
    flat = packed.reshape(B, H * W, C4)
    rows = jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)
    rows = rows.astype(bdt) * base_valid[..., None].astype(bdt)
    f00, f01, f10, f11 = jnp.split(rows, 4, axis=-1)

    # When x0 == -1 the gather was clipped to x=0, so the packed row is
    # centered one column right of the true base: corner (i, j) lives in
    # slot (i - sy, j - sx). Out-of-range slots correspond to corners whose
    # weight is already zero (vx0/vy0), so their value is irrelevant.
    sx = (x0i < 0)[..., None]
    sy = (y0i < 0)[..., None]
    dt = bdt
    vx0 = ((x0i >= 0) & (x0i < W))[..., None].astype(dt)
    vx1 = ((x0i + 1 >= 0) & (x0i + 1 < W))[..., None].astype(dt)
    vy0 = ((y0i >= 0) & (y0i < H))[..., None].astype(dt)
    vy1 = ((y0i + 1 >= 0) & (y0i + 1 < H))[..., None].astype(dt)
    c00 = f00
    c01 = jnp.where(sx, f00, f01)
    c10 = jnp.where(sy, f00, f10)
    c11 = jnp.where(sy, jnp.where(sx, f00, f01),
                    jnp.where(sx, f10, f11))

    w00 = (1 - wx) * (1 - wy) * vx0 * vy0
    w01 = wx * (1 - wy) * vx1 * vy0
    w10 = (1 - wx) * wy * vx0 * vy1
    w11 = wx * wy * vx1 * vy1
    return c00 * w00 + c01 * w01 + c10 * w10 + c11 * w11
