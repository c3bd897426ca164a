"""Interpolation ops with torch-compatible semantics, as MXU matmuls.

The hourglass decoder upsamples with F.interpolate(scale_factor=2,
mode='bicubic', align_corners=True) (reference model/HGFilters.py:47), whose
sampling grid differs from jax.image.resize (half-pixel / align_corners=False).
Pretrained-weight parity requires the exact torch grid.

TPU-first design: because the grid is static, each spatial axis's
interpolation is a fixed (out, in) banded matrix. We materialize it once at
trace time (numpy) and apply it as two dense matmuls — out = W_h @ x @ W_w^T —
which XLA tiles straight onto the MXU. For feature maps up to a few hundred
pixels this beats a gather-based kernel and needs no custom Pallas.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel, torch uses a = -0.75."""
    t = np.abs(t)
    t2 = t * t
    t3 = t2 * t
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int, mode: str,
                   align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix with border clamping."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if align_corners and out_size > 1:
        coords = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        coords = (np.arange(out_size) + 0.5) * scale - 0.5
    if mode == "bicubic":
        i0 = np.floor(coords).astype(np.int64)
        frac = coords - i0
        for k in range(-1, 3):
            w = _cubic_kernel(frac - k)
            idx = np.clip(i0 + k, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), idx), w)
    elif mode == "bilinear":
        i0 = np.floor(coords).astype(np.int64)
        frac = coords - i0
        for k, w in ((0, 1.0 - frac), (1, frac)):
            idx = np.clip(i0 + k, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), idx), w)
    elif mode == "nearest":
        # torch 'nearest' truncates the source index: floor(i * in/out)
        idx = np.clip(np.arange(out_size) * in_size // out_size, 0,
                      in_size - 1)
        m[np.arange(out_size), idx] = 1.0
    else:
        raise ValueError(f"unknown mode {mode}")
    return m.astype(np.float32)


def interpolate2d(x: jax.Array, out_hw: tuple[int, int], mode: str = "bicubic",
                  align_corners: bool = True) -> jax.Array:
    """Resize (..., H, W, C) images to out_hw with torch-matching grids.

    Applied as two matmuls over the spatial axes (MXU-shaped); all leading
    axes are batch.
    """
    H, W, C = x.shape[-3:]
    out_h, out_w = out_hw
    wh = jnp.asarray(_interp_matrix(H, out_h, mode, align_corners), x.dtype)
    ww = jnp.asarray(_interp_matrix(W, out_w, mode, align_corners), x.dtype)
    # (..., H, W, C): contract H then W.
    # interpolation weights must not be downcast (default matmul precision on
    # TPU is bf16); the matrices are tiny so fp32 accumulation is free here
    y = jnp.einsum("oh,...hwc->...owc", wh, x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...owc->...opc", ww, y, precision=jax.lax.Precision.HIGHEST)
    return y


def upsample2x_bicubic(x: jax.Array) -> jax.Array:
    """F.interpolate(x, scale_factor=2, mode='bicubic', align_corners=True)
    for channels-last (..., H, W, C) tensors."""
    H, W = x.shape[-3], x.shape[-2]
    return interpolate2d(x, (2 * H, 2 * W), "bicubic", True)


def avg_pool2x(x: jax.Array) -> jax.Array:
    """F.avg_pool2d(x, 2, stride=2) for channels-last (..., H, W, C)."""
    H, W, C = x.shape[-3:]
    lead = x.shape[:-3]
    y = x.reshape(lead + (H // 2, 2, W // 2, 2, C))
    return y.mean(axis=(-4, -2))
