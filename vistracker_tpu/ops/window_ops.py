"""Sliding-window batching and overlap-averaged reconstruction.

Parity targets: smoothnet/smooth_base.py:45-72 (sequence -> overlapping
windows) and smoothnet/utils/utils.py:slide_window_to_sequence /
clips2seq_fast (windows -> sequence by averaging every window that covers a
frame).

TPU-first: the scatter-mean back to the sequence is a segment_sum over
static indices — one fused XLA scatter instead of the reference's python
loop over window offsets.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def seq_to_windows(x: jax.Array, window: int, step: int = 1) -> jax.Array:
    """(L, D) -> (N, window, D) overlapping windows, N = floor((L-window)/step)+1.

    L must be >= window (callers pad short sequences, matching
    smooth_base.py which repeats the last frame).
    """
    L = x.shape[0]
    n = (L - window) // step + 1
    starts = np.arange(n) * step
    idx = starts[:, None] + np.arange(window)[None, :]  # (N, W) static
    return x[jnp.asarray(idx)]


def windows_to_seq(w: jax.Array, step: int, out_len: int | None = None) -> jax.Array:
    """(N, window, D) -> (L, D): mean over all windows covering each frame.

    L = (N-1)*step + window. Implemented as a single segment-sum scatter.
    """
    n, window, d = w.shape
    L = (n - 1) * step + window
    starts = np.arange(n) * step
    idx = (starts[:, None] + np.arange(window)[None, :]).reshape(-1)  # (N*W,)
    flat = w.reshape(n * window, d)
    total = jax.ops.segment_sum(flat, jnp.asarray(idx), num_segments=L)
    count = np.bincount(idx, minlength=L).astype(np.float32)
    out = total / jnp.asarray(count)[:, None]
    if out_len is not None:
        out = out[:out_len]
    return out


def pad_to_window(x: np.ndarray, window: int) -> tuple[np.ndarray, int]:
    """Repeat the last frame so len >= window; returns (padded, orig_len)."""
    L = x.shape[0]
    if L >= window:
        return x, L
    pad = np.repeat(x[-1:], window - L, axis=0)
    return np.concatenate([x, pad], axis=0), L
