"""Nearest-neighbor and Chamfer distances as tiled MXU matmuls.

Replaces the reference's CUDA KNN (pytorch3d knn_points in
lib_smpl/torch_functions.py:79-93, used for contact losses and eval) and the
sklearn kd-tree chamfer (recon/eval/chamfer_distance.py). On TPU a
brute-force ||x||^2 + ||y||^2 - 2 x.y pairwise distance is matmul-shaped
work that the MXU eats; point sets here are <= ~20k so an O(N*M) sweep,
tiled over the query axis to bound live memory, beats any tree.

All functions support validity masks so fixed-budget (shape-static) point
sets with padding work under jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e10


def _pairwise_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """(N, 3), (M, 3) -> (N, M) squared distances (fp32 accumulate)."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)          # (N, 1)
    yy = jnp.sum(y * y, axis=-1, keepdims=True).T        # (1, M)
    xy = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(xx + yy - 2.0 * xy, 0.0)


@functools.partial(jax.jit, static_argnames=("chunk", "with_idx"))
def nn_distances(x: jax.Array, y: jax.Array, y_mask: jax.Array | None = None,
                 chunk: int = 2048, with_idx: bool = False):
    """For each x point, the squared distance to (and index of) its nearest
    y point. x: (N, 3), y: (M, 3), y_mask: (M,) bool (False = padding).

    Tiled over N so peak memory is chunk*M; returns (N,) [+ (N,) int32].
    """
    N = x.shape[0]
    pad = (-N) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xt = xp.reshape(-1, chunk, 3)

    def tile(xc):
        d = _pairwise_sqdist(xc, y)                      # (chunk, M)
        if y_mask is not None:
            d = jnp.where(y_mask[None, :], d, _BIG)
        if with_idx:
            idx = jnp.argmin(d, axis=-1)
            return jnp.min(d, axis=-1), idx.astype(jnp.int32)
        return jnp.min(d, axis=-1), jnp.zeros(xc.shape[0], jnp.int32)

    dists, idxs = jax.lax.map(tile, xt)
    dists = dists.reshape(-1)[:N]
    if with_idx:
        return dists, idxs.reshape(-1)[:N]
    return dists


def chamfer_distance(s1: jax.Array, s2: jax.Array,
                     mask1: jax.Array | None = None,
                     mask2: jax.Array | None = None,
                     w1: float = 1.0, w2: float = 1.0,
                     sqrt: bool = True, chunk: int = 2048) -> jax.Array:
    """Bidirectional chamfer for batched clouds s1 (B, N, 3), s2 (B, M, 3).

    sqrt=True matches torch_functions.py:chamfer_distance (mean of sqrt
    squared-NN-distances in each direction, weighted sum) and the eval
    kd-tree version (l2 metric). Masks mark valid points. Returns (B,).
    """
    def one(x, y, mx, my):
        d12 = nn_distances(x, y, my, chunk=chunk)
        d21 = nn_distances(y, x, mx, chunk=chunk)
        if sqrt:
            d12, d21 = jnp.sqrt(d12), jnp.sqrt(d21)
        if mx is not None:
            m1 = jnp.sum(d12 * mx) / jnp.maximum(jnp.sum(mx), 1.0)
        else:
            m1 = d12.mean()
        if my is not None:
            m2 = jnp.sum(d21 * my) / jnp.maximum(jnp.sum(my), 1.0)
        else:
            m2 = d21.mean()
        return m1 * w1 + m2 * w2

    if mask1 is None and mask2 is None:
        return jax.vmap(lambda x, y: one(x, y, None, None))(s1, s2)
    mask1 = jnp.ones(s1.shape[:2], s1.dtype) if mask1 is None else mask1.astype(s1.dtype)
    mask2 = jnp.ones(s2.shape[:2], s2.dtype) if mask2 is None else mask2.astype(s2.dtype)
    return jax.vmap(one)(s1, s2, mask1, mask2)


def one_way_sq(src: jax.Array, tgt: jax.Array,
               tgt_mask: jax.Array | None = None,
               chunk: int = 2048) -> jax.Array:
    """Batched one-way squared NN distance: (B, N, 3), (B, M, 3) -> (B, N)."""
    if tgt_mask is None:
        return jax.vmap(lambda x, y: nn_distances(x, y, chunk=chunk))(src, tgt)
    return jax.vmap(lambda x, y, m: nn_distances(x, y, m, chunk=chunk))(
        src, tgt, tgt_mask)


@functools.partial(jax.jit, static_argnames=("chunk",))
def label_compatible_nn(x: jax.Array, labels_x: jax.Array, y: jax.Array,
                        labels_y: jax.Array, y_valid: jax.Array,
                        chunk: int = 1024) -> jax.Array:
    """Min squared distance from each x point to y points of the SAME label.

    x (N, 3), labels_x (N,) int; y (M, 3), labels_y (M,) int;
    y_valid (M,) bool. Returns (N,) — _BIG where no compatible point exists.

    This is the contact-pairing primitive (recon_fit_trivis_full.py:
    compute_contact_loss pairs human/object contact points per SMPL part
    with per-part chamfer): one masked NN sweep instead of a python loop
    over parts and examples.
    """
    N = x.shape[0]
    pad = (-N) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    lp = jnp.pad(labels_x, (0, pad))
    xt = xp.reshape(-1, chunk, 3)
    lt = lp.reshape(-1, chunk)

    # checkpointed: without remat the backward keeps every tile's (chunk, M)
    # distance matrix alive at once (GBs per optimizer step at batch size);
    # recomputing a tile is one matmul
    @jax.checkpoint
    def tile(args):
        xc, lc = args
        d = _pairwise_sqdist(xc, y)                       # (chunk, M)
        compat = (lc[:, None] == labels_y[None, :]) & y_valid[None, :]
        d = jnp.where(compat, d, _BIG)
        return jnp.min(d, axis=-1)

    dists = jax.lax.map(tile, (xt, lt))
    return dists.reshape(-1)[:N]


def nearest_index(src: jax.Array, tgt: jax.Array,
                  tgt_mask: jax.Array | None = None,
                  chunk: int = 2048):
    """Batched nearest-neighbor indices: returns (dists_sq (B,N), idx (B,N))."""
    def one(x, y, m):
        return nn_distances(x, y, m, chunk=chunk, with_idx=True)
    if tgt_mask is None:
        return jax.vmap(lambda x, y: one(x, y, None))(src, tgt)
    return jax.vmap(one)(src, tgt, tgt_mask)
