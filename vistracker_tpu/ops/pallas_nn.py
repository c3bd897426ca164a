"""Pallas TPU kernel for nearest-neighbor (min-distance) reductions.

The chamfer/contact losses reduce a pairwise distance matrix that is never
needed in full: for each x point, min over y of ||x - y||^2. The XLA path
(ops/chamfer.py) tiles via lax.map but still round-trips (chunk, M) distance
blocks through HBM between the matmul and the min. This kernel fuses the
-2*x.y matmul (MXU) with the norm terms and the running min (VPU) entirely
in VMEM: one grid cell computes a (TX, TY) distance tile and folds it into
the per-row minimum accumulator, so HBM traffic is O(N + M), not O(N*M).

Label-compatible variant: adds a per-point integer label and masks
incompatible pairs with +inf before the min — the contact-pairing primitive
of the joint optimizer (fit/joint.py:contact_loss).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def _nn_kernel(x_ref, y_ref, yy_ref, ymask_ref, out_ref):
    """Grid: (num_x_tiles, num_y_tiles). Row tile of x vs column tile of y.

    x (TX, 3), y (TY, 3) [block of the padded cloud], yy (1, TY) squared
    norms, ymask (1, TY) 1.0=valid. out (TX,): running min across j-tiles.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, _BIG)

    x = x_ref[:]                                      # (TX, 3)
    y = y_ref[:]                                      # (TY, 3)
    xx = jnp.sum(x * x, axis=-1, keepdims=True)       # (TX, 1)
    # full fp32 matmul precision: bf16-rounded products shift NN distances
    # by ~1e-1 at meter scale, enough to flip argmins
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # MXU
    d = jnp.maximum(xx + yy_ref[:] - 2.0 * xy, 0.0)   # (TX, TY)
    d = jnp.where(ymask_ref[:] > 0.5, d, _BIG)
    out_ref[:] = jnp.minimum(out_ref[:], jnp.min(d, axis=-1))


@functools.partial(jax.jit, static_argnames=("tx", "ty", "interpret"))
def nn_min_sqdist_pallas(x: jax.Array, y: jax.Array,
                         y_mask: jax.Array | None = None,
                         tx: int = 1024, ty: int = 512,
                         interpret: bool = False) -> jax.Array:
    """(N, 3), (M, 3) -> (N,) min squared distance, Pallas TPU kernel.

    Pads both clouds to tile multiples; padded y rows are masked out,
    padded x rows are discarded from the output. tx must be a multiple of
    1024 (XLA's 1-D f32 tiling) so the output block layout matches Mosaic.
    """
    assert tx % 1024 == 0, "tx must be a multiple of 1024"
    N, M = x.shape[0], y.shape[0]
    pn, pm = (-N) % tx, (-M) % ty
    xp = jnp.pad(x.astype(jnp.float32), ((0, pn), (0, 0)))
    yp = jnp.pad(y.astype(jnp.float32), ((0, pm), (0, 0)))
    mask = jnp.ones((M,), jnp.float32) if y_mask is None \
        else y_mask.astype(jnp.float32)
    maskp = jnp.pad(mask, (0, pm))[None, :]           # (1, M')
    yy = jnp.sum(yp * yp, axis=-1)[None, :]           # (1, M')

    grid = (xp.shape[0] // tx, yp.shape[0] // ty)
    out = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tx, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((ty, 3), lambda i, j: (j, 0)),
            pl.BlockSpec((1, ty), lambda i, j: (0, j)),
            pl.BlockSpec((1, ty), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tx,), lambda i, j: (i,)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0],), jnp.float32),
        interpret=interpret,
    )(xp, yp, yy, maskp)
    return out[:N]


def _labelnn_kernel(x_ref, lx_ref, y_ref, yy_ref, ly_ref, ymask_ref,
                    min_ref, idx_ref):
    """Label-compatible NN with argmin. Grid: (B, num_x_tiles, num_y_tiles)
    — the frame/batch axis lives IN THE GRID (Mosaic's block-tiling rules
    reject the squeezed batch dim a vmap-of-pallas_call would introduce in
    the last-two block positions).

    Refs (batch squeezed by the BlockSpecs): x (TX, 3), lx (TX, 1) float
    label per x row; y (TY, 3), yy (1, TY), ly (1, TY), ymask (1, TY).
    min (TX, 1): running min; idx (TX, 1): global y index of the running
    argmin, kept as float32 (exact to 2^24 — clouds here are ~1e4 points).
    First-occurrence tie-breaking both within a tile (min over matching
    columns) and across tiles (strict <), matching jnp.argmin semantics.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        min_ref[:] = jnp.full_like(min_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    x = x_ref[:]                                      # (TX, 3)
    y = y_ref[:]                                      # (TY, 3)
    xx = jnp.sum(x * x, axis=-1, keepdims=True)       # (TX, 1)
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # MXU
    d = jnp.maximum(xx + yy_ref[:] - 2.0 * xy, 0.0)   # (TX, TY)
    compat = (ymask_ref[:] > 0.5) & \
        (jnp.abs(ly_ref[:] - lx_ref[:]) < 0.5)        # (TX, TY)
    d = jnp.where(compat, d, _BIG)
    m = jnp.min(d, axis=-1, keepdims=True)            # (TX, 1)
    ty = d.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1).astype(jnp.float32)
    li = jnp.min(jnp.where(d <= m, col, jnp.float32(2 * ty)),
                 axis=-1, keepdims=True)              # (TX, 1) local argmin
    gi = li + jnp.float32(ty) * j
    prev = min_ref[:]
    better = m < prev
    min_ref[:] = jnp.where(better, m, prev)
    idx_ref[:] = jnp.where(better, gi, idx_ref[:])


def _labelnn_call(x, labels_x, y, labels_y, y_valid, tx, ty, interpret):
    """Padded batched pallas_call: x (B, N, 3), labels_x (B, N), y (B, M,
    3), labels_y (B, M), y_valid (B, M) -> (min_sqdist (B, N), argmin_idx
    (B, N) i32)."""
    assert tx % 1024 == 0, "tx must be a multiple of 1024"
    B, N, M = x.shape[0], x.shape[1], y.shape[1]
    pn, pm = (-N) % tx, (-M) % ty
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pn), (0, 0)))
    # padded labels: x rows get -1, y rows -2 — never compatible with
    # anything (real labels are >= 0), and padded y is masked anyway
    lxp = jnp.pad(labels_x.astype(jnp.float32), ((0, 0), (0, pn)),
                  constant_values=-1.0)[..., None]    # (B, N', 1)
    yp = jnp.pad(y.astype(jnp.float32), ((0, 0), (0, pm), (0, 0)))
    lyp = jnp.pad(labels_y.astype(jnp.float32), ((0, 0), (0, pm)),
                  constant_values=-2.0)[:, None, :]   # (B, 1, M')
    maskp = jnp.pad(y_valid.astype(jnp.float32),
                    ((0, 0), (0, pm)))[:, None, :]    # (B, 1, M')
    yy = jnp.sum(yp * yp, axis=-1)[:, None, :]        # (B, 1, M')

    grid = (B, xp.shape[1] // tx, yp.shape[1] // ty)
    dist, idx = pl.pallas_call(
        _labelnn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, tx, 3), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((None, tx, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((None, ty, 3), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((None, 1, ty), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((None, 1, ty), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((None, 1, ty), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[pl.BlockSpec((None, tx, 1), lambda b, i, j: (b, i, 0)),
                   pl.BlockSpec((None, tx, 1), lambda b, i, j: (b, i, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((B, xp.shape[1], 1), jnp.float32),
            jax.ShapeDtypeStruct((B, xp.shape[1], 1), jnp.float32)],
        interpret=interpret,
    )(xp, lxp, yp, yy, lyp, maskp)
    idx = jnp.clip(idx[:, :N, 0].astype(jnp.int32), 0, M - 1)
    return dist[:, :N, 0], idx


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def label_nn_pallas_batched(x, labels_x, y, labels_y, y_valid,
                            tx=1024, ty=512, interpret=False):
    """Batched Pallas twin of ops.chamfer.label_compatible_nn: (B, N) min
    squared distance from each x point to same-label valid y points of the
    same batch element (_BIG where no compatible point exists).

    Differentiable w.r.t. x and y via a custom VJP from the saved argmin:
    backward is an O(N) gather/scatter — no (N, M) distance matrix is
    ever materialized, forward or backward (the XLA path recomputes the
    matrix tile-by-tile under jax.checkpoint). Gradient note: on EXACT
    distance ties the XLA path's jnp.min splits the cotangent between the
    tied y points while this picks the first — measure-zero for point
    clouds in general position.
    """
    d, _ = _labelnn_call(x, labels_x, y, labels_y, y_valid, tx, ty,
                         interpret)
    return d


def _labelnn_fwd(x, labels_x, y, labels_y, y_valid, tx, ty, interpret):
    d, idx = _labelnn_call(x, labels_x, y, labels_y, y_valid, tx, ty,
                           interpret)
    return d, (x, y, idx, d < 0.5 * _BIG)


def _labelnn_bwd(tx, ty, interpret, res, g):
    x, y, idx, valid = res
    yn = jnp.take_along_axis(y, idx[..., None], axis=1)   # (B, N, 3)
    diff = 2.0 * (x - yn) * (g * valid.astype(g.dtype))[..., None]
    dx = diff
    dy = jax.vmap(lambda yz, ii, dd: yz.at[ii].add(-dd))(
        jnp.zeros_like(y), idx, diff)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return dx, f0(x[..., 0]), dy, f0(y[..., 0]), f0(y[..., 0])


label_nn_pallas_batched.defvjp(_labelnn_fwd, _labelnn_bwd)


def label_compatible_nn_pallas(x, labels_x, y, labels_y, y_valid,
                               tx=1024, ty=512, interpret=False):
    """Unbatched convenience wrapper: (N, 3) etc. -> (N,)."""
    return label_nn_pallas_batched(x[None], labels_x[None], y[None],
                                   labels_y[None], y_valid[None],
                                   tx, ty, interpret)[0]


def chamfer_pallas(s1: jax.Array, s2: jax.Array, sqrt: bool = True,
                   interpret: bool = False) -> jax.Array:
    """Bidirectional chamfer via the Pallas kernel, batched: (B, N, 3),
    (B, M, 3) -> (B,)."""
    def one(x, y):
        d12 = nn_min_sqdist_pallas(x, y, interpret=interpret)
        d21 = nn_min_sqdist_pallas(y, x, interpret=interpret)
        if sqrt:
            d12, d21 = jnp.sqrt(d12), jnp.sqrt(d21)
        return d12.mean() + d21.mean()
    return jax.vmap(one)(s1, s2)
