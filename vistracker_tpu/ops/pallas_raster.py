"""Fused Pallas TPU kernel for the differentiable soft silhouette.

The XLA path (ops/rasterizer.py:soft_silhouette) evaluates F x P edge
functions as chunked K=3 einsums with a checkpointed scan: each chunk
round-trips (chunk, 3, P) edge values through HBM between the matmul and
the min/sigmoid/max chain, and reverse-mode recomputes every chunk. One
value_and_grad of the sil-phase loss at release sizes (B=8, 2.5k faces,
256^2) measures ~237 ms, dominating the stage-6 object phases
(scripts/bench_sil_phase.py; PERF_NOTES round 2).

This kernel keeps everything in VMEM: a (face-block, row-strip) cell
computes e_i = a*px + b*py + c for the 3 edges (VPU broadcast FMA),
min -> sigmoid -> running max, with HBM traffic O(F + P) instead of
O(F*P). The backward pass recomputes the edge values per tile, selects
the winning faces per pixel by comparing with the saved forward output,
and reduces the per-edge cotangents against [px, py, 1] over the tile.

Layout notes (Mosaic rejects general vector shape casts, e.g. the
1D->3D reshape a `c[:, None, None]` broadcast emits):
  * every in-kernel tensor is rank 2 — coefficients live as (fblk, 9)
    so a lane slice `ct[:, k:k+1]` yields a native (fblk, 1) column;
  * pixel rows are processed as (fblk, size) tiles, one image row per
    step of a STATIC _RBLK-row unroll, with keepdims reductions and 2D
    concatenates — no reshapes anywhere.

Gradient conventions vs the XLA path:
  * min over the 3 edges: cotangent split equally among exact ties
    (matches jnp.min's vjp).
  * max over faces: cotangent split equally among all faces tied at the
    pixel max (matches jnp.max's vjp). Ties are NOT measure-zero here:
    orientation correction makes fold-adjacent faces (one front-, one
    back-facing) share exact edge distances over whole pixel regions, so
    the backward runs an extra counting pass over faces and divides by
    the per-pixel tie count. (The XLA path's chunked scan splits ties
    that span chunk boundaries by a 0.5 cascade instead — chunk-dependent
    and non-canonical; with a single chunk the conventions coincide.)

Invalid faces (degenerate, or padding to the face-block multiple) are
encoded as coefficient rows [0, 0, -BIG]: their edge value is -BIG, the
sigmoid underflows to 0 (never the max unless everything is 0), and the
gradient factor p(1-p) vanishes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BIG = 1e9
_FBLK = 128  # faces per grid cell
_RBLK = 8    # image rows per grid cell (static in-kernel unroll)


def _row_tiles(r_idx, ct, size: int, sigma: float):
    """Yield (r, px, p, e0, e1, e2, m) for each of the _RBLK rows of row
    strip r_idx. ct is the (fblk, 9) coefficient tile; px is (1, size);
    everything else (fblk, size). Shared by all three kernels so forward
    and backward values match bitwise."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)
    scale = 2.0 / (size - 1)
    px = col.astype(jnp.float32) * scale - 1.0
    for r in range(_RBLK):
        py = (r_idx * _RBLK + r).astype(jnp.float32) * scale - 1.0

        def edge(j):
            a = ct[:, 3 * j + 0:3 * j + 1]   # (fblk, 1)
            b = ct[:, 3 * j + 1:3 * j + 2]
            c = ct[:, 3 * j + 2:3 * j + 3]
            return a * px + (b * py + c)      # (fblk, size)

        e0, e1, e2 = edge(0), edge(1), edge(2)
        m = jnp.minimum(jnp.minimum(e0, e1), e2)
        p = jax.nn.sigmoid(m * (1.0 / sigma))
        yield r, px, p, e0, e1, e2, m


def _fwd_kernel(c_ref, out_ref, *, size: int, sigma: float):
    """Grid (B, n_rstrips, n_fblocks); out (1, _RBLK, size) revisited
    over f."""
    r_idx, f_idx = pl.program_id(1), pl.program_id(2)

    @pl.when(f_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = [jnp.max(p, axis=0, keepdims=True)           # (1, size)
            for _, _, p, *_ in _row_tiles(r_idx, c_ref[0], size, sigma)]
    out_ref[0] = jnp.maximum(out_ref[0], jnp.concatenate(rows, axis=0))


def _cnt_kernel(c_ref, sil_ref, cnt_ref, *, size: int, sigma: float):
    """Per-pixel count of faces tied at the max (jnp.max vjp equal-split).
    Grid (B, n_rstrips, n_fblocks); cnt (1, _RBLK, size) revisited
    over f."""
    r_idx, f_idx = pl.program_id(1), pl.program_id(2)

    @pl.when(f_idx == 0)
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    rows = []
    for r, _, p, *_ in _row_tiles(r_idx, c_ref[0], size, sigma):
        win = (p == sil_ref[0, r:r + 1, :]).astype(jnp.float32)
        rows.append(jnp.sum(win, axis=0, keepdims=True))  # (1, size)
    cnt_ref[0] = cnt_ref[0] + jnp.concatenate(rows, axis=0)


def _bwd_kernel(c_ref, sil_ref, g_ref, cnt_ref, dc_ref, *, size: int,
                sigma: float):
    """Grid (B, n_fblocks, n_rstrips); dc (1, fblk, 9) revisited over r."""
    r_idx = pl.program_id(2)

    @pl.when(r_idx == 0)
    def _():
        dc_ref[:] = jnp.zeros_like(dc_ref)

    acc = [jnp.zeros((_FBLK, 1), jnp.float32) for _ in range(9)]
    for r, px, p, e0, e1, e2, m in _row_tiles(r_idx, c_ref[0], size,
                                              sigma):
        # winning faces: recomputed p bit-matches the forward (identical
        # ops); equal split among faces tied at the max (cnt >= 1
        # wherever win != 0)
        win = (p == sil_ref[0, r:r + 1, :]).astype(jnp.float32)
        win = win / jnp.maximum(cnt_ref[0, r:r + 1, :], 1.0)
        gm = g_ref[0, r:r + 1, :] * win * p * (1.0 - p) * (1.0 / sigma)
        # equal split among tied edges (jnp.min vjp convention)
        t0 = (e0 == m).astype(jnp.float32)
        t1 = (e1 == m).astype(jnp.float32)
        t2 = (e2 == m).astype(jnp.float32)
        gm = gm / (t0 + t1 + t2)
        py = (r_idx * _RBLK + r).astype(jnp.float32) * (2.0 / (size - 1)) \
            - 1.0
        for j, tj in enumerate((t0, t1, t2)):
            de = gm * tj                                  # (fblk, size)
            dsum = jnp.sum(de, axis=1, keepdims=True)     # (fblk, 1)
            acc[3 * j + 0] += jnp.sum(de * px, axis=1, keepdims=True)
            acc[3 * j + 1] += dsum * py
            acc[3 * j + 2] += dsum
    dc_ref[0] = dc_ref[0] + jnp.concatenate(acc, axis=1)  # (fblk, 9)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _sil_from_planes(cpl: jax.Array, size: int, sigma: float,
                     interpret: bool) -> jax.Array:
    """(B, F', 9) coefficient planes -> (B, size, size) silhouette."""
    return _sil_fwd(cpl, size, sigma, interpret)[0]


def _sil_fwd(cpl, size, sigma, interpret):
    B, F, _ = cpl.shape
    assert size % _RBLK == 0 and F % _FBLK == 0
    grid = (B, size // _RBLK, F // _FBLK)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, size=size, sigma=sigma),
        grid=grid,
        in_specs=[pl.BlockSpec((1, _FBLK, 9), lambda b, r, f: (b, f, 0))],
        out_specs=pl.BlockSpec((1, _RBLK, size), lambda b, r, f: (b, r, 0)),
        out_shape=jax.ShapeDtypeStruct((B, size, size), jnp.float32),
        interpret=interpret,
    )(cpl)
    return out, (cpl, out)


def _sil_bwd(size, sigma, interpret, res, g):
    cpl, sil = res
    B, F, _ = cpl.shape
    coeff_spec = pl.BlockSpec((1, _FBLK, 9), lambda b, r, f: (b, f, 0))
    img_spec = pl.BlockSpec((1, _RBLK, size), lambda b, r, f: (b, r, 0))
    cnt = pl.pallas_call(
        functools.partial(_cnt_kernel, size=size, sigma=sigma),
        grid=(B, size // _RBLK, F // _FBLK),
        in_specs=[coeff_spec, img_spec],
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct((B, size, size), jnp.float32),
        interpret=interpret,
    )(cpl, sil)
    coeff_spec_b = pl.BlockSpec((1, _FBLK, 9), lambda b, f, r: (b, f, 0))
    img_spec_b = pl.BlockSpec((1, _RBLK, size), lambda b, f, r: (b, r, 0))
    dc = pl.pallas_call(
        functools.partial(_bwd_kernel, size=size, sigma=sigma),
        grid=(B, F // _FBLK, size // _RBLK),
        in_specs=[coeff_spec_b, img_spec_b, img_spec_b, img_spec_b],
        out_specs=coeff_spec_b,
        out_shape=jax.ShapeDtypeStruct((B, F, 9), jnp.float32),
        interpret=interpret,
    )(cpl, sil, g.astype(jnp.float32), cnt)
    return (dc,)


_sil_from_planes.defvjp(_sil_fwd, _sil_bwd)


@functools.partial(jax.jit, static_argnames=("size", "sigma", "interpret"))
def soft_silhouette_batch(v2d: jax.Array, faces: jax.Array,
                          size: int = 256, sigma: float = 1.0 / 128.0,
                          interpret: bool = False) -> jax.Array:
    """Batched fused soft silhouette: (B, V, 2) NDC verts + (F, 3) faces
    -> (B, size, size) in [0, 1]. Same semantics (and matching gradients,
    see module docstring) as vmap(ops.rasterizer.soft_silhouette).

    The edge-coefficient construction stays in plain JAX (it is O(F), and
    its vjp chains the kernel's dcoeffs back to v2d automatically); only
    the O(F*P) evaluation runs in the kernel.
    """
    from .rasterizer import _edge_coeffs

    coeffs, lengths, orient, nondeg = jax.vmap(
        lambda v: _edge_coeffs(v, faces))(v2d)
    # signed distance to each edge line, inside-positive
    coeffs = coeffs * (orient[..., None, None] / lengths[..., None])
    # invalid faces -> e = -BIG everywhere (sigmoid 0, zero gradient)
    dead = jnp.asarray([0.0, 0.0, -_BIG], jnp.float32)
    coeffs = jnp.where(nondeg[..., None, None], coeffs,
                       jnp.broadcast_to(dead, coeffs.shape))
    B, F = coeffs.shape[:2]
    pad = (-F) % _FBLK
    cpl = coeffs.reshape(B, F, 9)                         # (B, F, 9)
    cpl = jnp.pad(cpl, ((0, 0), (0, pad), (0, 0)), constant_values=0.0)
    if pad:  # padded faces must read [0, 0, -BIG], not all-zero
        cpl = cpl.at[:, F:, 2::3].set(-_BIG)
    return _sil_from_planes(cpl, size, float(sigma), interpret)
