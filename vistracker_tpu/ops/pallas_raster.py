"""Fused Pallas TPU kernel for the differentiable soft silhouette.

The XLA path (ops/rasterizer.py:soft_silhouette) evaluates F x P edge
functions as chunked K=3 einsums with a checkpointed scan: each chunk
round-trips (chunk, 3, P) edge values through HBM between the matmul and
the min/sigmoid/max chain, and reverse-mode recomputes every chunk. One
value_and_grad of the sil-phase loss at release sizes (B=8, 2.5k faces,
256^2) measures ~237 ms, dominating the stage-6 object phases
(scripts/bench_sil_phase.py; PERF_NOTES round 2).

This kernel keeps everything in VMEM: a (face-block, row-strip) cell
computes e_i = a*px + b*py + c for the _NPL face planes (3 edges + 2
longest-edge caps; VPU broadcast FMA) and
min-reduces them, with HBM traffic O(F + P) instead of O(F*P). Three
algorithmic moves on top of the round-2 kernel (PERF_NOTES round 3):

  1. **Logit-space max.** sigmoid is monotone, so
     max_f sigmoid(m_f / s) == sigmoid(max_f m_f / s) — the kernel
     reduces the raw signed distances m and ONE sigmoid per *pixel* runs
     in XLA outside, instead of one per (face, pixel) pair per sweep.
     The sigmoid (and its p(1-p)/sigma backward factor) then come from
     plain autodiff of the outer expression; the kernels are sigma-free.
  2. **Fused tie counting.** The per-pixel count of faces tied at the
     max (needed for jnp.max's equal-split vjp — see gradient notes) is
     maintained incrementally in the forward sweep (new block max beats /
     ties / loses the running max), eliminating the round-2 backward's
     separate counting sweep: 3 F*P sweeps -> 2.
  3. **Row-strip face culling.** Faces are y-sorted per batch element so
     each 128-face block spans a narrow y band; a per-(strip, block)
     active mask (SMEM) skips cells where NO face can reach
     m >= -_CUT_SIGMAS * sigma anywhere in the strip — such faces
     contribute p < sigmoid(-_CUT_SIGMAS) ~ 2e-9 and p(1-p) ~ 2e-9,
     below fp32 noise for both the max and the gradient. The cull test
     is a conservative interval bound on m itself,
     max_strip m <= min_edges max_box (a x + b y + c)
                  = min_edges (|a| + b y* + c),
     NOT a bounding-box apron. The endpoint-cap planes
     (rasterizer._face_planes) clip the old unbounded sliver "ghost
     rays", which both fixes the rendered values and lets this bound
     cull the strips those rays used to keep live. Real template meshes
     (compact faces) cull 60-80% of cells; the giant-triangle
     parity-test scenes cull nothing and stay bit-exact.

Layout notes (Mosaic rejects general vector shape casts, e.g. the
1D->3D reshape a `c[:, None, None]` broadcast emits):
  * every in-kernel tensor is rank 2 — coefficients live as (fblk, _CW)
    so a lane slice `ct[:, k:k+1]` yields a native (fblk, 1) column;
  * pixel rows are processed as (fblk, size) tiles, one image row per
    step of a STATIC _RBLK-row unroll, with keepdims reductions and 2D
    concatenates — no reshapes anywhere;
  * the active mask is a small int32 (B*n_strips, n_fblocks) array
    resident in SMEM, read as a scalar per grid cell.

Gradient conventions vs the XLA path:
  * min over the _NPL planes: cotangent split equally among exact ties
    (matches jnp.min's vjp).
  * max over faces: cotangent split equally among all faces tied at the
    pixel max (matches jnp.max's vjp). Ties are NOT measure-zero here:
    orientation correction makes fold-adjacent faces (one front-, one
    back-facing) share exact edge distances over whole pixel regions, so
    the forward maintains a per-pixel tie count and the backward divides
    by it. Ties are detected in logit (m) space; the XLA path ties in
    p space. The two sets differ only where sigmoid saturates (distinct
    m rounding to the same p), and there p(1-p) == 0 exactly, so every
    face whose gradient is nonzero carries the same cotangent under both
    conventions.

Invalid faces (degenerate, or padding to the face-block multiple) are
encoded as coefficient rows [0, 0, -BIG]: their edge value is -BIG, the
outer sigmoid underflows to 0 (never the max unless everything is dead),
and the gradient factor p(1-p) vanishes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
_FBLK = 128  # faces per grid cell
_RBLK = 8    # image rows per grid cell (static in-kernel unroll)
_NPL = 5     # planes per face: 3 edge lines + 2 longest-edge endpoint
             # caps (ghost-ray clipping — rasterizer._face_planes)
_CW = 3 * _NPL  # coefficient columns per face
# faces farther than this many sigmas from every pixel of a row strip are
# culled: sigmoid(-20) ~ 2e-9 can move neither the max nor the gradient
# above fp32 noise.
_CUT_SIGMAS = 20.0


def _row_tiles(r_idx, ct, size: int):
    """Yield (r, px, planes, m) for each of the _RBLK rows of row strip
    r_idx. ct is the (fblk, 3 * _NPL) coefficient tile; px is (1, size);
    planes a tuple of _NPL (fblk, size) plane values, m their min. Shared
    by the forward and backward kernels so recomputed logits match the
    saved maxima bitwise."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)
    scale = 2.0 / (size - 1)
    px = col.astype(jnp.float32) * scale - 1.0
    for r in range(_RBLK):
        py = (r_idx * _RBLK + r).astype(jnp.float32) * scale - 1.0

        def plane(j):
            a = ct[:, 3 * j + 0:3 * j + 1]   # (fblk, 1)
            b = ct[:, 3 * j + 1:3 * j + 2]
            c = ct[:, 3 * j + 2:3 * j + 3]
            return a * px + (b * py + c)      # (fblk, size)

        es = tuple(plane(j) for j in range(_NPL))
        m = es[0]
        for e in es[1:]:
            m = jnp.minimum(m, e)
        yield r, px, es, m


def _fwd_kernel(mask_ref, c_ref, m_ref, cnt_ref, *, size: int,
                n_strips: int):
    """Grid (B, n_strips, n_fblocks); m/cnt (1, _RBLK, size) revisited
    over f. m is the per-pixel max logit, cnt the number of faces tied
    at it (jnp.max vjp equal-split denominator)."""
    b_idx, r_idx, f_idx = pl.program_id(0), pl.program_id(1), \
        pl.program_id(2)

    @pl.when(f_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -_BIG)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    @pl.when(mask_ref[b_idx * n_strips + r_idx, f_idx] != 0)
    def _():
        for r, _, _, m in _row_tiles(r_idx, c_ref[0], size):
            bm = jnp.max(m, axis=0, keepdims=True)            # (1, size)
            bc = jnp.sum((m == bm).astype(jnp.float32), axis=0,
                         keepdims=True)
            old_m = m_ref[0, r:r + 1, :]
            old_c = cnt_ref[0, r:r + 1, :]
            cnt_ref[0, r:r + 1, :] = jnp.where(
                bm > old_m, bc, jnp.where(bm == old_m, old_c + bc, old_c))
            m_ref[0, r:r + 1, :] = jnp.maximum(old_m, bm)


def _bwd_kernel(mask_ref, c_ref, m_ref, gw_ref, dc_ref, *, size: int,
                n_strips: int):
    """Grid (B, n_fblocks, n_strips); dc (1, fblk, _CW) revisited over r.
    gw is the per-pixel cotangent already divided by the tie count; the
    kernel recomputes the logits, selects winners by bitwise comparison
    with the saved max, splits equally among tied edges (jnp.min vjp)
    and reduces the per-edge cotangents against [px, py, 1]."""
    b_idx, f_idx, r_idx = pl.program_id(0), pl.program_id(1), \
        pl.program_id(2)

    @pl.when(r_idx == 0)
    def _():
        dc_ref[:] = jnp.zeros_like(dc_ref)

    @pl.when(mask_ref[b_idx * n_strips + r_idx, f_idx] != 0)
    def _():
        acc = [jnp.zeros((_FBLK, 1), jnp.float32) for _ in range(_CW)]
        for r, px, es, m in _row_tiles(r_idx, c_ref[0], size):
            win = (m == m_ref[0, r:r + 1, :]).astype(jnp.float32)
            gm = gw_ref[0, r:r + 1, :] * win
            # equal split among tied planes (jnp.min vjp convention)
            ts = [(e == m).astype(jnp.float32) for e in es]
            den = ts[0]
            for t in ts[1:]:
                den = den + t
            gm = gm / den
            py = (r_idx * _RBLK + r).astype(jnp.float32) \
                * (2.0 / (size - 1)) - 1.0
            for j, tj in enumerate(ts):
                de = gm * tj                                  # (fblk, size)
                dsum = jnp.sum(de, axis=1, keepdims=True)     # (fblk, 1)
                acc[3 * j + 0] += jnp.sum(de * px, axis=1, keepdims=True)
                acc[3 * j + 1] += dsum * py
                acc[3 * j + 2] += dsum
        dc_ref[0] = dc_ref[0] + jnp.concatenate(acc, axis=1)  # (fblk, _CW)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _max_logit(cpl: jax.Array, active: jax.Array, size: int,
               interpret: bool) -> jax.Array:
    """(B, F', _CW) coefficient planes + (B*n_strips, n_fblocks) int32
    active mask -> (B, size, size) per-pixel max signed distance."""
    return _ml_fwd(cpl, active, size, interpret)[0]


def _ml_fwd(cpl, active, size, interpret):
    B, F, _ = cpl.shape
    assert size % _RBLK == 0 and F % _FBLK == 0
    n_strips = size // _RBLK
    grid = (B, n_strips, F // _FBLK)
    img_spec = pl.BlockSpec((1, _RBLK, size), lambda b, r, f: (b, r, 0))
    m, cnt = pl.pallas_call(
        functools.partial(_fwd_kernel, size=size, n_strips=n_strips),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _FBLK, _CW), lambda b, r, f: (b, f, 0)),
        ],
        out_specs=[img_spec, img_spec],
        out_shape=[jax.ShapeDtypeStruct((B, size, size), jnp.float32),
                   jax.ShapeDtypeStruct((B, size, size), jnp.float32)],
        interpret=interpret,
    )(active, cpl)
    return m, (cpl, active, m, cnt)


def _ml_bwd(size, interpret, res, g):
    cpl, active, m, cnt = res
    B, F, _ = cpl.shape
    n_strips = size // _RBLK
    # equal split among faces tied at the max (cnt >= 1 wherever a
    # winner exists)
    gw = g.astype(jnp.float32) / jnp.maximum(cnt, 1.0)
    coeff_spec_b = pl.BlockSpec((1, _FBLK, _CW),
                                lambda b, f, r: (b, f, 0))
    img_spec_b = pl.BlockSpec((1, _RBLK, size), lambda b, f, r: (b, r, 0))
    dc = pl.pallas_call(
        functools.partial(_bwd_kernel, size=size, n_strips=n_strips),
        grid=(B, F // _FBLK, n_strips),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), coeff_spec_b,
                  img_spec_b, img_spec_b],
        out_specs=coeff_spec_b,
        out_shape=jax.ShapeDtypeStruct((B, F, _CW), jnp.float32),
        interpret=interpret,
    )(active, cpl, m, gw)
    return (dc, None)


_max_logit.defvjp(_ml_fwd, _ml_bwd)


def _strip_active(cpl: jax.Array, size: int, sigma: float) -> jax.Array:
    """Conservative per-(strip, face-block) liveness from the sorted,
    padded, normalized coefficient planes cpl (B, F', 9).

    For every face and row strip, bound the max of m = min_j e_j over
    each of _NSEG x-segments of the strip's pixel box
    [x in [xc-xh, xc+xh], y in [ylo, yhi]]:
        max_box m <= min_j max_box e_j
                   = min_j (a_j xc + |a_j| xh + max(b_j ylo, b_j yhi)
                            + c_j),
    then OR the segments (the x split tightens the concave-in-x
    min-of-linear bound, whose true max sits between corner values).
    A block is live for a strip iff ANY of its faces can reach
    m >= -_CUT_SIGMAS * sigma in ANY segment. Dead/padding rows
    ([0,0,-BIG]) bound to -BIG and never activate anything. Returns
    int32 (B * n_strips, n_fblk)."""
    B, Fp, _ = cpl.shape
    n_fblk, n_strips = Fp // _FBLK, size // _RBLK
    nseg = 8
    a = cpl[..., 0::3, None, None]                    # (B, F', 3, 1, 1)
    b = cpl[..., 1::3, None, None]
    c = cpl[..., 2::3, None, None]
    scale = 2.0 / (size - 1)
    s_lo = jnp.arange(n_strips, dtype=jnp.float32) * _RBLK * scale - 1.0
    s_hi = s_lo + (_RBLK - 1) * scale                 # (S,)
    xh = 1.0 / nseg
    xc = ((jnp.arange(nseg, dtype=jnp.float32) + 0.5) * 2.0 * xh
          - 1.0)[:, None]                             # (nseg, 1)
    ub_e = (a * xc + jnp.abs(a) * xh +
            jnp.maximum(b * s_lo, b * s_hi) + c)      # (B, F', 3, nseg, S)
    m_ub = jnp.min(ub_e, axis=2)                      # (B, F', nseg, S)
    live = jnp.any(m_ub >= -_CUT_SIGMAS * float(sigma), axis=2)
    live = jnp.any(live.reshape(B, n_fblk, _FBLK, n_strips), axis=2)
    return jnp.transpose(live, (0, 2, 1)).astype(jnp.int32) \
        .reshape(B * n_strips, n_fblk)


@functools.partial(jax.jit, static_argnames=("size", "sigma", "interpret"))
def soft_silhouette_batch(v2d: jax.Array, faces: jax.Array,
                          size: int = 256, sigma: float = 1.0 / 128.0,
                          interpret: bool = False) -> jax.Array:
    """Batched fused soft silhouette: (B, V, 2) NDC verts + (F, 3) faces
    -> (B, size, size) in [0, 1]. Same semantics (and matching gradients,
    see module docstring) as vmap(ops.rasterizer.soft_silhouette).

    The edge-coefficient construction, the y-sort + liveness bound for
    block culling and the final per-pixel sigmoid stay in plain JAX (all
    O(F) or O(P), and their vjps chain the kernel's dcoeffs back to v2d
    automatically); only the O(F*P) logit-max runs in the kernel.
    """
    cpl = _planes(v2d, faces)
    active = _strip_active(jax.lax.stop_gradient(cpl), size, float(sigma))
    m = _max_logit(cpl, active, size, interpret)
    return jax.nn.sigmoid(m * (1.0 / float(sigma)))


def _planes(v2d: jax.Array, faces: jax.Array, want_ybounds: bool = False):
    """(B, V, 2) NDC verts + (F, 3) faces -> y-sorted, padded, normalized
    coefficient planes (B, F', _CW), F' a _FBLK multiple; each row holds
    the _NPL inside-positive planes of one face (3 signed edge-line
    distances + 2 longest-edge endpoint caps — rasterizer._face_planes)
    and dead (degenerate / padding) rows read [0, 0, -BIG] per plane.
    With want_ybounds also returns the matching sorted/padded per-face y
    intervals (ymin, ymax), dead rows reading the empty interval
    (+BIG, -BIG)."""
    from .rasterizer import _face_planes

    coeffs, nondeg = jax.vmap(lambda v: _face_planes(v, faces))(v2d)
    # invalid faces -> e = -BIG everywhere (sigmoid 0, zero gradient)
    dead = jnp.asarray([0.0, 0.0, -_BIG], jnp.float32)
    coeffs = jnp.where(nondeg[..., None, None], coeffs,
                       jnp.broadcast_to(dead, coeffs.shape))
    B, F = coeffs.shape[:2]
    cpl = coeffs.reshape(B, F, _CW)                           # (B, F, _CW)

    # y-sort so each face block spans a narrow y band (tight block-level
    # liveness OR); dead faces sort last
    fy = v2d[:, faces, 1]                                     # (B, F, 3)
    ymin = jnp.where(nondeg, jnp.min(fy, axis=-1), _BIG)
    order = jnp.argsort(ymin, axis=1)
    cpl = jnp.take_along_axis(cpl, order[..., None], axis=1)

    pad = (-F) % _FBLK
    cpl = jnp.pad(cpl, ((0, 0), (0, pad), (0, 0)), constant_values=0.0)
    if pad:  # padded faces must read [0, 0, -BIG], not all-zero
        cpl = cpl.at[:, F:, 2::3].set(-_BIG)
    if not want_ybounds:
        return cpl
    ymax = jnp.where(nondeg, jnp.max(fy, axis=-1), -_BIG)
    ymin_s = jnp.pad(jnp.take_along_axis(ymin, order, axis=1),
                     ((0, 0), (0, pad)), constant_values=_BIG)
    ymax_s = jnp.pad(jnp.take_along_axis(ymax, order, axis=1),
                     ((0, 0), (0, pad)), constant_values=-_BIG)
    return cpl, ymin_s, ymax_s


def _strip_active_ybbox(ymin: jax.Array, ymax: jax.Array,
                        size: int) -> jax.Array:
    """EXACT strip liveness for the HARD mask from per-face y intervals
    (B, F'): a covered pixel (m >= 0) lies inside its face, hence inside
    the face's y interval, so a (strip, block) cell is live iff the
    block's merged y band intersects the strip's pixel-y range. O(F)
    with no (F x strips) intermediates — the sil path's segmented
    interval bound materializes (B, F', 3, nseg, strips), which at
    stage-3 shapes (24 views x 13.8k faces x 64 strips) is GBs of HBM
    traffic for a mask that needs no sigma tail (PERF_NOTES round 3)."""
    B, Fp = ymin.shape
    n_fblk, n_strips = Fp // _FBLK, size // _RBLK
    blo = jnp.min(ymin.reshape(B, n_fblk, _FBLK), axis=2)    # (B, nblk)
    bhi = jnp.max(ymax.reshape(B, n_fblk, _FBLK), axis=2)
    scale = 2.0 / (size - 1)
    s_lo = jnp.arange(n_strips, dtype=jnp.float32) * _RBLK * scale - 1.0
    s_hi = s_lo + (_RBLK - 1) * scale
    live = (blo[:, None, :] <= s_hi[None, :, None]) \
        & (bhi[:, None, :] >= s_lo[None, :, None])           # (B, S, nblk)
    return live.astype(jnp.int32).reshape(B * n_strips, n_fblk)


# SMEM budget guard: the liveness mask is (views * n_strips, n_fblocks)
# int32 resident in SMEM; slicing the batch keeps it small for the big
# stage-3 shapes (90 views x 13.8k SMPL faces at 512^2).
_MASK_VIEWS = 8


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def coverage_mask_batch(v2d: jax.Array, faces: jax.Array,
                        size: int = 512,
                        interpret: bool = False) -> jax.Array:
    """Batched HARD coverage mask: (B, V, 2) NDC verts + (F, 3) faces ->
    (B, size, size) float32 {0, 1}. Same semantics as
    vmap(ops.rasterizer.rasterize_mask) (stage-3 triplane inputs,
    render_triplane_nr.py:106-108 "mask = depth < far"): a pixel is
    covered iff all 3 edge functions are >= 0 for some face, i.e. iff the
    max over faces of m = min_j e_j is >= 0 — the sigma -> 0 limit of the
    soft silhouette, so the kernel is reused with cull threshold 0 (the
    liveness bound upper-bounds m itself, so culled cells provably
    contain no covered pixel). Non-differentiable by construction.
    """
    cpl, ymin, ymax = _planes(v2d, faces, want_ybounds=True)
    cpl = jax.lax.stop_gradient(cpl)
    active = _strip_active_ybbox(ymin, ymax, size)
    outs = []
    for s in range(0, cpl.shape[0], _MASK_VIEWS):
        m = _max_logit(cpl[s:s + _MASK_VIEWS],
                       active[s * (size // _RBLK):
                              (s + _MASK_VIEWS) * (size // _RBLK)],
                       size, interpret)
        outs.append(m >= 0.0)
    return jnp.concatenate(outs, 0).astype(jnp.float32)
