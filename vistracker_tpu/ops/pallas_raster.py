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
_XBLK = 128  # pixel columns per grid cell (native lane width); images
             # narrower than this use a single full-width tile
_NPL = 5     # planes per face: 3 edge lines + 2 longest-edge endpoint
             # caps (ghost-ray clipping — rasterizer._face_planes)
_CW = 3 * _NPL  # coefficient columns per face
# faces farther than this many sigmas from every pixel of a row strip are
# culled: sigmoid(-20) ~ 2e-9 can move neither the max nor the gradient
# above fp32 noise.
_CUT_SIGMAS = 20.0
# _planes sort granularity: faces are bucketed into equal-count y bands of
# this many face blocks, then x-sorted within each band, so a block is
# compact in BOTH dimensions and the x-tiled liveness mask can cull the
# (strip, x-tile) cells its faces cannot reach. 0 = pure y sort.
_BAND_BLOCKS = 2


def _xblk(size: int) -> int:
    # single full-width x tile at sil-phase sizes: a centered object spans
    # both 128-px tiles of a 256^2 render, so x-tiling cannot cull there —
    # it only doubles the per-cell fixed overhead (measured 33.1 -> 23.2
    # ms/step on the B=8 grid scene, bit-identical loss). Keep 128-px
    # tiles above 256 (stage-3 512^2 coverage), where bbox x-culling of
    # 4 tiles does pay and the SMEM liveness mask would otherwise grow 4x.
    return size if size <= 256 else min(_XBLK, size)


def _row_tiles(r_idx, x_idx, ct, size: int):
    """Yield (r, px, planes, m) for each of the _RBLK rows of row strip
    r_idx restricted to x tile x_idx. ct is the (fblk, 3 * _NPL)
    coefficient tile; px is (1, xblk); planes a tuple of _NPL
    (fblk, xblk) plane values, m their min. The y-invariant a*px term is
    hoisted out of the row unroll (one FMA per plane per row instead of
    two multiplies). Shared by the forward and backward kernels so
    recomputed logits match the saved maxima bitwise."""
    xblk = _xblk(size)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, xblk), 1) \
        + x_idx * xblk
    scale = 2.0 / (size - 1)
    px = col.astype(jnp.float32) * scale - 1.0
    axp = tuple(ct[:, 3 * j + 0:3 * j + 1] * px for j in range(_NPL))
    for r in range(_RBLK):
        py = (r_idx * _RBLK + r).astype(jnp.float32) * scale - 1.0

        def plane(j):
            b = ct[:, 3 * j + 1:3 * j + 2]   # (fblk, 1)
            c = ct[:, 3 * j + 2:3 * j + 3]
            return axp[j] + (b * py + c)      # (fblk, xblk)

        es = tuple(plane(j) for j in range(_NPL))
        m = es[0]
        for e in es[1:]:
            m = jnp.minimum(m, e)
        yield r, px, es, m


def _fwd_kernel(mask_ref, c_ref, m_ref, cnt_ref, *, size: int,
                n_strips: int, n_xblk: int):
    """Grid (B, n_strips, n_xblk, n_fblocks); m/cnt (1, _RBLK, xblk)
    revisited over f. m is the per-pixel max logit, cnt the number of
    faces tied at it (jnp.max vjp equal-split denominator)."""
    b_idx, r_idx, x_idx, f_idx = (pl.program_id(0), pl.program_id(1),
                                  pl.program_id(2), pl.program_id(3))

    @pl.when(f_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -_BIG)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    @pl.when(mask_ref[b_idx * n_strips + r_idx,
                      x_idx * pl.num_programs(3) + f_idx] != 0)
    def _():
        for r, _, _, m in _row_tiles(r_idx, x_idx, c_ref[0], size):
            bm = jnp.max(m, axis=0, keepdims=True)            # (1, xblk)
            bc = jnp.sum((m == bm).astype(jnp.float32), axis=0,
                         keepdims=True)
            old_m = m_ref[0, r:r + 1, :]
            old_c = cnt_ref[0, r:r + 1, :]
            cnt_ref[0, r:r + 1, :] = jnp.where(
                bm > old_m, bc, jnp.where(bm == old_m, old_c + bc, old_c))
            m_ref[0, r:r + 1, :] = jnp.maximum(old_m, bm)


def _bwd_kernel(mask_ref, c_ref, m_ref, gw_ref, dc_ref, *, size: int,
                n_strips: int, n_xblk: int):
    """Grid (B, n_fblocks, n_strips, n_xblk); dc (1, fblk, _CW) revisited
    over (r, x). gw is the per-pixel cotangent already divided by the tie
    count; the kernel recomputes the logits, selects winners by bitwise
    comparison with the saved max, splits equally among tied edges
    (jnp.min vjp) and reduces the per-edge cotangents against
    [px, py, 1]."""
    b_idx, f_idx, r_idx, x_idx = (pl.program_id(0), pl.program_id(1),
                                  pl.program_id(2), pl.program_id(3))

    @pl.when(jnp.logical_and(r_idx == 0, x_idx == 0))
    def _():
        dc_ref[:] = jnp.zeros_like(dc_ref)

    @pl.when(mask_ref[b_idx * n_strips + r_idx,
                      x_idx * pl.num_programs(1) + f_idx] != 0)
    def _():
        acc = [jnp.zeros((_FBLK, 1), jnp.float32) for _ in range(_CW)]
        for r, px, es, m in _row_tiles(r_idx, x_idx, c_ref[0], size):
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
                de = gm * tj                                  # (fblk, xblk)
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
    xblk = _xblk(size)
    assert size % _RBLK == 0 and F % _FBLK == 0 and size % xblk == 0
    n_strips, n_xblk = size // _RBLK, size // xblk
    grid = (B, n_strips, n_xblk, F // _FBLK)
    img_spec = pl.BlockSpec((1, _RBLK, xblk), lambda b, r, x, f: (b, r, x))
    m, cnt = pl.pallas_call(
        functools.partial(_fwd_kernel, size=size, n_strips=n_strips,
                          n_xblk=n_xblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _FBLK, _CW), lambda b, r, x, f: (b, f, 0)),
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
    xblk = _xblk(size)
    n_strips, n_xblk = size // _RBLK, size // xblk
    # equal split among faces tied at the max (cnt >= 1 wherever a
    # winner exists)
    gw = g.astype(jnp.float32) / jnp.maximum(cnt, 1.0)
    coeff_spec_b = pl.BlockSpec((1, _FBLK, _CW),
                                lambda b, f, r, x: (b, f, 0))
    img_spec_b = pl.BlockSpec((1, _RBLK, xblk),
                              lambda b, f, r, x: (b, r, x))
    dc = pl.pallas_call(
        functools.partial(_bwd_kernel, size=size, n_strips=n_strips,
                          n_xblk=n_xblk),
        grid=(B, F // _FBLK, n_strips, n_xblk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), coeff_spec_b,
                  img_spec_b, img_spec_b],
        out_specs=coeff_spec_b,
        out_shape=jax.ShapeDtypeStruct((B, F, _CW), jnp.float32),
        interpret=interpret,
    )(active, cpl, m, gw)
    return (dc, None)


_max_logit.defvjp(_ml_fwd, _ml_bwd)


def _strip_active(cpl: jax.Array, size: int, sigma: float) -> jax.Array:
    """Conservative per-(strip, x-tile, face-block) liveness from the
    sorted, padded, normalized coefficient planes cpl (B, F', _CW).

    For every face, row strip and x sub-segment, bound the max of
    m = min_j e_j over the pixel box
    [x in [xc-xh, xc+xh], y in [ylo, yhi]]:
        max_box m <= min_j max_box e_j
                   = min_j (a_j xc + |a_j| xh + max(b_j ylo, b_j yhi)
                            + c_j),
    then OR the sub-segments WITHIN each kernel x tile (the sub-split
    tightens the concave-in-x min-of-linear bound, whose true max sits
    between corner values). A (strip, x-tile, block) cell is live iff ANY
    of the block's faces can reach m >= -_CUT_SIGMAS * sigma in ANY of
    the tile's sub-segments. Dead/padding rows ([0,0,-BIG]) bound to
    -BIG and never activate anything. Returns int32
    (B * n_strips, n_xblk * n_fblk), column layout x-major to match the
    kernels' mask index x * n_fblk + f."""
    B, Fp, _ = cpl.shape
    n_fblk, n_strips = Fp // _FBLK, size // _RBLK
    n_xblk = size // _xblk(size)
    nsub = 8 // n_xblk if n_xblk <= 8 else 1   # sub-segments per x tile
    nseg = n_xblk * nsub
    a = cpl[..., 0::3, None, None]                  # (B, F', _NPL, 1, 1)
    b = cpl[..., 1::3, None, None]
    c = cpl[..., 2::3, None, None]
    scale = 2.0 / (size - 1)
    s_lo = jnp.arange(n_strips, dtype=jnp.float32) * _RBLK * scale - 1.0
    s_hi = s_lo + (_RBLK - 1) * scale                 # (S,)
    xh = 1.0 / nseg
    xc = ((jnp.arange(nseg, dtype=jnp.float32) + 0.5) * 2.0 * xh
          - 1.0)[:, None]                             # (nseg, 1)
    ub_e = (a * xc + jnp.abs(a) * xh +
            jnp.maximum(b * s_lo, b * s_hi) + c)  # (B, F', _NPL, nseg, S)
    m_ub = jnp.min(ub_e, axis=2)                      # (B, F', nseg, S)
    live = m_ub >= -_CUT_SIGMAS * float(sigma)
    # OR over the block's faces and each tile's sub-segments
    live = live.reshape(B, n_fblk, _FBLK, n_xblk, nsub, n_strips)
    live = jnp.any(jnp.any(live, axis=4), axis=2)     # (B, nblk, nx, S)
    return jnp.transpose(live, (0, 3, 2, 1)).astype(jnp.int32) \
        .reshape(B * n_strips, n_xblk * n_fblk)


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
    nv = _mask_views(size, cpl.shape[1])
    if cpl.shape[0] <= nv:
        m = _max_logit(cpl, active, size, interpret)
    else:
        # SMEM budget: slice the batch (differentiable — the vjp of
        # concatenate/slice routes each slice's dcoeffs back)
        ns = size // _RBLK
        m = jnp.concatenate(
            [_max_logit(cpl[s:s + nv], active[s * ns:(s + nv) * ns],
                        size, interpret)
             for s in range(0, cpl.shape[0], nv)], 0)
    return jax.nn.sigmoid(m * (1.0 / float(sigma)))


def _planes(v2d: jax.Array, faces: jax.Array, want_bounds: bool = False):
    """(B, V, 2) NDC verts + (F, 3) faces -> sorted, padded, normalized
    coefficient planes (B, F', _CW), F' a _FBLK multiple; each row holds
    the _NPL inside-positive planes of one face (3 signed edge-line
    distances + 2 longest-edge endpoint caps — rasterizer._face_planes)
    and dead (degenerate / padding) rows read [0, 0, -BIG] per plane.

    Sort: equal-count y bands of _BAND_BLOCKS face blocks, x-sorted
    within each band (dead faces last), so every block is compact in
    BOTH dimensions and the (strip, x-tile) liveness masks cull tightly.
    With want_bounds also returns the matching sorted/padded per-face
    y and x intervals (ymin, ymax, xmin, xmax), dead rows reading the
    empty interval (+BIG, -BIG)."""
    from .rasterizer import _face_planes

    coeffs, nondeg = jax.vmap(lambda v: _face_planes(v, faces))(v2d)
    # invalid faces -> e = -BIG everywhere (sigmoid 0, zero gradient)
    dead = jnp.asarray([0.0, 0.0, -_BIG], jnp.float32)
    coeffs = jnp.where(nondeg[..., None, None], coeffs,
                       jnp.broadcast_to(dead, coeffs.shape))
    B, F = coeffs.shape[:2]
    cpl = coeffs.reshape(B, F, _CW)                           # (B, F, _CW)

    fy = v2d[:, faces, 1]                                     # (B, F, 3)
    fx = v2d[:, faces, 0]
    ymin = jnp.where(nondeg, jnp.min(fy, axis=-1), _BIG)
    xmin = jnp.where(nondeg, jnp.min(fx, axis=-1), _BIG)
    if _BAND_BLOCKS and F > _BAND_BLOCKS * _FBLK:
        # equal-count y bands -> x-sort within each band. The y rank of
        # a dead face is maximal (ymin=_BIG), so dead faces land in the
        # last band and, with xmin=_BIG, at its very end.
        yrank = jnp.argsort(jnp.argsort(ymin, axis=1), axis=1)
        band = yrank // (_BAND_BLOCKS * _FBLK)
        key = band.astype(jnp.float32) * 1e4 + jnp.clip(xmin, -8.0, 8.0)
        order = jnp.argsort(key, axis=1)
    else:
        order = jnp.argsort(ymin, axis=1)
    cpl = jnp.take_along_axis(cpl, order[..., None], axis=1)

    pad = (-F) % _FBLK
    cpl = jnp.pad(cpl, ((0, 0), (0, pad), (0, 0)), constant_values=0.0)
    if pad:  # padded faces must read [0, 0, -BIG], not all-zero
        cpl = cpl.at[:, F:, 2::3].set(-_BIG)
    if not want_bounds:
        return cpl
    ymax = jnp.where(nondeg, jnp.max(fy, axis=-1), -_BIG)
    xmax = jnp.where(nondeg, jnp.max(fx, axis=-1), -_BIG)

    def srt(v, fill):
        return jnp.pad(jnp.take_along_axis(v, order, axis=1),
                       ((0, 0), (0, pad)), constant_values=fill)

    return cpl, srt(ymin, _BIG), srt(ymax, -_BIG), \
        srt(xmin, _BIG), srt(xmax, -_BIG)


def _strip_active_bbox(ymin: jax.Array, ymax: jax.Array, xmin: jax.Array,
                       xmax: jax.Array, size: int) -> jax.Array:
    """EXACT (strip, x-tile) liveness for the HARD mask from per-face
    y/x intervals (B, F'): a covered pixel (m >= 0) lies inside its
    face, hence inside the face's bbox, so a (strip, x-tile, block) cell
    is live iff the block's merged bbox intersects the cell's pixel
    ranges. O(F) with no (F x strips) intermediates — the sil path's
    segmented interval bound materializes (B, F', _NPL, nseg, strips),
    which at stage-3 shapes (24 views x 13.8k faces x 64 strips) is GBs
    of HBM traffic for a mask that needs no sigma tail (PERF_NOTES
    round 3)."""
    B, Fp = ymin.shape
    n_fblk, n_strips = Fp // _FBLK, size // _RBLK
    xblk = _xblk(size)
    n_xblk = size // xblk
    blo = jnp.min(ymin.reshape(B, n_fblk, _FBLK), axis=2)    # (B, nblk)
    bhi = jnp.max(ymax.reshape(B, n_fblk, _FBLK), axis=2)
    xlo = jnp.min(xmin.reshape(B, n_fblk, _FBLK), axis=2)
    xhi = jnp.max(xmax.reshape(B, n_fblk, _FBLK), axis=2)
    scale = 2.0 / (size - 1)
    s_lo = jnp.arange(n_strips, dtype=jnp.float32) * _RBLK * scale - 1.0
    s_hi = s_lo + (_RBLK - 1) * scale
    t_lo = jnp.arange(n_xblk, dtype=jnp.float32) * xblk * scale - 1.0
    t_hi = t_lo + (xblk - 1) * scale
    live_y = (blo[:, None, :] <= s_hi[None, :, None]) \
        & (bhi[:, None, :] >= s_lo[None, :, None])           # (B, S, nblk)
    live_x = (xlo[:, None, :] <= t_hi[None, :, None]) \
        & (xhi[:, None, :] >= t_lo[None, :, None])           # (B, X, nblk)
    live = live_y[:, :, None, :] & live_x[:, None, :, :]     # (B,S,X,nblk)
    return live.astype(jnp.int32).reshape(B * n_strips,
                                          n_xblk * n_fblk)


# SMEM budget guard: the liveness mask is (views * n_strips,
# n_xblk * n_fblocks) int32 resident in SMEM (TPU SMEM is ~1 MiB and the
# kernel's scalars/grid bookkeeping need headroom). Slicing the batch
# keeps each pallas_call's mask under budget for the big stage-3 shapes:
# at 512^2 x 13776 SMPL faces one view costs 64 * 4 * 108 * 4 B = 108 KiB,
# so 8 views (the old fixed slice) already sat at 884 KiB and FAILED to
# compile 169 faces later (measured: SMEM 1.00M exceeded by 1.1K at
# 512^2 x 13944 — scripts/check_tpu_kernel_parity.py).
_MASK_SMEM_BUDGET = 512 * 1024


def _mask_views(size: int, n_faces_padded: int) -> int:
    per_view = (size // _RBLK) * (size // _xblk(size)) \
        * (n_faces_padded // _FBLK) * 4
    return max(1, _MASK_SMEM_BUDGET // per_view)


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
    cpl, ymin, ymax, xmin, xmax = _planes(v2d, faces, want_bounds=True)
    cpl = jax.lax.stop_gradient(cpl)
    active = _strip_active_bbox(ymin, ymax, xmin, xmax, size)
    nv = _mask_views(size, cpl.shape[1])
    outs = []
    for s in range(0, cpl.shape[0], nv):
        m = _max_logit(cpl[s:s + nv],
                       active[s * (size // _RBLK):
                              (s + nv) * (size // _RBLK)],
                       size, interpret)
        outs.append(m >= 0.0)
    return jnp.concatenate(outs, 0).astype(jnp.float32)
