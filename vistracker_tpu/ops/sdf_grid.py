"""Signed-distance-grid sampling — the TPU replacement for BVH collision.

The reference penalizes human-object interpenetration with a CUDA BVH
triangle-collision search (torch-mesh-isect, recon_fit_base.py:92-100,
736-765; gated to specific hosts). On TPU we precompute a dense SDF grid of
the object TEMPLATE once per sequence (host side, see data.sampling) and
penalize SMPL vertices whose template-frame SDF is negative — an O(N)
trilinear gather instead of tree traversal, fully differentiable w.r.t. the
object pose.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SDFGrid:
    values: jax.Array  # (R, R, R) signed distances (negative inside)
    bmin: jax.Array    # (3,) grid origin
    bmax: jax.Array    # (3,) grid extent


def sample_sdf(grid: SDFGrid, points: jax.Array) -> jax.Array:
    """Trilinear SDF lookup. points (..., 3) in grid (template) frame.

    Points outside the grid clamp to the boundary value (positive for any
    sane template grid, so no spurious penetration)."""
    R = grid.values.shape[0]
    t = (points - grid.bmin) / (grid.bmax - grid.bmin) * (R - 1)
    t0 = jnp.floor(t)
    w = t - t0
    i0 = jnp.clip(t0.astype(jnp.int32), 0, R - 1)
    i1 = jnp.clip(i0 + 1, 0, R - 1)

    def gather(ix, iy, iz):
        return grid.values[ix, iy, iz]

    c000 = gather(i0[..., 0], i0[..., 1], i0[..., 2])
    c001 = gather(i0[..., 0], i0[..., 1], i1[..., 2])
    c010 = gather(i0[..., 0], i1[..., 1], i0[..., 2])
    c011 = gather(i0[..., 0], i1[..., 1], i1[..., 2])
    c100 = gather(i1[..., 0], i0[..., 1], i0[..., 2])
    c101 = gather(i1[..., 0], i0[..., 1], i1[..., 2])
    c110 = gather(i1[..., 0], i1[..., 1], i0[..., 2])
    c111 = gather(i1[..., 0], i1[..., 1], i1[..., 2])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    c00 = c000 * (1 - wz) + c001 * wz
    c01 = c010 * (1 - wz) + c011 * wz
    c10 = c100 * (1 - wz) + c101 * wz
    c11 = c110 * (1 - wz) + c111 * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wx) + c1 * wx


def penetration_loss(grid: SDFGrid, points_template_frame: jax.Array) -> jax.Array:
    """Mean squared penetration depth of points into the template surface."""
    sdf = sample_sdf(grid, points_template_frame)
    return jnp.mean(jnp.square(jnp.minimum(sdf, 0.0)))
