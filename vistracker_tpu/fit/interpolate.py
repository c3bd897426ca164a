"""Slerp/lerp object-pose infilling — the non-learned baseline for HVOP-Net.

Parity target: interp/interpolate_recon.py:29-197 — detect occluded
intervals from a visibility threshold, then fill object rotation by
quaternion slerp and translation by lerp between the nearest visible
anchor frames; leading/trailing occluded frames copy the nearest anchor.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.rotations import rotmat_to_quat, quat_to_rotmat, quat_slerp


def occluded_intervals(visible: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, end) runs of invisible frames."""
    out = []
    T = len(visible)
    i = 0
    while i < T:
        if not visible[i]:
            j = i
            while j < T and not visible[j]:
                j += 1
            out.append((i, j))
            i = j
        else:
            i += 1
    return out


def slerp_fill(rots: np.ndarray, trans: np.ndarray, occ_ratios: np.ndarray,
               thres: float = 0.5):
    """Fill occluded object poses by interpolation.

    rots (T, 3, 3) REAL rotations, trans (T, 3); occluded where
    occ_ratios < thres. Returns (rots_filled, trans_filled).
    """
    T = len(rots)
    visible = np.asarray(occ_ratios).reshape(-1) >= thres
    if visible.all() or not visible.any():
        return rots.copy(), trans.copy()

    quats = np.asarray(rotmat_to_quat(jnp.asarray(rots)))
    out_q = quats.copy()
    out_t = trans.copy()
    for start, end in occluded_intervals(visible):
        left = start - 1
        right = end
        if left < 0 and right >= T:
            continue
        if left < 0:  # leading: copy right anchor
            out_q[start:end] = quats[right]
            out_t[start:end] = trans[right]
            continue
        if right >= T:  # trailing: copy left anchor
            out_q[start:end] = quats[left]
            out_t[start:end] = trans[left]
            continue
        n = end - start
        ts = (np.arange(1, n + 1) / (n + 1)).astype(np.float32)
        q0 = jnp.broadcast_to(jnp.asarray(quats[left]), (n, 4))
        q1 = jnp.broadcast_to(jnp.asarray(quats[right]), (n, 4))
        out_q[start:end] = np.asarray(quat_slerp(q0, q1, jnp.asarray(ts)))
        out_t[start:end] = ((1 - ts)[:, None] * trans[left]
                            + ts[:, None] * trans[right])
    rots_out = np.asarray(quat_to_rotmat(jnp.asarray(out_q)))
    return rots_out, out_t
