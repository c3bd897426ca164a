"""Evaluation metrics: Procrustes alignment, chamfer/v2v, acceleration.

Parity targets: recon/eval/pose_utils.py:compute_transform (umeyama-style
similarity fit), evaluate.py:chamfer_dist (kd-tree bidirectional sqrt
chamfer on 10k surface samples) / v2v_err, evaluate_video.py:
compute_accel_err. Units: meters * 100 = cm.

The chamfer runs on device via ops.chamfer (MXU matmuls) instead of a CPU
kd-tree; alignment math is numpy (tiny) for bit-level parity with the
reference's float64 SVD.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.chamfer import chamfer_distance as _chamfer_dev
from ..utils.mesh import sample_surface

UNIT_CVT = 100.0  # meters -> centimeters


def compute_transform(s1: np.ndarray, s2: np.ndarray):
    """Similarity transform (R, t, scale) mapping s1 -> s2; both (N, 3).

    Returns (R (3,3), t (3,1), scale) such that aligned = scale * R @ v + t
    — exact parity with pose_utils.py:compute_transform.
    """
    S1, S2 = np.asarray(s1, np.float64).T, np.asarray(s2, np.float64).T
    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = np.sum(X1 ** 2)
    K = X1 @ X2.T
    U, _, Vh = np.linalg.svd(K)
    V = Vh.T
    Z = np.eye(3)
    Z[-1, -1] = np.sign(np.linalg.det(U @ V.T))
    R = V @ Z @ U.T
    scale = np.trace(R @ K) / var1
    t = mu2 - scale * (R @ mu1)
    return R, t, scale


def apply_transform(verts: np.ndarray, R: np.ndarray, t: np.ndarray,
                    scale: float) -> np.ndarray:
    """(T, N, 3) or (N, 3) -> aligned, matching (scale*R@v.T + t).T."""
    return (scale * np.einsum("ij,...nj->...ni", R, verts) + t[:, 0])


def v2v_error(gt: np.ndarray, recon: np.ndarray) -> float:
    """Mean per-vertex L2 distance, cm."""
    return float(np.sqrt(((gt - recon) ** 2).sum(-1)).mean() * UNIT_CVT)


def chamfer_error(gt_verts, gt_faces, recon_verts, recon_faces,
                  n_samples: int = 10000, seed: int = 0) -> float:
    """Bidirectional sqrt chamfer on area-weighted surface samples, cm.

    The reference samples with an unseeded RNG (evaluate.py:151-155); we
    seed for reproducibility — metric parity is statistical (SURVEY.md §7).
    """
    rng = np.random.RandomState(seed)
    p1 = sample_surface(np.asarray(gt_verts), np.asarray(gt_faces),
                        n_samples, rng)
    p2 = sample_surface(np.asarray(recon_verts), np.asarray(recon_faces),
                        n_samples, rng)
    d = _chamfer_dev(jnp.asarray(p1)[None], jnp.asarray(p2)[None],
                     sqrt=True, chunk=2048)
    return float(d[0]) * UNIT_CVT


def accel_error(verts_gt: np.ndarray, verts_recon: np.ndarray) -> float:
    """Mean ||accel_gt - accel_recon|| over a window, cm
    (evaluate_video.py:138-157)."""
    if len(verts_gt) < 3:
        return 0.0
    a_gt = verts_gt[:-2] - 2 * verts_gt[1:-1] + verts_gt[2:]
    a_rc = verts_recon[:-2] - 2 * verts_recon[1:-1] + verts_recon[2:]
    return float(np.linalg.norm(a_gt - a_rc, axis=2).mean() * UNIT_CVT)
