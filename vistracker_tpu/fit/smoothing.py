"""SmoothNet inference runners (pipeline stages 2 and 5a).

Parity targets: smoothnet/smooth_base.py (sequence -> overlapping W=64
windows, batched forward, overlap-average back) plus smooth_smplt.py
(SMPL-T: 24-joint rot6d + betas + per-window-relative translation; SMPL-H
poses reduced via [:69] + [111:114]) and smooth_objrot.py (object rot6d
smoothing of neural-PCA-initialized rotations; output obj_angles stored
TRANSPOSED, matching the packed convention).

TPU-first: all windows of a sequence run as ONE batched forward; the
overlap average is a segment-sum scatter (ops/window_ops.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rotations import (axis_angle_to_rot6d, rot6d_to_axis_angle,
                              rot6d_to_rotmat, rotmat_to_rot6d)
from ..models.smoothnet import SmoothNet, SmoothNetSMPL
from ..ops.window_ops import seq_to_windows, windows_to_seq, pad_to_window

SMPLT_START = 24 * 6 + 10  # translation offset in the 157-d feature


def smplh_to_smpl_pose(pose: np.ndarray) -> np.ndarray:
    """(T, 156) SMPL-H -> (T, 72) SMPL body pose
    (smooth_smplt.py:smplh2smpl_pose: joints 0-22 + right-hand root)."""
    return np.concatenate([pose[:, :69], pose[:, 111:114]], 1)


def smooth_smplt(params, poses: np.ndarray, betas: np.ndarray,
                 trans: np.ndarray, window: int = 64, step: int = 1) -> dict:
    """Smooth an SMPL-T trajectory. poses (T, 156 or 72). Returns the packed
    dict layout of smooth_smplt.py:post_processing (poses (T, 72), betas,
    trans; nan dummy object entries)."""
    T = len(poses)
    p72 = smplh_to_smpl_pose(poses) if poses.shape[-1] == 156 else poses
    rot6d = np.asarray(axis_angle_to_rot6d(
        jnp.asarray(p72.reshape(-1, 3)))).reshape(T, 144)
    feats = np.concatenate([rot6d, betas, trans], 1).astype(np.float32)  # (T, 157)
    feats, orig_len = pad_to_window(feats, window)

    w = seq_to_windows(jnp.asarray(feats), window, step)     # (B, W, 157)
    # per-window-relative translation (smooth_smplt.py:preprocess_input)
    t_init = w[:, 0:1, SMPLT_START:SMPLT_START + 3]
    w = w.at[:, :, SMPLT_START:SMPLT_START + 3].add(-t_init)

    model = SmoothNetSMPL(window_size=window, output_size=window)
    den = model.apply(params, jnp.transpose(w, (0, 2, 1)))   # (B, 157, W)
    den = jnp.transpose(den, (0, 2, 1))
    den = den.at[:, :, SMPLT_START:SMPLT_START + 3].add(t_init)
    seq = np.asarray(windows_to_seq(den, step))[:orig_len]

    out_pose = np.asarray(rot6d_to_axis_angle(
        jnp.asarray(seq[:, :144].reshape(-1, 6)))).reshape(orig_len, 72)
    L = orig_len
    return {
        "poses": out_pose,
        "betas": seq[:, 144:154],
        "trans": seq[:, SMPLT_START:SMPLT_START + 3],
        "obj_angles": np.full((L, 3, 3), np.nan),
        "obj_trans": np.full((L, 3), np.nan),
        "obj_scales": np.full((L,), np.nan),
    }


def smooth_objrot(params, obj_rot_real: np.ndarray, window: int = 64,
                  step: int = 1) -> np.ndarray:
    """Smooth object rotations. obj_rot_real: (T, 3, 3) REAL rotation
    matrices (already un-transposed from the packed file). Returns
    (T, 3, 3) obj_angles in packed (transposed) convention
    (smooth_objrot.py:post_processing)."""
    T = len(obj_rot_real)
    rot6d = np.asarray(rotmat_to_rot6d(jnp.asarray(obj_rot_real)))  # (T, 6)
    feats, orig_len = pad_to_window(rot6d.astype(np.float32), window)
    w = seq_to_windows(jnp.asarray(feats), window, step)
    model = SmoothNet(window_size=window, output_size=window)
    den = model.apply(params, jnp.transpose(w, (0, 2, 1)))
    den = jnp.transpose(den, (0, 2, 1))
    seq = windows_to_seq(den, step)[:orig_len]
    rots = np.asarray(rot6d_to_rotmat(seq))
    return rots.transpose(0, 2, 1)  # packed transposed convention
