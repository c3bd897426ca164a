"""SMPL-H batch construction helpers.

Parity target: lib_smpl/smpl_generator.py (SMPLHGenerator.get_smplh:
72-d poses padded to 156 with the GRAB mean hand pose) and
lib_smpl/wrapper_pytorch.py parameter-splitting conventions (covered by
fit.smplt.SMPLTParams).
"""
from __future__ import annotations

import numpy as np

from .priors import mean_hand_pose
from ..fit.smplt import SMPLTParams

import jax.numpy as jnp


def smplh_params(pose: np.ndarray, betas: np.ndarray, trans: np.ndarray,
                 assets_root: str | None = None,
                 mean_hands: np.ndarray | None = None) -> SMPLTParams:
    """Build split SMPL-H parameters from packed arrays.

    pose: (B, 72) or (B, 156). 72-d poses are padded with the GRAB mean
    hand pose (smpl_generator.py:85-99); note the reference drops the
    72-d pose's wrist entries (66:72) — body pose [:66] + mean hands.
    """
    pose = np.asarray(pose, np.float32).reshape(len(pose), -1)
    if pose.shape[1] == 72:
        if mean_hands is None:
            assert assets_root, "need assets_root or mean_hands for padding"
            mean_hands = mean_hand_pose(assets_root)
        full = np.zeros((len(pose), 156), np.float32)
        full[:, :66] = pose[:, :66]
        full[:, 66:] = mean_hands
        pose = full
    assert pose.shape[1] == 156, pose.shape
    betas = np.asarray(betas, np.float32)
    if betas.shape[1] < 10:
        betas = np.pad(betas, ((0, 0), (0, 10 - betas.shape[1])))
    return SMPLTParams.from_full(jnp.asarray(pose), jnp.asarray(betas[:, :10]),
                                 jnp.asarray(np.asarray(trans, np.float32)))
