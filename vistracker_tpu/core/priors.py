"""SMPL pose priors (Mahalanobis body prior, GRAB hand priors).

Parity targets: /root/reference/lib_smpl/th_smpl_prior.py (body prior:
((pose[3:66]-mean) @ prec)^2 summed) and th_hand_prior.py (GRAB left/right
hand precisions over pose[66:156]).

Assets (body_prior.pkl, lh_prior.pkl, rh_prior.pkl) are user-supplied model
data located via `vistracker_tpu.data.paths.asset_root()`.
"""
from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MahalanobisPrior:
    """Weighted L2 on whitened pose coefficients over pose[start:end]."""

    mean: jax.Array   # (D,)
    prec: jax.Array   # (D, D)
    start: int = dataclasses.field(default=3, metadata=dict(static=True))
    end: int = dataclasses.field(default=66, metadata=dict(static=True))

    def __call__(self, pose: jax.Array, weight: float = 1.0) -> jax.Array:
        """pose: (B, P) full axis-angle pose -> (B,) prior energy."""
        d = pose[:, self.start:self.end] - self.mean
        w = jnp.matmul(d, self.prec, precision=jax.lax.Precision.HIGHEST) * weight
        return jnp.sum(w * w, axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HandPrior:
    """GRAB hand prior on SMPL-H pose[prefix:], 45 dims per hand."""

    mean: jax.Array        # (90,)
    lhand_prec: jax.Array  # (45, 45)
    rhand_prec: jax.Array  # (45, 45)
    prefix: int = dataclasses.field(default=66, metadata=dict(static=True))

    HAND_POSE_NUM = 45

    def __call__(self, full_pose: jax.Array) -> jax.Array:
        d = full_pose[:, self.prefix:] - self.mean
        lh = jnp.matmul(d[:, :self.HAND_POSE_NUM], self.lhand_prec,
                        precision=jax.lax.Precision.HIGHEST)
        rh = jnp.matmul(d[:, self.HAND_POSE_NUM:], self.rhand_prec,
                        precision=jax.lax.Precision.HIGHEST)
        w = jnp.concatenate([lh, rh], axis=1)
        return jnp.sum(w * w, axis=1)


def load_body_prior(assets_root: str, dtype=np.float32) -> MahalanobisPrior:
    with open(os.path.join(assets_root, "priors", "body_prior.pkl"), "rb") as f:
        dat = pickle.load(f, encoding="latin1")
    return MahalanobisPrior(
        mean=jnp.asarray(np.asarray(dat["mean"], dtype).reshape(-1)),
        prec=jnp.asarray(np.asarray(dat["precision"], dtype)))


def load_hand_prior(assets_root: str, dtype=np.float32) -> HandPrior:
    def _load(name):
        with open(os.path.join(assets_root, "priors", name), "rb") as f:
            return pickle.load(f, encoding="latin1")
    lh, rh = _load("lh_prior.pkl"), _load("rh_prior.pkl")
    mean = np.concatenate([np.asarray(lh["mean"], dtype).reshape(-1),
                           np.asarray(rh["mean"], dtype).reshape(-1)])
    return HandPrior(
        mean=jnp.asarray(mean),
        lhand_prec=jnp.asarray(np.asarray(lh["precision"], dtype)),
        rhand_prec=jnp.asarray(np.asarray(rh["precision"], dtype)))


def mean_hand_pose(assets_root: str, dtype=np.float32) -> np.ndarray:
    """(90,) GRAB mean hand pose, used to pad 72-d poses to 156-d SMPL-H
    (parity: lib_smpl/smpl_generator.py:85-99)."""
    def _load(name):
        with open(os.path.join(assets_root, "priors", name), "rb") as f:
            return pickle.load(f, encoding="latin1")
    lh, rh = _load("lh_prior.pkl"), _load("rh_prior.pkl")
    return np.concatenate([np.asarray(lh["mean"], dtype).reshape(-1),
                           np.asarray(rh["mean"], dtype).reshape(-1)])


def pad_pose_to_smplh(pose72: np.ndarray, mean_hands: np.ndarray) -> np.ndarray:
    """(B, 72) SMPL pose -> (B, 156) SMPL-H: body[:66] + GRAB mean hands."""
    B = pose72.shape[0]
    out = np.zeros((B, 156), pose72.dtype)
    out[:, :66] = pose72[:, :66]
    out[:, 66:] = mean_hands
    return out
