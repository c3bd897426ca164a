"""The packed-pkl data contract — the inter-stage interface of the pipeline.

Parity targets: preprocess/pack_smplt.py:49-64 (SMPL-T packs),
preprocess/pack_recon.py:120-159 (recon + neural packs) and the GT packs
consumed by the evaluator and infiller datasets
(`<seq>_GT-packed.pkl`). Files are written with joblib (what the reference
uses), loadable by either framework.

Key conventions preserved:
  * poses (T, 156) axis-angle SMPL-H, betas (T, 10), trans (T, 3)
  * obj_angles (T, 3, 3) — ROW-VECTOR rotations: verts_world =
    temp_v @ obj_angles + obj_trans, then * obj_scales
    (evalvideo_packed.py:205-211). GT packs instead store axis-angle
    obj_angles (T, 3) applied as temp_v @ R(aa).T.
  * recon_exist (T,) bool, frames: list of frame-time strings
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any

import joblib
import numpy as np

RECON_KEYS = ("poses", "betas", "trans", "root_joints", "obj_angles",
              "obj_trans", "obj_scales", "neural_pca", "neural_trans",
              "neural_visibility", "recon_exist", "recon_name", "frames",
              "gender")


@dataclasses.dataclass
class PackedRecon:
    poses: np.ndarray          # (T, 156)
    betas: np.ndarray          # (T, 10)
    trans: np.ndarray          # (T, 3)
    obj_angles: np.ndarray     # (T, 3, 3) row-vector convention
    obj_trans: np.ndarray      # (T, 3)
    obj_scales: np.ndarray     # (T,)
    frames: list
    gender: str = "male"
    root_joints: np.ndarray | None = None
    neural_pca: Any = None
    neural_trans: Any = None
    neural_visibility: Any = None
    recon_exist: np.ndarray | None = None
    recon_name: str = ""

    def __post_init__(self):
        if self.recon_exist is None:
            self.recon_exist = np.ones(len(self.poses), bool)

    @property
    def num_frames(self) -> int:
        return len(self.poses)


def save_packed(path: str, data: dict | PackedRecon):
    if isinstance(data, PackedRecon):
        data = dataclasses.asdict(data)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    joblib.dump(data, path)


def load_packed(path: str) -> dict:
    return joblib.load(path)


def load_packed_recon(path: str) -> PackedRecon:
    d = load_packed(path)
    return PackedRecon(
        poses=np.asarray(d["poses"]).reshape(len(d["poses"]), -1),
        betas=np.asarray(d["betas"]),
        trans=np.asarray(d["trans"]),
        obj_angles=np.asarray(d["obj_angles"]),
        obj_trans=np.asarray(d["obj_trans"]),
        obj_scales=np.asarray(d["obj_scales"]),
        frames=list(d.get("frames", [])),
        gender=str(d.get("gender", "male")),
        root_joints=(np.asarray(d["root_joints"])
                     if "root_joints" in d else None),
        neural_pca=d.get("neural_pca"),
        neural_trans=d.get("neural_trans"),
        neural_visibility=d.get("neural_visibility"),
        recon_exist=(np.asarray(d["recon_exist"])
                     if "recon_exist" in d else None),
        recon_name=str(d.get("recon_name", "")),
    )


def recon_obj_verts(temp_verts: np.ndarray, obj_angles: np.ndarray,
                    obj_trans: np.ndarray, obj_scales: np.ndarray) -> np.ndarray:
    """Recon packs: verts = (temp @ obj_angles + trans) * scale
    (evalvideo_packed.py:get_recon_fits)."""
    v = np.matmul(temp_verts[None], obj_angles) + obj_trans[:, None]
    return v * obj_scales[:, None, None]


def gt_obj_verts(temp_verts: np.ndarray, obj_axis_angle: np.ndarray,
                 obj_trans: np.ndarray) -> np.ndarray:
    """GT packs: verts = temp @ R(axis_angle).T + trans
    (evalvideo_packed.py:get_GTfits)."""
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec(obj_axis_angle).as_matrix()
    return np.matmul(temp_verts[None], R.transpose(0, 2, 1)) + obj_trans[:, None]
