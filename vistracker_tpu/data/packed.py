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


def unpack_to_frames(packed: dict, seq_dir: str, save_name: str,
                     kid: int = 1):
    """Write per-frame smplfit/objfit pkl files from a packed dict — the
    pack2separate tools (tools/pack2separate.py, pack2separate_params.py):
    <seq>/<frame>/k{kid}.smplfit_{save_name}.pkl {pose, betas, trans} and
    k{kid}.objfit_{save_name}.pkl {rot, trans, scale}. Skips frames whose
    outputs already exist (idempotent resume, recon_fit_base.py:260-276).
    """
    import pickle
    written = []
    for i, frame in enumerate(packed["frames"]):
        fd = os.path.join(seq_dir, frame)
        os.makedirs(fd, exist_ok=True)
        sf = os.path.join(fd, f"k{kid}.smplfit_{save_name}.pkl")
        of = os.path.join(fd, f"k{kid}.objfit_{save_name}.pkl")
        if os.path.isfile(sf) and os.path.isfile(of):
            continue
        with open(sf, "wb") as f:
            pickle.dump(dict(pose=np.asarray(packed["poses"][i]),
                             betas=np.asarray(packed["betas"][i]),
                             trans=np.asarray(packed["trans"][i])), f)
        with open(of, "wb") as f:
            pickle.dump(dict(rot=np.asarray(packed["obj_angles"][i]),
                             trans=np.asarray(packed["obj_trans"][i]),
                             scale=float(np.asarray(
                                 packed["obj_scales"][i]))), f)
        written.append(frame)
    return written


def pack_from_frames(seq_dir: str, frames: list, save_name: str,
                     kid: int = 1) -> dict:
    """Inverse of unpack_to_frames: gather per-frame fit pkls into the
    packed layout (preprocess/pack_recon.py role for param files)."""
    import pickle
    poses, betas, trans = [], [], []
    rots, otrans, oscales, exist = [], [], [], []
    for frame in frames:
        fd = os.path.join(seq_dir, frame)
        sf = os.path.join(fd, f"k{kid}.smplfit_{save_name}.pkl")
        of = os.path.join(fd, f"k{kid}.objfit_{save_name}.pkl")
        ok = os.path.isfile(sf) and os.path.isfile(of)
        exist.append(ok)
        if ok:
            with open(sf, "rb") as f:
                s = pickle.load(f)
            with open(of, "rb") as f:
                o = pickle.load(f)
            poses.append(np.asarray(s["pose"]).reshape(-1))
            betas.append(np.asarray(s["betas"]).reshape(-1))
            trans.append(np.asarray(s["trans"]).reshape(-1))
            rots.append(np.asarray(o["rot"]))
            otrans.append(np.asarray(o["trans"]).reshape(-1))
            oscales.append(float(o["scale"]))
        else:  # dummy-fill missing frames (pack_recon.py:62-76)
            poses.append(np.zeros(156, np.float32))
            betas.append(np.zeros(10, np.float32))
            trans.append(np.zeros(3, np.float32))
            rots.append(np.eye(3, dtype=np.float32))
            otrans.append(np.zeros(3, np.float32))
            oscales.append(1.0)
    return dict(poses=np.stack(poses), betas=np.stack(betas),
                trans=np.stack(trans), obj_angles=np.stack(rots),
                obj_trans=np.stack(otrans), obj_scales=np.asarray(oscales),
                recon_exist=np.asarray(exist), recon_name=save_name,
                frames=list(frames))


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
