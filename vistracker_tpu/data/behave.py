"""BEHAVE sequence access: sequence info, frame readers, kinect transforms.

Parity targets: behave/seq_utils.py (SeqInfo), behave/frame_data.py
(FrameDataReader naming conventions — per-frame folders `tXXXX.XXX` with
`k{kid}.color.jpg`, masks `k{kid}.person_mask.*` / `.obj_rend_mask.*`,
keypoints `k{kid}.color.json`, mocap `k{kid}.mocap.json`), behave/
kinect_transform.py (world<->camera), behave/utils.py (calibration +
object template loading).

Pure-host numpy/PIL code — no psbody.mesh / cv2 / opencv dependencies.
"""
from __future__ import annotations

import json
import os
import os.path as osp
from glob import glob

import numpy as np

from ..utils.mesh import load_ply


class SeqInfo:
    """Sequence metadata from info.json (behave/seq_utils.py)."""

    def __init__(self, seq_path: str):
        with open(osp.join(seq_path, "info.json")) as f:
            self.info = json.load(f)
        self.seq_path = seq_path

    def get_obj_name(self) -> str:
        return self.info["cat"]

    def get_gender(self) -> str:
        return self.info["gender"]

    @property
    def kids(self):
        return self.info.get("kinects", [0, 1, 2, 3])

    def beta_init(self):
        return self.info.get("beta")


class FrameDataReader:
    """Per-frame file access for one sequence folder."""

    def __init__(self, seq: str, check_image: bool = False):
        self.seq_path = seq
        self.seq_name = osp.basename(seq.rstrip("/"))
        self.frames = sorted(
            osp.basename(d.rstrip("/")) for d in glob(osp.join(seq, "*/"))
            if osp.basename(d.rstrip("/")).startswith("t"))
        self.seq_info = SeqInfo(seq) if osp.isfile(
            osp.join(seq, "info.json")) else None

    def __len__(self):
        return len(self.frames)

    def cvt_end(self, end):
        return len(self.frames) if end is None else min(end, len(self.frames))

    def get_frame_folder(self, idx) -> str:
        if isinstance(idx, str):
            return osp.join(self.seq_path, idx)
        return osp.join(self.seq_path, self.frames[idx])

    def get_color_file(self, idx: int, kid: int) -> str:
        return osp.join(self.get_frame_folder(idx), f"k{kid}.color.jpg")

    def get_mask_file(self, idx: int, kid: int, cat: str = "person") -> str:
        folder = self.get_frame_folder(idx)
        names = {
            "person": [f"k{kid}.person_mask.png", f"k{kid}.person_mask.jpg"],
            "obj": [f"k{kid}.obj_rend_mask.png", f"k{kid}.obj_rend_mask.jpg",
                    f"k{kid}.obj_mask.png", f"k{kid}.obj_mask.jpg"],
        }[cat]
        for n in names:
            p = osp.join(folder, n)
            if osp.isfile(p):
                return p
        raise FileNotFoundError(f"no {cat} mask in {folder}")

    def get_mask(self, idx: int, kid: int, cat: str = "person") -> np.ndarray:
        from PIL import Image
        img = Image.open(self.get_mask_file(idx, kid, cat)).convert("L")
        return np.asarray(img) > 127

    def get_color(self, idx: int, kid: int) -> np.ndarray:
        from PIL import Image
        return np.asarray(
            Image.open(self.get_color_file(idx, kid)).convert("RGB"))

    def get_body_kpts(self, idx: int, kid: int, tol: float = 0.5) -> np.ndarray:
        """OpenPose body25 keypoints (25, 3) = x, y, confidence; low-
        confidence points zeroed (frame_data.py:172-183)."""
        path = osp.join(self.get_frame_folder(idx), f"k{kid}.color.json")
        with open(path) as f:
            data = json.load(f)
        if "body_joints" in data:
            arr = np.asarray(data["body_joints"], np.float32).reshape(-1, 3)
        else:
            people = data.get("people", [])
            if not people:
                return np.zeros((25, 3), np.float32)
            arr = np.asarray(people[0]["pose_keypoints_2d"],
                             np.float32).reshape(-1, 3)
        arr = arr[:25]
        arr[arr[:, 2] < tol] = 0.0
        return arr

    def get_mocap_params(self, idx: int, kid: int):
        """FrankMocap init pose (72,) + betas (10,)."""
        path = osp.join(self.get_frame_folder(idx), f"k{kid}.mocap.json")
        with open(path) as f:
            data = json.load(f)
        return (np.asarray(data["pose"], np.float32).reshape(-1),
                np.asarray(data["betas"], np.float32).reshape(-1))

    def get_smplfit_params(self, idx: int, save_name: str):
        import pickle
        path = osp.join(self.get_frame_folder(idx),
                        f"k1.smplfit_{save_name}.pkl")
        with open(path, "rb") as f:
            return pickle.load(f)


class KinectCalib:
    """Per-kinect extrinsics (world <-> camera) from the calibration folder
    (behave/kinect_calib.py, utils.py:29-79)."""

    def __init__(self, config_folder: str, kid: int):
        path = osp.join(config_folder, str(kid), "config.json")
        with open(path) as f:
            cfg = json.load(f)
        self.rotation = np.asarray(cfg["rotation"], np.float64).reshape(3, 3)
        self.translation = np.asarray(cfg["translation"],
                                      np.float64).reshape(3)

    def world2local(self, points: np.ndarray) -> np.ndarray:
        """world -> this camera: R^T (p - t)
        (kinect world2local convention)."""
        return (points - self.translation) @ self.rotation

    def local2world(self, points: np.ndarray) -> np.ndarray:
        return points @ self.rotation.T + self.translation


class KinectTransform:
    """All-kinect transform helper (behave/kinect_transform.py)."""

    def __init__(self, seq: str, kinect_count: int = 4):
        self.seq_info = SeqInfo(seq)
        config = self.seq_info.info.get("config")
        config = config if config and osp.isdir(config) else osp.join(
            seq, "config")
        self.calibs = {}
        for kid in self.seq_info.kids:
            try:
                self.calibs[kid] = KinectCalib(config, kid)
            except FileNotFoundError:
                pass

    def world2local(self, points: np.ndarray, kid: int) -> np.ndarray:
        return self.calibs[kid].world2local(points)

    def local2world(self, points: np.ndarray, kid: int) -> np.ndarray:
        return self.calibs[kid].local2world(points)


def load_template(objects_root: str, obj_name: str, center: bool = True):
    """Load an object template mesh, centered like behave/utils.py:189-200.

    Looks for <objects_root>/<obj_name>/<obj_name>.ply (BEHAVE layout) or a
    flat <objects_root>/<obj_name>.ply.
    """
    cands = [osp.join(objects_root, obj_name, f"{obj_name}.ply"),
             osp.join(objects_root, f"{obj_name}.ply")]
    for c in cands:
        if osp.isfile(c):
            v, f = load_ply(c)
            if center:
                v = v - v.mean(0)
            return v, f
    raise FileNotFoundError(f"no template for {obj_name} under {objects_root}")
