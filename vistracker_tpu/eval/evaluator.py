"""Windowed packed-file evaluator (pipeline stage 7).

Parity target: recon/eval/evalvideo_packed.py (VideoPackedEvaluator):
  * per sequence: rebuild SMPL verts from packed params (our JAX LBS) and
    object verts from the template + packed pose
  * a single Procrustes (R, t, s) per W-frame window, fit on the
    concatenated SMPL+object verts of all recon_exist frames in the window,
    applied to the whole window (W=300 default; W=1 == CHORE protocol)
  * per frame: bidirectional sqrt-chamfer on 10k surface samples + v2v (cm)
  * per window: acceleration error, broadcast to the window's frames
  * JSON summary {metric: {mean, std}} with keys smpl_chamf, obj_chamf,
    smpl_v2v, obj_v2v, smpl-acc, obj-acc + per-seq / per-object breakdowns

Replaces the reference's mp.Process-per-sequence CPU fan-out: the heavy
math (LBS + chamfer) runs batched on the TPU; the window bookkeeping stays
in numpy.
"""
from __future__ import annotations

import datetime
import json
import os
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..core.smpl import SMPLModel, lbs_forward
from ..data.packed import PackedRecon, recon_obj_verts, gt_obj_verts
from .metrics import (compute_transform, apply_transform, v2v_error,
                      chamfer_error, accel_error)

ERROR_KEYS = ("smpl_chamf", "obj_chamf", "smpl_v2v", "obj_v2v",
              "smpl-acc", "obj-acc")


def smpl_verts_from_packed(model: SMPLModel, poses, betas, trans,
                           batch: int = 256) -> np.ndarray:
    """(T, 156/72), (T, 10), (T, 3) -> (T, V, 3) via the JAX LBS."""
    out = []
    T = len(poses)
    for s in range(0, T, batch):
        v, _, _, _ = lbs_forward(model, jnp.asarray(poses[s:s + batch]),
                                 jnp.asarray(betas[s:s + batch]),
                                 jnp.asarray(trans[s:s + batch]))
        out.append(np.asarray(v))
    return np.concatenate(out, 0)


def eval_sequence(sverts_gt: np.ndarray, overts_gt: np.ndarray,
                  sverts_recon: np.ndarray, overts_recon: np.ndarray,
                  smpl_faces: np.ndarray, obj_faces: np.ndarray,
                  recon_exist: np.ndarray | None = None,
                  window: int = 300, align: bool = True,
                  smpl_only: bool = False,
                  chamfer_samples: int = 10000) -> np.ndarray:
    """Per-frame error matrix (N_valid, 6) ordered like ERROR_KEYS."""
    L = len(sverts_gt)
    recon_exist = (np.ones(L, bool) if recon_exist is None
                   else np.asarray(recon_exist, bool))
    errors_all = []
    smpl_acc, obj_acc = [], []
    win_sgt, win_srec, win_ogt, win_orec = [], [], [], []
    R = t = s = None
    count = 0
    for i in range(L):
        count += 1
        if align and (R is None or count % window == 0):
            bend = min(L, i + window)
            idx = np.arange(i, bend)[recon_exist[i:bend]]
            if len(idx) == 0:
                continue
            if smpl_only:
                clip_gt = sverts_gt[idx].reshape(-1, 3)
                clip_rc = sverts_recon[idx].reshape(-1, 3)
            else:
                clip_gt = np.concatenate(
                    [sverts_gt[idx].reshape(-1, 3),
                     overts_gt[idx].reshape(-1, 3)], 0)
                clip_rc = np.concatenate(
                    [sverts_recon[idx].reshape(-1, 3),
                     overts_recon[idx].reshape(-1, 3)], 0)
            R, t, s = compute_transform(clip_rc, clip_gt)
        if not recon_exist[i]:
            continue
        if align:
            s_al = apply_transform(sverts_recon[i], R, t, s)
            o_al = apply_transform(overts_recon[i], R, t, s)
        else:
            s_al, o_al = sverts_recon[i], overts_recon[i]
        win_sgt.append(sverts_gt[i]); win_srec.append(s_al)
        win_ogt.append(overts_gt[i]); win_orec.append(o_al)
        errors_all.append([
            chamfer_error(sverts_gt[i], smpl_faces, s_al, smpl_faces,
                          chamfer_samples),
            chamfer_error(overts_gt[i], obj_faces, o_al, obj_faces,
                          chamfer_samples),
            v2v_error(sverts_gt[i], s_al),
            v2v_error(overts_gt[i], o_al),
        ])
        if count % window == 0 or i == L - 1:
            cl = len(win_sgt)
            acc_s = accel_error(np.stack(win_sgt), np.stack(win_srec))
            acc_o = accel_error(np.stack(win_ogt), np.stack(win_orec))
            smpl_acc.extend([acc_s] * cl)
            obj_acc.extend([acc_o] * cl)
            win_sgt, win_srec, win_ogt, win_orec = [], [], [], []
    if not errors_all:
        return np.zeros((0, 6))
    err = np.asarray(errors_all)
    return np.concatenate(
        [err, np.asarray(smpl_acc)[:, None], np.asarray(obj_acc)[:, None]], 1)


def rotation_errors_deg(rot_recon: np.ndarray, rot_gt: np.ndarray) -> np.ndarray:
    """Per-frame geodesic rotation error in degrees (the angle evaluator,
    evalvideo_packed_angle.py / pose_utils.py:rot_error). Both (T, 3, 3)
    REAL rotation matrices (un-transpose packed obj_angles first)."""
    rel = np.einsum("tij,tkj->tik", rot_recon, rot_gt)
    tr = np.clip((np.trace(rel, axis1=1, axis2=2) - 1.0) * 0.5, -1.0, 1.0)
    return np.degrees(np.arccos(tr))


def format_errors(errors: np.ndarray) -> dict:
    out = {}
    for i, k in enumerate(ERROR_KEYS):
        out[k] = {"mean": float(np.mean(errors[:, i])),
                  "std": float(np.std(errors[:, i]))}
    out["total"] = int(len(errors))
    return out


def object_name_of(seq_name: str) -> str:
    parts = seq_name.split("_")
    return parts[2] if len(parts) > 2 else seq_name


def collect_results(errors_dict: dict, outdir: str, save_name: str,
                    split_name: str = "", extra: dict | None = None) -> str:
    """Aggregate per-sequence error matrices into the reference JSON layout."""
    all_errs = np.concatenate(list(errors_dict.values()), 0)
    result = format_errors(all_errs)
    result["separate"] = {k: format_errors(v)
                          for k, v in sorted(errors_dict.items())}
    per_obj = {}
    for seq, errs in errors_dict.items():
        name = object_name_of(seq)
        per_obj.setdefault(name, []).append(errs)
    for name, errs in sorted(per_obj.items()):
        result[name] = format_errors(np.concatenate(errs, 0))
    result["save_name"] = save_name
    ts = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    result["time"] = ts
    if extra:
        result.update(extra)
    os.makedirs(outdir, exist_ok=True)
    outfile = os.path.join(outdir, f"{split_name}{save_name}_{ts}.json")
    with open(outfile, "w", encoding="utf-8") as f:
        json.dump(result, f, ensure_ascii=False, indent=2)
    return outfile
