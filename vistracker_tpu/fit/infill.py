"""Autoregressive object-pose infilling with HVOP-Net (pipeline stage 5b).

Parity targets: interp/test_infill_autoreg.py + test_cinfill_autoreg.py:
  * inputs: SMPL stream = 24-joint rot6d (144) + trans (3) = 147-d; object
    stream = rot6d (6) from the smoothed recon, zeroed on occluded frames
  * occlusion mask = predicted visibility < occ_thres (0.5); the first
    180-frame clip needs >= 30 visible frames under init_thres, else the
    sequence passes through unmodified
  * clip 0 predicts rot6d for all min(T, 180) frames; subsequent clips
    slide by window=30, feed the previous predictions as the first-30-frame
    context (mask forced visible there), and keep pred[30:]
  * the reference's loop `range(0, L-clip+1+window, window)` always ends
    with exactly ONE TRUNCATED clip (length L-start in [150, 179]) that
    re-predicts the last L-start-30 frames — truncation is NOT equivalent
    to padding + key-padding-mask because PositionEmbeddingSine_1D
    normalizes positions by the raw sequence length (posi_embed.py:46-48),
    so the truncated forward sees different positional codes. Measured on
    the cross-implementation harness: emulating it with a padded clip left
    a ~2-5 degree divergence on the final 150 frames.
  * output rotations REPLACE the input everywhere (not only occluded
    frames); translations are copied from the input

TPU-first: the sequential clip dependency is real, so the autoregression is
a lax.scan over the FULL clip starts (start <= T-180) with a carried output
buffer — one batched transformer forward per step, all inside one jit —
followed by one statically-shaped program for the reference's truncated
final clip (and a truncated seed clip when T < 180). At most three compiled
shapes per sequence length.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rotations import (axis_angle_to_rot6d, rot6d_to_rotmat,
                              rotmat_to_rot6d)
from ..models.infiller import ConditionalMInfiller, InfillerConfig
from .smoothing import smplh_to_smpl_pose


def prepare_streams(poses: np.ndarray, trans: np.ndarray,
                    obj_rot_real: np.ndarray):
    """Build the (T, 147) SMPL and (T, 6) object input streams."""
    T = len(poses)
    p72 = smplh_to_smpl_pose(poses) if poses.shape[-1] == 156 else poses
    rot6d_smpl = np.asarray(axis_angle_to_rot6d(
        jnp.asarray(p72.reshape(-1, 3)))).reshape(T, 144)
    smpl_stream = np.concatenate([rot6d_smpl, trans], 1).astype(np.float32)
    obj_stream = np.asarray(rotmat_to_rot6d(
        jnp.asarray(obj_rot_real))).astype(np.float32)
    return smpl_stream, obj_stream


def make_infiller(model, cfg: InfillerConfig = InfillerConfig()):
    """Returns infill(params, smpl_stream, obj_stream, occ_mask) jitted per
    sequence length. occ_mask (T,) bool, True = occluded.

    model: ConditionalMInfiller (HVOP-Net release, separate SMPL/object
    encoders) or MotionInfiller (the unconditional variant — one encoder
    over the concatenated 153-d stream, interp/test_infill_autoreg.py);
    the autoregression around either is identical."""
    clip, win = cfg.clip_len, cfg.window
    conditional = isinstance(model, ConditionalMInfiller)

    def forward(params, smpl_clip, obj_clip, mask_clip):
        # object inputs zeroed where occluded (model_forward); clip length
        # is whatever the caller sliced — the positional embedding
        # normalizes by it, exactly like the reference's truncated clips
        L = smpl_clip.shape[0]
        obj_in = obj_clip * (1.0 - mask_clip[:, None].astype(jnp.float32))
        if conditional:
            pred = model.apply(params, smpl_clip[None],
                               jnp.zeros((1, L), bool),
                               obj_in[None], mask_clip[None])
        else:
            src = jnp.concatenate([smpl_clip, obj_in], -1)
            pred = model.apply(params, src[None], mask_clip[None])
        return pred[0]  # (L, 6)

    @jax.jit
    def infill(params, smpl_stream, obj_stream, seed_mask, occ_mask):
        """Seed clip + all FULL autoregressive clips (start <= T-clip);
        the reference's truncated final clip runs separately (infill_tail).
        T == smpl_stream.shape[0] must be >= clip here. seed_mask is the
        init_thres mask (the reference's first clip uses the laxer seed
        threshold for the forward too, test_infill_autoreg.py:100-112)."""
        T = smpl_stream.shape[0]
        # full clips start at 0, win, 2*win, ..., <= T-clip (the reference's
        # loop also re-predicts the first clip conditioned on the seeded
        # 30-frame context, test_infill_autoreg.py:117-120)
        n_steps = (T - clip) // win + 1

        # seed pass over the first clip
        pred0 = forward(params, smpl_stream[:clip], obj_stream[:clip],
                        seed_mask[:clip])
        out0 = jnp.zeros((T, 6)).at[:clip].set(pred0)

        def step(carry, idx):
            out = carry
            start = idx * win
            sc = jax.lax.dynamic_slice_in_dim(smpl_stream, start, clip, 0)
            oc = jax.lax.dynamic_slice_in_dim(obj_stream, start, clip, 0)
            mc = jax.lax.dynamic_slice_in_dim(occ_mask, start, clip, 0)
            ctx = jax.lax.dynamic_slice_in_dim(out, start, win, 0)
            oc = oc.at[:win].set(ctx)          # carry predicted context
            mc = mc.at[:win].set(False)        # context counts as visible
            pred = forward(params, sc, oc, mc)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, pred[win:], start + win, 0)
            return out, None

        out, _ = jax.lax.scan(step, out0, jnp.arange(n_steps))
        return out

    @functools.partial(jax.jit, static_argnames=("start",))
    def infill_tail(params, out, smpl_stream, obj_stream, occ_mask, start):
        """One truncated clip [start:T] — the reference loop's final step
        (and, for 150 <= T < 180, its only step). Static tail length."""
        sc = smpl_stream[start:]
        oc = obj_stream[start:]
        mc = occ_mask[start:]
        oc = oc.at[:win].set(out[start:start + win])
        mc = mc.at[:win].set(False)
        pred = forward(params, sc, oc, mc)
        return out.at[start + win:].set(pred[win:])

    seed_only = jax.jit(forward)

    def run(params, poses, trans, obj_rot_real, occ_ratios,
            occ_thres: float = 0.5, init_thres: float = 0.5):
        """Host wrapper: reproduces the reference clip schedule exactly
        (test_infill_autoreg.py:86-165 with `range(0, L-clip+1+win, win)`):
        a seed clip of length min(T, clip), full clips at starts <= T-clip,
        and ONE truncated final clip at start 30*floor((T-150)/30) whenever
        T >= clip-win. Applies the reliable-seed gate, converts back to
        rotation matrices.

        Returns (T, 3, 3) REAL rotations, or None if passthrough
        (unreliable seeds, test_infill_autoreg.py:99-106).
        """
        T = len(poses)
        smpl_stream, obj_stream = prepare_streams(poses, trans, obj_rot_real)
        occ = np.asarray(occ_ratios).reshape(-1)
        seed_mask = occ < init_thres
        if np.sum(~seed_mask[:clip]) < win:
            return None  # passthrough
        mask = occ < occ_thres

        ss = jnp.asarray(smpl_stream)
        ob = jnp.asarray(obj_stream)
        ms = jnp.asarray(mask)
        mi = jnp.asarray(seed_mask)
        if T >= clip:
            out = infill(params, ss, ob, mi, ms)
        else:
            out = seed_only(params, ss, ob, mi)
        if T >= clip - win:
            # the reference loop's unique truncated step: the single
            # multiple of `win` in (T-clip, T-clip+win]
            start_t = win * ((T - (clip - win)) // win)
            out = infill_tail(params, out, ss, ob, ms, start_t)
        rot6d_out = out
        rots = np.asarray(rot6d_to_rotmat(rot6d_out[:T]))
        assert np.isfinite(rots).all(), "nan in infilled rotations"
        return rots

    return run


def downstream_recon_eval(run_infill, params, seqs, occ_thres: float = 0.5,
                          init_thres: float = 0.5, samples: int = 2000,
                          seed: int = 0) -> dict:
    """In-training downstream eval: run the FULL autoregressive infill on
    held-out sequences and measure object chamfer + v2v (cm) on the
    OCCLUDED frames (visibility <= occ_thres) against GT rotations.

    Parity target: trainer_cinfiller.py:46-194 (test_recon_interp) — the
    reference's integration test inside HVOP-Net training, logged per val
    epoch and here also usable for best-model selection.

    seqs: list of dicts with poses (T, 72/156), trans (T, 3),
    obj_rot_real (T, 3, 3) recon input rotations, obj_rot_gt (T, 3, 3) GT
    REAL rotations, occ (T,) visibility ratios, temp_verts (V, 3) and
    temp_faces (F, 3) object template. Returns {downstream_chamfer_cm,
    downstream_v2v_cm} averaged over occluded frames of all sequences.
    """
    from ..ops.chamfer import chamfer_distance
    from ..utils.mesh import sample_surface
    v2v_all, chamf_all = [], []
    for si, seq in enumerate(seqs):
        occ = np.asarray(seq["occ"]).reshape(-1)
        filled = run_infill(params, seq["poses"], seq["trans"],
                            seq["obj_rot_real"], occ, occ_thres=occ_thres,
                            init_thres=init_thres)
        if filled is None:  # unreliable seeds: passthrough, skip sequence
            continue
        keep = occ <= occ_thres  # evaluate only occluded frames
        if not keep.any():
            continue
        tv = np.asarray(seq["temp_verts"], np.float32)
        # rotation-only evaluation (trainer_cinfiller.py:166-172)
        ov_pred = np.einsum("vj,tij->tvi", tv, filled[keep])
        ov_gt = np.einsum("vj,tij->tvi", tv,
                          np.asarray(seq["obj_rot_gt"])[keep])
        v2v_all.extend(
            (np.linalg.norm(ov_pred - ov_gt, axis=-1).mean(1) * 100.0)
            .tolist())
        rng = np.random.RandomState(seed + si)
        tf = np.asarray(seq["temp_faces"])
        sp = sample_surface(tv, tf, samples, rng)  # fixed template samples
        sp_pred = np.einsum("vj,tij->tvi", sp, filled[keep])
        sp_gt = np.einsum("vj,tij->tvi", sp,
                          np.asarray(seq["obj_rot_gt"])[keep])
        ch = np.asarray(chamfer_distance(
            jnp.asarray(sp_pred.astype(np.float32)),
            jnp.asarray(sp_gt.astype(np.float32)),
            w1=0.5, w2=0.5)) * 100.0
        chamf_all.extend(ch.tolist())
    if not v2v_all:
        return {}
    return {"downstream_chamfer_cm": float(np.mean(chamf_all)),
            "downstream_v2v_cm": float(np.mean(v2v_all))}
