"""SMPL-T fitting: batched keypoint + temporal-loss optimization (stages 1-2).

Parity targets: /root/reference/preprocess/fit_SMPLH_kpts.py (BaseFitter:
two-phase Adam — global [trans, global_pose, top_betas] lr .01 for 8 iters,
then all params lr .001; 10 steps/iter; decaying weights w/(1+it//3)) and
fit_SMPLH_30fps.py (vertex-velocity + per-angle joint-acceleration temporal
losses, pose-init regularizer, loss weight table at :57-65, joint weights
at :26-50) and fit_SMPLH_smoothed.py (30-iter re-fit from smoothed params,
no global phase).

TPU-first: the whole optimization is ONE jit'd lax.scan over Adam steps —
the reference's 100-iter Python loop with per-step host sync becomes a
single XLA program over the full frame chunk (B consecutive frames). The
temporal stencils (velocity/acceleration over the frame axis) are
finite differences over the leading axis; under frame-axis sharding they
become ppermute halo exchanges (parallel/sharding.py).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.smpl import SMPLModel, lbs_forward
from ..core.landmarks import BodyLandmarks
from ..core.priors import MahalanobisPrior, HandPrior

# per-angle weights for the joint-acceleration loss
# (fit_SMPLH_30fps.py:26-50; 22 joints x 3 = 66 values)
JOINT_ACCEL_WEIGHTS = np.repeat(
    np.array([1.0, 10.0, 10.0, 10.0, 5.0, 5.0, 10.0, 1.0, 1.0, 10.0, 1.0,
              1.0, 0.0, 5.0, 5.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0],
             np.float32), 3)
# joint 12 (neck) has asymmetric weights (5, 10, 10)
JOINT_ACCEL_WEIGHTS[36:39] = (5.0, 10.0, 10.0)


@dataclasses.dataclass(frozen=True)
class SMPLTFitConfig:
    """Hyperparameters of the SMPL-T fitter (reference defaults)."""

    global_iters: int = 8
    max_iters: int = 100
    steps_per_iter: int = 10
    lr_global: float = 0.01
    lr_all: float = 0.001
    smpl_depth: float = 2.2
    # pixel-space intrinsics (BEHAVE kinect color)
    fx: float = 979.7844
    fy: float = 979.840
    cx: float = 1018.952
    cy: float = 779.486
    # loss weights: base constants, decayed as w/(1 + it//3)
    w_kpts: float = 0.3 ** 2
    w_temp: float = 30.0 ** 2
    w_ptemp: float = 5.0 ** 2
    w_pinit: float = 30.0 ** 2
    w_pose: float = 1e-5
    w_hand: float = 1e-5
    w_beta: float = 0.0  # 30fps fitter does not use the beta term
    # exact TOTAL Adam-step cap (0 = disabled): lets the cross-impl
    # harness stop at the precise step where the reference's early stop
    # broke out of its loop (which need not be an iteration boundary)
    total_steps_cap: int = 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SMPLTParams:
    """Split SMPL-H parameters (wrapper_pytorch.py:SplitParams layout)."""

    global_pose: jax.Array  # (B, 3)
    body_pose: jax.Array    # (B, 63)
    hand_pose: jax.Array    # (B, 90)
    top_betas: jax.Array    # (B, 2)
    other_betas: jax.Array  # (B, 8)
    trans: jax.Array        # (B, 3)

    @property
    def pose(self) -> jax.Array:
        return jnp.concatenate([self.global_pose, self.body_pose,
                                self.hand_pose], axis=-1)

    @property
    def betas(self) -> jax.Array:
        return jnp.concatenate([self.top_betas, self.other_betas], axis=-1)

    @classmethod
    def from_full(cls, pose: jax.Array, betas: jax.Array, trans: jax.Array):
        return cls(global_pose=pose[:, :3], body_pose=pose[:, 3:66],
                   hand_pose=pose[:, 66:156], top_betas=betas[:, :2],
                   other_betas=betas[:, 2:], trans=trans)


def init_trans_from_bbox(bbox_center: np.ndarray, cfg: SMPLTFitConfig) -> np.ndarray:
    """Back-project person-mask bbox centers (N, 2) to depth smpl_depth.

    Parity: fit_SMPLH_30fps.py:131-136.
    """
    bx = (bbox_center[:, 0] - cfg.cx) / cfg.fx * cfg.smpl_depth
    by = (bbox_center[:, 1] - cfg.cy) / cfg.fy * cfg.smpl_depth
    bz = np.full_like(bx, cfg.smpl_depth)
    return np.stack([bx, by, bz], -1).astype(np.float32)


def project_pixels(points: jax.Array, cfg: SMPLTFitConfig) -> jax.Array:
    """(B, J, 3) camera-frame -> (B, J, 2) full-image pixels."""
    z = points[..., 2:3]
    px = points[..., 0:1] * cfg.fx / z + cfg.cx
    py = points[..., 1:2] * cfg.fy / z + cfg.cy
    return jnp.concatenate([px, py], axis=-1)


def smplt_loss_terms(params: SMPLTParams, model: SMPLModel,
                     landmarks: BodyLandmarks, body_prior: MahalanobisPrior,
                     hand_prior: HandPrior, kpts: jax.Array,
                     pose_init: jax.Array, cfg: SMPLTFitConfig) -> dict:
    """All loss terms, un-weighted. kpts: (B, 25, 3) pixel x, y, confidence."""
    pose = params.pose
    verts, _, _, _ = lbs_forward(model, pose, params.betas, params.trans)
    joints = landmarks.body_joints(verts)             # (B, 25, 3)
    proj = project_pixels(joints, cfg)
    err = (proj - kpts[..., :2]) ** 2 * kpts[..., 2:3]
    terms = {"kpts": err.mean()}

    # vertex-velocity smoothness: ||v[t+1]-v[t] - (v[t]-v[t-1])||^2
    velo1 = verts[1:-1] - verts[:-2]
    velo2 = verts[2:] - verts[1:-1]
    terms["temp"] = ((velo1 - velo2) ** 2).mean()

    # joint-angle acceleration on the 66 body-pose dims, per-angle weighted
    p66 = pose[:, :66]
    pv1 = p66[1:-1] - p66[:-2]
    pv2 = p66[2:] - p66[1:-1]
    terms["ptemp"] = (((pv1 - pv2) ** 2)
                      * jnp.asarray(JOINT_ACCEL_WEIGHTS)[None]).mean()

    terms["pose"] = body_prior(pose[:, :72]).mean()
    terms["hand"] = hand_prior(pose).mean()
    terms["pinit"] = ((pose_init[:, 3:66] - params.body_pose) ** 2).mean()
    return terms


def weighted_total(terms: dict, cfg: SMPLTFitConfig, decay: jax.Array) -> jax.Array:
    """sum of w_k * term_k / (1 + decay) — parity: BaseFitter.sum_dict."""
    scale = 1.0 / (1.0 + decay)
    w = dict(kpts=cfg.w_kpts, temp=cfg.w_temp, ptemp=cfg.w_ptemp,
             pinit=cfg.w_pinit, pose=cfg.w_pose, hand=cfg.w_hand)
    return sum(terms[k] * w[k] * scale for k in w)


def _phase_scan(loss_fn, params: SMPLTParams, lr: float, n_steps: int,
                step_offset: int, steps_per_iter: int, active: dict):
    """Run n_steps Adam steps; gradients of inactive leaves are zeroed
    (zero-grad Adam leaves them exactly unchanged, so this reproduces the
    reference's phase-restricted optimizers including fresh-moment restarts).
    """
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    mask = SMPLTParams(**{
        k: jnp.float32(1.0 if active[k] else 0.0)
        for k in ("global_pose", "body_pose", "hand_pose", "top_betas",
                  "other_betas", "trans")})

    def body(carry, step_idx):
        p, s = carry
        it = (step_offset + step_idx) // steps_per_iter
        decay = it // 3
        loss, grads = jax.value_and_grad(loss_fn)(p, decay.astype(jnp.float32))
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        updates, s = opt.update(grads, s)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(body, (params, opt_state),
                                       jnp.arange(n_steps))
    return params, losses


@functools.partial(jax.jit, static_argnames=("cfg", "skip_global_phase"))
def fit_smplt(model: SMPLModel, landmarks: BodyLandmarks,
              body_prior: MahalanobisPrior, hand_prior: HandPrior,
              kpts: jax.Array, init: SMPLTParams,
              cfg: SMPLTFitConfig = SMPLTFitConfig(),
              skip_global_phase: bool = False):
    """Fit a chunk of B consecutive frames. Returns (params, loss trace).

    One compiled program: phase 1 (global pose) scan then phase 2 (all
    params) scan. The reference's early stopping is replaced by a fixed
    iteration budget (shape-static for XLA); budgets match its max_iters.
    """
    pose_init = init.pose

    def loss_fn(p, decay):
        terms = smplt_loss_terms(p, model, landmarks, body_prior, hand_prior,
                                 kpts, pose_init, cfg)
        return weighted_total(terms, cfg, decay)

    spi = cfg.steps_per_iter
    params = init
    losses = []
    n1 = cfg.global_iters * spi
    if cfg.total_steps_cap:
        n1 = min(n1, cfg.total_steps_cap)
    if not skip_global_phase:
        params, l1 = _phase_scan(
            loss_fn, params, cfg.lr_global, n1, 0, spi,
            dict(global_pose=True, body_pose=False, hand_pose=False,
                 top_betas=True, other_betas=False, trans=True))
        losses.append(l1)
    n2 = (cfg.max_iters - (0 if skip_global_phase else cfg.global_iters)) * spi
    if cfg.total_steps_cap:
        n2 = max(0, cfg.total_steps_cap
                 - (0 if skip_global_phase else n1))
    offset = 0 if skip_global_phase else cfg.global_iters * spi
    # phase 2 optimizes everything EXCEPT hand pose (which stays at the GRAB
    # mean) — parity: fit_SMPLH_kpts.py:init_allpose_optimizer
    params, l2 = _phase_scan(
        loss_fn, params, cfg.lr_all, n2, offset, spi,
        dict(global_pose=True, body_pose=True, hand_pose=False,
             top_betas=True, other_betas=True, trans=True))
    losses.append(l2)
    return params, jnp.concatenate(losses)
