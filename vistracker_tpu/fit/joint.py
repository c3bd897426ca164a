"""Joint SMPL + object optimization against the neural fields (stage 6) —
the metric-critical loop.

Parity targets:
  * recon/recon_fit_behave.py:optimize_smpl (phases beta -> all-pose ->
    kpts; Adam lr .02 -> .006; losses df_h clamp 0.1, part CE, priors,
    smplz, pinit, j2d, stemp; decay 1 except kpts it/3)
  * recon/recon_fit_trivis_full.py:optimize_smpl_object (phases
    object-only 15 it [Adam R lr .002 / t lr .006] -> sil 30 it
    [Adam R,t lr .006] -> joint <=100 it [Adam t lr .002]; loss-weight
    table :124-153; occ-ratio weighting; temporal otemp/ovtemp with x10 in
    joint; contact dfs computed ONCE at joint start; 10 steps/iter;
    zero-grad each step; fresh Adam moments at each OBJECT phase switch,
    but the smpl pose->kpts phases share one Adam instance)
  * recon/obj_pose_roi.py:SilLossROI (occlusion-aware ROI silhouette L2)
  * recon/recon_fit_base.py:compute_contact_loss (part-paired chamfer),
    transform_obj_verts ((v @ R + t) * s), decopose_axis (SO(3) projection
    with 1e-4 tie-breaking noise — ours is a fixed perturbation so the
    compiled program stays deterministic; see _TIE_BREAK below).

TPU-first design: every phase is one jit'd lax.scan over Adam steps on the
whole frame chunk; early stopping becomes a fixed budget (configurable).
The BVH collision loss is replaced by an SDF-grid penalty (ops/sdf_grid.py)
and is optional, mirroring the reference's hostname gate
(recon_fit_base.py:106).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..core.smpl import SMPLModel, lbs_forward
from ..core.landmarks import BodyLandmarks, SMPL_CENTER_JOINT
from ..core.priors import MahalanobisPrior, HandPrior
from ..core.rotations import project_so3
from ..ops.chamfer import label_compatible_nn
from ..ops.pallas_nn import label_nn_pallas_batched
from ..ops.rasterizer import soft_silhouette
from ..ops.pallas_raster import soft_silhouette_batch
from ..ops.sdf_grid import SDFGrid, penetration_loss
from .smplt import SMPLTParams

NUM_PARTS = 14

# SVD gradients are undefined when singular values coincide — exactly the
# case for a clean rotation matrix. The reference breaks the tie with
# 1e-4 * rand noise (recon_fit_base.py:469); we use a FIXED perturbation so
# the program stays deterministic.
_TIE_BREAK = np.array([[0.31, 0.74, 0.17],
                       [0.58, 0.09, 0.93],
                       [0.42, 0.66, 0.25]], np.float32)


def decopose_axis(rot: jax.Array) -> jax.Array:
    """SO(3) projection with deterministic tie-breaking noise
    (parity: recon_fit_base.py:decopose_axis)."""
    return project_so3(rot + 1e-4 * jnp.asarray(_TIE_BREAK))


@dataclasses.dataclass(frozen=True)
class JointFitConfig:
    # SMPL phase (optimize_smpl): iters x 10 steps
    iter_betas: int = 1
    iter_pose: int = 1
    iter_kpts: int = 1
    smpl_max_iter: int = 100
    lr_betas: float = 0.02
    lr_pose: float = 0.006
    # object phases
    iter_obj: int = 15
    iter_sil: int = 30
    # reference joint phase length: max_iter(100) + joint_iter(10)
    # (recon_fit_trivis_full.py:327 loop bound minus obj+sil)
    joint_max_iter: int = 110
    lr_obj_r: float = 0.002
    lr_obj_t: float = 0.006
    lr_sil: float = 0.006
    lr_joint: float = 0.002
    steps_per_iter: int = 10
    # thresholds
    df_h_clamp: float = 0.1
    df_o_clamp: float = 0.8
    cont_thres: float = 0.08
    z0: float = 2.2
    obj_scale: float = 1.0
    sil_size: int = 256
    # fixed sigma (~1 px at sil_size). Measured basin (PERF_NOTES round 2):
    # the min-edge-LINE sigmoid has long-range gradients (edge lines extend
    # beyond the triangle), recovering inits ~2 object radii off — a
    # coarse-to-fine sigma anneal was tried and measured WORSE (blurred
    # render vs sharp reference corrupts the landscape), so none is used.
    sil_sigma: float = 1.0 / 128.0
    # faces per rasterizer scan step: the (B, chunk, 3, size^2) edge tensor
    # must fit HBM through the (rematted) backward; 32 keeps it < 1 GB at
    # B=32, 256^2
    sil_face_chunk: int = 32
    # "auto" = fused Pallas rasterizer kernel on TPU (ops/pallas_raster.py),
    # chunked-scan XLA path elsewhere; "xla"/"pallas" force a backend
    sil_backend: str = "auto"
    # contact-pairing NN backend: "auto" = fused Pallas label-NN kernel on
    # TPU (ops/pallas_nn.py — saved-argmin custom VJP, 3.4x the chunked
    # XLA path at release sizes, scripts/bench_label_nn.py), "xla"/"pallas"
    # force a backend
    contact_backend: str = "auto"
    collision: bool = False  # reference gates this by hostname
    # early stopping (reference semantics); off by default so fixed-budget
    # runs and tests stay deterministic in length
    early_stop: bool = False
    smpl_rel_tol: float = 1e-3   # recon_fit_behave.py:165
    joint_rel_tol: float = 1e-4  # recon_fit_trivis_full.py:372
    early_stop_min_frac: float = 0.25
    # query only this many SMPL vertices (evenly strided) in the df/part
    # losses; 0 = all 6890 (reference). The query is gather-bound at
    # ~0.6 us/point (PERF_NOTES.md), so 2048 cuts the smpl-phase step time
    # ~3x; the CE term is rescaled to keep the loss balance.
    smpl_query_points: int = 0
    # loss weight base constants (w * cst / (1 + decay))
    w_pose: float = 1e-5
    w_hand: float = 1e-5
    w_j2d: float = 0.3 ** 2
    w_object: float = 30.0 ** 2
    w_part: float = 0.05 ** 2
    w_contact: float = 30.0 ** 2
    w_scale: float = 10.0 ** 2
    w_df_h: float = 10.0 ** 2
    w_smplz: float = 30.0 ** 2
    w_mask: float = 0.03 ** 2
    w_ocent: float = 0.0
    w_collide: float = 3.0 ** 2
    w_pinit: float = 5.0 ** 2
    w_trans: float = 10.0 ** 2
    w_stemp: float = 100.0 ** 2
    w_otemp: float = 15.0 ** 2
    w_ovtemp: float = 50.0 ** 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SilRefs:
    """Host-prepared occlusion-aware silhouette references (SilLossROI)."""

    image_ref: jax.Array  # (B, S, S) object mask crop in ROI
    keep_mask: jax.Array  # (B, S, S) 1 = scored pixel, 0 = person-occluded
    roi_xyb: jax.Array    # (B, 3) ROI square (x, y, side) in orig pixels


def transform_obj_verts(verts: jax.Array, obj_r: jax.Array, obj_t: jax.Array,
                        obj_s: jax.Array) -> jax.Array:
    """(B, N, 3) @ (B, 3, 3) + t, then scale — recon_fit_base.py:455-459.
    Note the ROW-VECTOR convention (v @ R), matching the packed obj_angles."""
    v = jnp.einsum("bnk,bkj->bnj", verts, obj_r,
                   precision=jax.lax.Precision.HIGHEST)
    return (v + obj_t[:, None, :]) * obj_s[:, None, None]


def init_object_orientation(tgt_axis: jax.Array, src_axis: jax.Array) -> jax.Array:
    """Relative rotation from template PCA axes to predicted axes
    (recon_fit_base.py:202-215: pinv(src) @ tgt, projected to SO(3))."""
    pseudo = jnp.linalg.pinv(src_axis)
    return project_so3(jnp.matmul(pseudo, tgt_axis,
                                  precision=jax.lax.Precision.HIGHEST))


def _adam_scan(loss_fn: Callable, params, lrs: dict, n_steps: int,
               decay_fn: Callable):
    """Generic phase runner: per-leaf learning rates (0 freezes a leaf via
    zeroed gradients), fresh Adam state, lax.scan over steps."""
    label = {k: k for k in params}
    opt = optax.multi_transform(
        {k: optax.adam(lr) if lr > 0 else optax.set_to_zero()
         for k, lr in lrs.items()}, label)
    state = opt.init(params)

    def body(carry, step_idx):
        p, s = carry
        decay = decay_fn(step_idx)
        loss, grads = jax.value_and_grad(loss_fn)(p, decay)
        grads = {k: g * (1.0 if lrs[k] > 0 else 0.0)
                 for k, g in grads.items()}
        updates, s = opt.update(grads, s)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(body, (params, state),
                                       jnp.arange(n_steps))
    return params, losses


def _adam_while(loss_fn: Callable, params, lrs: dict, max_iters: int,
                steps_per_iter: int, decay_fn: Callable,
                rel_tol: float, min_iters: float):
    """Early-stopping phase runner: a lax.while_loop over ITERATIONS (each
    = steps_per_iter Adam steps), stopping once the relative loss change
    between iteration boundaries satisfies the reference criterion
    |prev - loss| / prev < prev * rel_tol after min_iters LOCAL iterations.
    Callers convert the reference's GLOBAL-iteration gates (e.g. the joint
    phase's `it > 0.25*max_iter` with it already past iter_obj+iter_sil,
    recon_fit_trivis_full.py:372-375) into the local offset — the joint
    phase may legitimately stop on its first iteration.

    Returns (params, final_loss, iters_used). No per-step loss trace (a
    while_loop cannot stack outputs).
    """
    label = {k: k for k in params}
    opt = optax.multi_transform(
        {k: optax.adam(lr) if lr > 0 else optax.set_to_zero()
         for k, lr in lrs.items()}, label)
    state = opt.init(params)

    def one_iter(p, s, it):
        def step(k, carry):
            p, s, _ = carry
            decay = decay_fn(it * steps_per_iter + k)
            loss, grads = jax.value_and_grad(loss_fn)(p, decay)
            grads = {k2: g * (1.0 if lrs[k2] > 0 else 0.0)
                     for k2, g in grads.items()}
            updates, s = opt.update(grads, s)
            p = optax.apply_updates(p, updates)
            return (p, s, loss)
        return jax.lax.fori_loop(0, steps_per_iter, step,
                                 (p, s, jnp.float32(0.0)))

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iters) & ~done

    def body(carry):
        p, s, prev, it, _ = carry
        p, s, loss = one_iter(p, s, it)
        rel = jnp.abs(prev - loss) / jnp.maximum(jnp.abs(prev), 1e-12)
        done = (rel < jnp.abs(prev) * rel_tol) & (it > min_iters)
        return (p, s, loss, it + 1, done)

    p, _, loss, iters, _ = jax.lax.while_loop(
        cond, body, (params, state, jnp.float32(300.0), jnp.int32(0),
                     jnp.asarray(False)))
    return p, loss, iters


def _make_phase_stepper(loss_fn, lrs: dict, steps_per_iter: int, decay_fn,
                        rel_tol: float):
    """Host-segmented phase runner: same per-iteration semantics as
    _adam_while (Adam updates, decay schedule, relative-loss early stop),
    but each DEVICE PROGRAM advances at most `seg` iterations; the Adam
    state, previous loss, and iteration counter carry across calls on the
    host. Needed because the axon TPU tunnel kills single program
    executions beyond a few minutes (PERF_NOTES) — at full reference
    budgets one while_loop program can run 1000+ Adam steps.

    loss_fn(params, decay, env) -> scalar; env is an arbitrary pytree of
    per-chunk tensors (never closed over — jit would embed them).
    rel_tol=0 disables early stopping (fixed-budget scan semantics).
    Returns run(params, env, max_iters, min_iters, seg) ->
    (params, last_loss, iters_used).
    """
    label = {k: k for k in lrs}
    opt = optax.multi_transform(
        {k: optax.adam(lr) if lr > 0 else optax.set_to_zero()
         for k, lr in lrs.items()}, label)

    @functools.partial(jax.jit, static_argnames=("seg",))
    def advance(params, state, prev, it, done, env, max_iters, min_iters,
                seg):
        def one_iter(p, s, it):
            def step(k, carry):
                p, s, _ = carry
                decay = decay_fn(it * steps_per_iter + k)
                loss, grads = jax.value_and_grad(loss_fn)(p, decay, env)
                grads = {k2: g * (1.0 if lrs[k2] > 0 else 0.0)
                         for k2, g in grads.items()}
                updates, s = opt.update(grads, s)
                p = optax.apply_updates(p, updates)
                return (p, s, loss)
            return jax.lax.fori_loop(0, steps_per_iter, step,
                                     (p, s, jnp.float32(0.0)))

        def cond(carry):
            _, _, _, it, done, k = carry
            return (k < seg) & (it < max_iters) & ~done

        def body(carry):
            p, s, prev, it, _, k = carry
            p, s, loss = one_iter(p, s, it)
            rel = jnp.abs(prev - loss) / jnp.maximum(jnp.abs(prev), 1e-12)
            done = (rel < jnp.abs(prev) * rel_tol) & (it > min_iters)
            return (p, s, loss, it + 1, done, k + 1)

        params, state, prev, it, done, _ = jax.lax.while_loop(
            cond, body, (params, state, prev, it, done, jnp.int32(0)))
        return params, state, prev, it, done

    def run(params, env, max_iters: int, min_iters: float = -1.0,
            seg: int = 8):
        state = opt.init(params)
        prev = jnp.float32(300.0)
        it = jnp.int32(0)
        done = jnp.asarray(False)
        if rel_tol == 0:
            # fixed budget: `done` is constant-False inside advance, so
            # the segment count is static — dispatch the whole chain
            # WITHOUT host syncs (JAX async dispatch queues the
            # programs; each stays under the tunnel's per-execution
            # limit). The old `while int(it) < ...` loop forced a
            # blocking device->host round-trip per segment, which at
            # ~300 segments/chunk was the dominant stage-6 wall-clock
            # overhead (PERF_NOTES round 3: 36.7 s wall vs ~14-19 s
            # device-sum at B=8).
            for _ in range(-(-max_iters // seg)):
                params, state, prev, it, done = advance(
                    params, state, prev, it, done, env,
                    jnp.int32(max_iters), jnp.float32(min_iters), seg)
            return params, prev, it
        while int(it) < max_iters and not bool(done):
            params, state, prev, it, done = advance(
                params, state, prev, it, done, env,
                jnp.int32(max_iters), jnp.float32(min_iters), seg)
        return params, prev, it

    @jax.jit
    def one_step(p, s, env, k):
        """Exactly one Adam step (the body of `step` above) as a LOOP-FREE
        program: XLA's cost analysis counts while/scan bodies once, so
        roofline accounting (scripts/roofline.py) lowers THIS and
        multiplies by the step budget on the host."""
        decay = decay_fn(k)
        loss, grads = jax.value_and_grad(loss_fn)(p, decay, env)
        grads = {k2: g * (1.0 if lrs[k2] > 0 else 0.0)
                 for k2, g in grads.items()}
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    run.one_step, run.opt = one_step, opt
    return run


# ---------------------------------------------------------------------------
# SMPL phase
# ---------------------------------------------------------------------------

def make_smpl_optimizer(query_fn, project_fn, model: SMPLModel,
                        landmarks: BodyLandmarks,
                        body_prior: MahalanobisPrior, hand_prior: HandPrior,
                        part_labels: np.ndarray,
                        cfg: JointFitConfig = JointFitConfig(),
                        segment_iters: int | None = None,
                        report_iters: bool = False):
    """Build the jit'd optimize_smpl program ONCE per model; run per chunk.

    query_fn(ctx, points (B,N,3)) -> head dict (df (B,N,2), parts, ...);
    project_fn(ctx, joints (B,J,3)) -> crop-normalized 2D (B,J,2).
    `ctx` is an arbitrary pytree (network params, encoded image cache, crop
    and body centers) passed through optimize_smpl as a RUNTIME argument —
    never close over per-chunk arrays: under jit they become embedded
    constants and every chunk would retrace and recompile (minutes per
    chunk on the axon tunnel, and giant compile payloads).

    segment_iters: when set, execute the phases as a HOST loop over
    bounded device programs of at most that many iterations each
    (_make_phase_stepper) — identical per-iteration math and early-stop
    checks, but no single device execution runs the whole budget (the
    axon tunnel kills multi-minute executions).
    """
    labels = jnp.asarray(part_labels)
    n_verts = len(part_labels)
    if cfg.smpl_query_points and cfg.smpl_query_points < n_verts:
        q_idx = np.linspace(0, n_verts - 1, cfg.smpl_query_points,
                            dtype=np.int64)
        ce_scale = n_verts / float(cfg.smpl_query_points)
    else:
        q_idx = None
        ce_scale = 1.0
    labels_q = labels if q_idx is None else labels[jnp.asarray(q_idx)]

    def loss_terms(p: SMPLTParams, aux, ctx, phase_kpts: bool):
        verts, _, _, _ = lbs_forward(model, p.pose, p.betas, p.trans)
        qverts = verts if q_idx is None else verts[:, jnp.asarray(q_idx)]
        preds = query_fn(ctx, qverts)
        terms = {}
        terms["df_h"] = jnp.minimum(preds["df"][..., 0], cfg.df_h_clamp).mean()
        logp = jax.nn.log_softmax(preds["parts"], axis=-1)
        ce = -jnp.take_along_axis(
            logp, jnp.broadcast_to(labels_q, qverts.shape[:2])[..., None],
            axis=-1)[..., 0]
        terms["part"] = ce.sum(-1).mean() * ce_scale
        terms["pose"] = body_prior(p.pose[:, :72]).mean()
        terms["hand"] = hand_prior(p.pose).mean()
        joints = landmarks.body_joints(verts)
        terms["smplz"] = ((joints[:, SMPL_CENTER_JOINT, 2] - cfg.z0) ** 2).mean()
        terms["pinit"] = jnp.sum((p.body_pose - aux["pose_init"]) ** 2,
                                 -1).mean()
        if phase_kpts:
            proj = project_fn(ctx, joints)  # crop-normalized (B, 25, 2)
            err = ((proj - aux["body_kpts"][..., :2]) ** 2).sum(-1)
            terms["j2d"] = (err * aux["body_kpts"][..., 2]).mean()
        if verts.shape[0] >= 4:
            v1 = verts[1:-1] - verts[:-2]
            v2 = verts[2:] - verts[1:-1]
            terms["stemp"] = ((v1 - v2) ** 2).mean()
        return terms, verts

    def weighted(terms, decay):
        w = dict(df_h=cfg.w_df_h, part=cfg.w_part, pose=cfg.w_pose,
                 hand=cfg.w_hand, smplz=cfg.w_smplz, pinit=cfg.w_pinit,
                 j2d=cfg.w_j2d, stemp=cfg.w_stemp)
        scale = 1.0 / (1.0 + decay)
        return sum(terms[k] * w[k] * scale for k in terms if k in w)

    spi = cfg.steps_per_iter

    def loss1_env(pdict, decay, env):
        terms, _ = loss_terms(SMPLTParams(**pdict), env["aux"], env["ctx"],
                              False)
        return weighted(terms, decay)

    def loss23_env(pdict, decay_and_kw, env):
        # phases 2+3 run in ONE optimizer: the j2d term switches on via
        # a traced weight instead of a phase boundary
        decay, kw = decay_and_kw
        terms, _ = loss_terms(SMPLTParams(**pdict), env["aux"], env["ctx"],
                              True)
        terms = dict(terms)
        terms["j2d"] = terms["j2d"] * kw
        return weighted(terms, decay)

    kpts_from = cfg.iter_betas + cfg.iter_pose  # global iter of phase 3

    def decay23(s):
        it = cfg.iter_betas + s // spi  # global iteration counter
        kpts_on = (it >= kpts_from).astype(jnp.float32)
        decay = jnp.where(kpts_on > 0, it.astype(jnp.float32) / 3.0, 1.0)
        return (decay, kpts_on)

    field_names = [f.name for f in dataclasses.fields(SMPLTParams)]
    zero = {k: 0.0 for k in field_names}
    # phase 1: betas (top) + trans, lr .02
    lrs1 = {**zero, "top_betas": cfg.lr_betas, "trans": cfg.lr_betas}
    # phases 2 (all pose) + 3 (+ keypoints) share ONE Adam instance —
    # the reference only re-creates the optimizer at the beta->pose
    # boundary (recon_fit_behave.py:409-430), so the kpts phase starts
    # with warm moments, not a fresh bias-correction ramp.
    lrs23 = {**zero, "trans": cfg.lr_pose, "global_pose": cfg.lr_pose,
             "body_pose": cfg.lr_pose, "top_betas": cfg.lr_pose,
             "other_betas": cfg.lr_pose}
    n23 = cfg.iter_pose + cfg.iter_kpts + cfg.smpl_max_iter
    # reference gate: it > 0.25*max_iter + iter_betas + iter_pose
    # (global) -> local offset within this merged phase
    min23 = cfg.early_stop_min_frac * cfg.smpl_max_iter + cfg.iter_pose

    if segment_iters:
        run1 = _make_phase_stepper(loss1_env, lrs1, spi,
                                   lambda s: jnp.float32(1.0), 0.0)
        run23 = _make_phase_stepper(
            loss23_env, lrs23, spi, decay23,
            cfg.smpl_rel_tol if cfg.early_stop else 0.0)

        def optimize_smpl_segmented(smpl: SMPLTParams, body_kpts, ctx=None):
            env = dict(aux=dict(pose_init=smpl.body_pose,
                                body_kpts=body_kpts), ctx=ctx)
            pdict = dataclasses.asdict(smpl)
            pdict, l1, _ = run1(pdict, env, cfg.iter_betas,
                                seg=segment_iters)
            pdict, l23, it23 = run23(pdict, env, n23,
                                     min23 if cfg.early_stop else -1.0,
                                     segment_iters)
            out = SMPLTParams(**pdict), jnp.stack([l1, l23])
            return out + ({"smpl": it23, "smpl_max": n23},) if report_iters \
                else out

        def _cost_probe(smpl, body_kpts, ctx=None):
            """Compile ONE Adam step of the dominant (pose+kpts) phase;
            returns {phase: (compiled, args, steps_total)} for
            scripts/roofline.py (cost_analysis + wall-time probing)."""
            env = dict(aux=dict(pose_init=smpl.body_pose,
                                body_kpts=body_kpts), ctx=ctx)
            pdict = dataclasses.asdict(smpl)
            state = run23.opt.init(pdict)
            args = (pdict, state, env, jnp.int32(0))
            return {"smpl": (run23.one_step.lower(*args).compile(), args,
                             n23 * spi)}

        optimize_smpl_segmented.cost_probe = _cost_probe
        return optimize_smpl_segmented

    @jax.jit
    def optimize_smpl(smpl: SMPLTParams, body_kpts, ctx=None):
        env = dict(aux=dict(pose_init=smpl.body_pose, body_kpts=body_kpts),
                   ctx=ctx)
        pdict = dataclasses.asdict(smpl)
        pdict, l1 = _adam_scan(
            lambda p, d: loss1_env(p, d, env), pdict, lrs1,
            cfg.iter_betas * spi, lambda s: jnp.float32(1.0))

        loss23 = lambda p, d: loss23_env(p, d, env)
        if cfg.early_stop:
            pdict, last, it23 = _adam_while(loss23, pdict, lrs23, n23, spi,
                                            decay23, cfg.smpl_rel_tol, min23)
            l23 = last[None]
        else:
            pdict, l23 = _adam_scan(loss23, pdict, lrs23, n23 * spi, decay23)
            it23 = jnp.int32(n23)
        out = SMPLTParams(**pdict), jnp.concatenate([l1, l23])
        return out + ({"smpl": it23, "smpl_max": n23},) if report_iters \
            else out

    return optimize_smpl


# ---------------------------------------------------------------------------
# Object phases
# ---------------------------------------------------------------------------

def make_object_optimizer(query_fn, project_px,
                          cfg: JointFitConfig = JointFitConfig(),
                          segment_iters: int | None = None,
                          report_iters: bool = False,
                          contact_query_fn=None):
    """Build the jit'd optimize_smpl_object program.

    query_fn(ctx, points (B,N,3)) -> head dict; project_px(ctx, points
    (B,N,3)) -> original-image pixel coords (B,N,2) for the ROI silhouette.
    `ctx` is a runtime pytree (params, cache, crop/body centers) — see
    make_smpl_optimizer on why it must not be closed over. Other runtime
    inputs per chunk: template points (B, N_o, 3), occ_ratios (B,),
    smpl_verts (B, V, 3) (FROZEN during object phases, as in the
    reference), part labels, silhouette refs, optional SDF grid.

    The per-STEP losses read only preds["df"], so query_fn may be a
    df-only query (SIFNet.query_heads(heads=("df",))) — note this is a
    program-size/explicitness win, not a runtime one: XLA DCE already
    prunes unread heads inside the jitted phases (measured 1.00x,
    scripts/profile_stage6_heads.py). contact_query_fn (default:
    query_fn) is used only by the once-per-chunk contact_masks and must
    also return "parts".
    """
    contact_query_fn = contact_query_fn or query_fn

    def obj_losses(obj, preds, obj_s, occ, terms):
        df_o = jnp.minimum(preds["df"][..., 1], cfg.df_o_clamp)
        terms["object"] = (df_o.mean(-1) * occ).mean()
        terms["scale"] = ((obj_s - cfg.obj_scale) ** 2).mean()

    def ocent_loss(obj, env, terms):
        """Opt-in (w_ocent > 0) anchor of the transformed object centroid to
        the stage-4 neural center (the initial obj_t): occ-weighted squared
        distance, the shape of the reference's compute_ocent_loss
        (recon_fit_trivis_full.py:211-216). The reference RELEASE table
        zeroes this term ('ocent': 0, :141 — parity default); it is exposed
        because on held-out data stage 6 can drift the (already accurate)
        neural centers, and this term measurably re-anchors them."""
        if cfg.w_ocent:
            d2 = ((obj.mean(1) - env["ocent_target"]) ** 2).sum(-1)
            terms["ocent"] = (d2 * env["occ"]).mean()

    def temporal(obj, phase_joint, terms):
        if obj.shape[0] >= 4:
            w = 10.0 if phase_joint else 1.0
            v1 = obj[1:-1] - obj[:-2]
            v2 = obj[2:] - obj[1:-1]
            terms["otemp"] = ((v1 - v2) ** 2).mean() * w
            terms["ovtemp"] = ((obj[1:] - obj[:-1]) ** 2).mean() * w

    def contact_loss(obj, smpl_verts, labels_h, labels_o, mask_h, mask_o):
        """Part-paired squared chamfer between contact regions.

        Per example & part: mean sq NN dist of human contact points of part
        i to object contact points of part i + the reverse; averaged over
        (example, part) pairs where both sides are non-empty — a FLAT mean
        over all pairs across the whole chunk, matching pytorch3d
        chamfer_distance(batch_reduction="mean") over the Pointclouds batch
        of every (example, part) cloud (recon_fit_trivis_full.py:382-457,
        SQUARED distances). Frames where either side has no contacts
        contribute no pairs — the release code `continue`s there too (its
        pull-all-verts fallback is commented out, "do not overshots now",
        recon_fit_trivis_full.py:420-428).
        """

        backend = cfg.contact_backend
        if backend == "auto":
            backend = ("pallas" if jax.default_backend() == "tpu"
                       else "xla")
        lh_b = jnp.broadcast_to(labels_h, smpl_verts.shape[:2])

        if backend == "pallas":
            # fused label-NN kernel, batch in the Pallas grid; backward is
            # an O(N) gather/scatter from the saved argmin (no (V, N_o)
            # matrix round-trip). 3.4x the XLA path at release sizes.
            d_h_b = label_nn_pallas_batched(smpl_verts, lh_b, obj,
                                            labels_o, mask_o)   # (B, V)
            d_o_b = label_nn_pallas_batched(obj, labels_o, smpl_verts,
                                            lh_b, mask_h)       # (B, N_o)
        else:
            d_h_b = jax.vmap(lambda sv, ov, lh, lo, mo:
                             label_compatible_nn(sv, lh, ov, lo, mo))(
                smpl_verts, obj, lh_b, labels_o, mask_o)
            d_o_b = jax.vmap(lambda ov, sv, lo, lh, mh:
                             label_compatible_nn(ov, lo, sv, lh, mh))(
                obj, smpl_verts, labels_o, lh_b, mask_h)

        def one(d_h, d_o, mh, mo, lh, lo):
            oh_h = jax.nn.one_hot(lh, NUM_PARTS) * mh[:, None].astype(jnp.float32)
            oh_o = jax.nn.one_hot(lo, NUM_PARTS) * mo[:, None].astype(jnp.float32)
            cnt_h = oh_h.sum(0)                               # (14,)
            cnt_o = oh_o.sum(0)
            pair_ok = (cnt_h > 0) & (cnt_o > 0)
            mean_h = (d_h @ oh_h) / jnp.maximum(cnt_h, 1.0)
            mean_o = (d_o @ oh_o) / jnp.maximum(cnt_o, 1.0)
            per_pair = jnp.where(pair_ok, mean_h + mean_o, 0.0)
            return per_pair.sum(), pair_ok.sum()

        sums, counts = jax.vmap(one)(d_h_b, d_o_b, mask_h, mask_o,
                                     lh_b, labels_o)
        return sums.sum() / jnp.maximum(counts.sum(), 1)

    def sil_loss(ctx, obj_r, obj_t, obj_s, sil: SilRefs, sil_verts,
                 sil_faces, occ, sigma=None):
        """Occlusion-aware ROI silhouette L2 (SilLossROI.forward)."""
        verts = transform_obj_verts(sil_verts, obj_r, obj_t, obj_s)
        px = project_px(ctx, verts)  # (B, V, 2) original-image pixels
        sigma = cfg.sil_sigma if sigma is None else sigma
        ndc = 2.0 * (px - sil.roi_xyb[:, None, :2]) \
            / sil.roi_xyb[:, None, 2:3] - 1.0
        backend = cfg.sil_backend
        if backend == "auto":
            backend = ("pallas" if jax.default_backend() == "tpu"
                       else "xla")
        if backend == "pallas":
            # fused VMEM kernel: ~9x the chunked-scan XLA path at release
            # sizes (PERF_NOTES round 2, scripts/bench_sil_phase.py)
            imgs = soft_silhouette_batch(ndc, sil_faces, cfg.sil_size,
                                         sigma)
        else:
            imgs = jax.vmap(lambda v: soft_silhouette(
                v, sil_faces, cfg.sil_size, sigma,
                chunk=cfg.sil_face_chunk))(ndc)
        imgs = imgs * sil.keep_mask
        per_ex = ((imgs - sil.image_ref) ** 2).sum((1, 2))
        return (per_ex * occ).mean()

    def run_phase(loss_fn, params, lrs, n_iters, decay_fn):
        return _adam_scan(loss_fn, params, lrs,
                          n_iters * cfg.steps_per_iter, decay_fn)

    spi = cfg.steps_per_iter

    def _weighted(terms, decay):
        w = dict(object=cfg.w_object, scale=cfg.w_scale,
                 otemp=cfg.w_otemp, ovtemp=cfg.w_ovtemp,
                 mask=cfg.w_mask, trans=cfg.w_trans,
                 contact=cfg.w_contact, collide=cfg.w_collide,
                 ocent=cfg.w_ocent)
        s = 1.0 / (1.0 + decay)
        return sum(terms[k] * w[k] * s for k in terms if k in w)

    def transformed(p, env):
        r = decopose_axis(p["obj_r"])
        return transform_obj_verts(env["obj_points"], r, p["obj_t"],
                                   env["obj_s"]), r

    # ---------------- phase 1: object only ----------------
    def loss_obj_env(p, decay, env):
        obj, _ = transformed(p, env)
        preds = query_fn(env["ctx"], obj)
        terms = {}
        obj_losses(obj, preds, env["obj_s"], env["occ"], terms)
        ocent_loss(obj, env, terms)
        temporal(obj, False, terms)
        return _weighted(terms, decay)

    # ---------------- phase 2: silhouette ----------------
    def loss_sil_env(p, decay, env):
        obj, r = transformed(p, env)
        terms = {}
        terms["mask"] = sil_loss(env["ctx"], r, p["obj_t"], env["obj_s"],
                                 env["sil"], env["sil_verts"],
                                 env["sil_faces"], env["occ"])
        terms["scale"] = ((env["obj_s"] - cfg.obj_scale) ** 2).mean()
        terms["trans"] = ((p["obj_t"] - env["trans_init"]) ** 2).mean()
        temporal(obj, False, terms)
        return _weighted(terms, decay)

    # ---------------- phase 3: joint ----------------
    def loss_joint_env(p, decay, env):
        obj, r = transformed(p, env)
        preds = query_fn(env["ctx"], obj)
        terms = {}
        obj_losses(obj, preds, env["obj_s"], env["occ"], terms)
        ocent_loss(obj, env, terms)
        temporal(obj, True, terms)
        terms["contact"] = contact_loss(obj, env["smpl_verts"],
                                        env["labels_h"], env["labels_o"],
                                        env["mask_h"], env["mask_o"])
        if cfg.collision and "sdf_grid" in env:
            r_t = jnp.swapaxes(r, -1, -2)
            local = jnp.einsum(
                "bnk,bkj->bnj",
                env["smpl_verts"] / env["obj_s"][:, None, None]
                - p["obj_t"][:, None, :],
                r_t, precision=jax.lax.Precision.HIGHEST)
            terms["collide"] = penetration_loss(env["sdf_grid"], local)
        return _weighted(terms, decay)

    def contact_masks(params, env):
        """Contact dfs computed ONCE from the phase-2 result and frozen
        (recon_fit_trivis_full.py:242-253)."""
        obj_now, _ = transformed(params, env)
        preds_o = contact_query_fn(env["ctx"], obj_now)
        df_obj_h = jax.lax.stop_gradient(preds_o["df"][..., 0])
        labels_o = jnp.argmax(
            jax.lax.stop_gradient(preds_o["parts"]), -1)          # (B, N_o)
        preds_h = contact_query_fn(env["ctx"], env["smpl_verts"])
        df_hum_o = jax.lax.stop_gradient(preds_h["df"][..., 1])
        return labels_o, df_hum_o < cfg.cont_thres, df_obj_h < cfg.cont_thres

    decay1 = lambda s: jnp.float32(1.0)
    decay2 = lambda s: (s // spi).astype(jnp.float32) + 1.0
    decay_j = lambda s: (((s + (cfg.iter_obj + cfg.iter_sil) * spi) // spi
                          - cfg.iter_obj + 1).astype(jnp.float32)) / 3.0
    lrs_1 = {"obj_r": cfg.lr_obj_r, "obj_t": cfg.lr_obj_t}
    lrs_2 = {"obj_r": cfg.lr_sil, "obj_t": cfg.lr_sil}
    lrs_j = {"obj_r": 0.0, "obj_t": cfg.lr_joint}
    # reference early-stop gate is GLOBAL (it > 0.25*max_iter with it
    # already past iter_obj + iter_sil) — always satisfied at joint start,
    # so the joint phase may stop on its first converged iteration
    min_j = max(0.0, cfg.early_stop_min_frac * cfg.joint_max_iter
                - (cfg.iter_obj + cfg.iter_sil))

    def _all_terms(p, env):
        """Every obj_t-coupled stage-6 object term, WEIGHTED, as a dict of
        scalars. Diagnostic surface (scripts/ablate_stage6_terms.py): joint-
        phase terms always; the phase-2 sil term when env carries sil refs;
        contact when env carries the frozen masks; collision when env
        carries an sdf_grid. decay is taken as 0 (weights at their base
        values) — per-term attribution, not an optimizer step."""
        obj, r = transformed(p, env)
        terms = {}
        preds = query_fn(env["ctx"], obj)
        obj_losses(obj, preds, env["obj_s"], env["occ"], terms)
        if "ocent_target" in env:
            # computed unconditionally (ocent_loss gates on cfg.w_ocent;
            # the probe reports the pull even for w_ocent=0 runs)
            d2 = ((obj.mean(1) - env["ocent_target"]) ** 2).sum(-1)
            terms["ocent"] = (d2 * env["occ"]).mean()
        temporal(obj, True, terms)
        if "labels_o" in env:
            terms["contact"] = contact_loss(
                obj, env["smpl_verts"], env["labels_h"], env["labels_o"],
                env["mask_h"], env["mask_o"])
        if "sil" in env:
            terms["mask"] = sil_loss(env["ctx"], r, p["obj_t"],
                                     env["obj_s"], env["sil"],
                                     env["sil_verts"], env["sil_faces"],
                                     env["occ"])
        if "sdf_grid" in env:
            r_t = jnp.swapaxes(r, -1, -2)
            local = jnp.einsum(
                "bnk,bkj->bnj",
                env["smpl_verts"] / env["obj_s"][:, None, None]
                - p["obj_t"][:, None, :],
                r_t, precision=jax.lax.Precision.HIGHEST)
            terms["collide"] = penetration_loss(env["sdf_grid"], local)
        w = dict(object=cfg.w_object, otemp=cfg.w_otemp,
                 ovtemp=cfg.w_ovtemp, mask=cfg.w_mask,
                 contact=cfg.w_contact, collide=cfg.w_collide,
                 ocent=max(cfg.w_ocent, 1.0))  # probe ocent even when the
        # run's weight is 0 (the whole point is measuring its pull before
        # enabling it); reported at weight max(w_ocent, 1)
        return {k: terms[k] * w[k] for k in terms if k in w}

    def term_probe(params, env):
        """Per-term value + per-frame gradient w.r.t. obj_t.

        Returns {term: (scalar value, (B,3) grad)}. The gradient of the
        WHOLE weighted term w.r.t. each frame's translation — for coupled
        terms (temporal, contact's flat pair mean) this is the true
        per-frame pull including cross-frame coupling. A term helps frame
        i's translation iff -grad[i] points toward the GT direction.
        Callers may jax.jit(term_probe) — names are resolved via
        eval_shape, so tracing stays cheap."""
        names = sorted(jax.eval_shape(_all_terms, params, env))

        def one(name):
            return jax.value_and_grad(
                lambda t: _all_terms(
                    {"obj_r": params["obj_r"], "obj_t": t}, env)[name]
            )(params["obj_t"])

        return {n: one(n) for n in names}

    if segment_iters:
        run1 = _make_phase_stepper(loss_obj_env, lrs_1, spi, decay1, 0.0)
        run2 = _make_phase_stepper(loss_sil_env, lrs_2, spi, decay2, 0.0)
        run3 = _make_phase_stepper(
            loss_joint_env, lrs_j, spi, decay_j,
            cfg.joint_rel_tol if cfg.early_stop else 0.0)
        masks_jit = jax.jit(contact_masks)

        def optimize_object_segmented(obj_r, obj_t, obj_s, obj_points,
                                      smpl_verts, labels_h, occ_ratios,
                                      sil: SilRefs, sil_verts, sil_faces,
                                      ctx=None,
                                      sdf_grid: SDFGrid | None = None):
            params = {"obj_r": obj_r, "obj_t": obj_t}
            env = dict(obj_points=obj_points, obj_s=obj_s, occ=occ_ratios,
                       ocent_target=jax.lax.stop_gradient(obj_t), ctx=ctx)
            params, l1, _ = run1(params, env, cfg.iter_obj,
                                 seg=segment_iters)
            env2 = dict(env, sil=sil, sil_verts=sil_verts,
                        sil_faces=sil_faces, trans_init=params["obj_t"])
            params, l2, _ = run2(params, env2, cfg.iter_sil,
                                 seg=segment_iters)
            env3 = dict(env, smpl_verts=smpl_verts,
                        labels_h=jnp.asarray(labels_h))
            if cfg.collision and sdf_grid is not None:
                env3["sdf_grid"] = sdf_grid
            labels_o, mask_h, mask_o = masks_jit(params, env3)
            env3.update(labels_o=labels_o, mask_h=mask_h, mask_o=mask_o)
            params, l3, it_j = run3(params, env3, cfg.joint_max_iter,
                                    min_j if cfg.early_stop else -1.0,
                                    segment_iters)
            r_final = decopose_axis(params["obj_r"])
            out = r_final, params["obj_t"], jnp.stack([l1, l2, l3])
            return out + ({"joint": it_j,
                           "joint_max": cfg.joint_max_iter},) \
                if report_iters else out

        def _cost_probe(obj_r, obj_t, obj_s, obj_points, smpl_verts,
                        labels_h, occ_ratios, sil: SilRefs, sil_verts,
                        sil_faces, ctx=None):
            """One-Adam-step compiled programs for all three object phases
            (scripts/roofline.py). Returns {phase: (compiled, args,
            steps_total)}."""
            params = {"obj_r": obj_r, "obj_t": obj_t}
            env = dict(obj_points=obj_points, obj_s=obj_s, occ=occ_ratios,
                       ocent_target=jax.lax.stop_gradient(obj_t), ctx=ctx)
            env2 = dict(env, sil=sil, sil_verts=sil_verts,
                        sil_faces=sil_faces, trans_init=params["obj_t"])
            env3 = dict(env, smpl_verts=smpl_verts,
                        labels_h=jnp.asarray(labels_h),
                        labels_o=jnp.zeros(obj_points.shape[:2], jnp.int32),
                        mask_h=jnp.ones(smpl_verts.shape[:2], bool),
                        mask_o=jnp.ones(obj_points.shape[:2], bool))
            out = {}
            for name, run, e, iters in (
                    ("object", run1, env, cfg.iter_obj),
                    ("sil", run2, env2, cfg.iter_sil),
                    ("joint", run3, env3, cfg.joint_max_iter)):
                state = run.opt.init(params)
                args = (params, state, e, jnp.int32(0))
                out[name] = (run.one_step.lower(*args).compile(), args,
                             iters * spi)
            return out

        optimize_object_segmented.cost_probe = _cost_probe
        optimize_object_segmented.term_probe = term_probe
        return optimize_object_segmented

    @jax.jit
    def optimize_object(obj_r, obj_t, obj_s, obj_points, smpl_verts,
                        labels_h, occ_ratios, sil: SilRefs, sil_verts,
                        sil_faces, ctx=None, sdf_grid: SDFGrid | None = None):
        params = {"obj_r": obj_r, "obj_t": obj_t}
        env = dict(obj_points=obj_points, obj_s=obj_s, occ=occ_ratios,
                   ocent_target=jax.lax.stop_gradient(obj_t), ctx=ctx)
        params, l1 = run_phase(
            lambda p, d: loss_obj_env(p, d, env), params, lrs_1,
            cfg.iter_obj, decay1)

        env2 = dict(env, sil=sil, sil_verts=sil_verts, sil_faces=sil_faces,
                    trans_init=jax.lax.stop_gradient(params["obj_t"]))
        params, l2 = run_phase(
            lambda p, d: loss_sil_env(p, d, env2), params, lrs_2,
            cfg.iter_sil, decay2)

        env3 = dict(env, smpl_verts=smpl_verts,
                    labels_h=jnp.asarray(labels_h))
        if cfg.collision and sdf_grid is not None:
            env3["sdf_grid"] = sdf_grid
        labels_o, mask_h, mask_o = contact_masks(params, env3)
        env3.update(labels_o=labels_o, mask_h=mask_h, mask_o=mask_o)
        loss_joint = lambda p, d: loss_joint_env(p, d, env3)
        if cfg.early_stop:
            params, last, it_j = _adam_while(loss_joint, params, lrs_j,
                                             cfg.joint_max_iter, spi, decay_j,
                                             cfg.joint_rel_tol, min_j)
            l3 = last[None]
        else:
            params, l3 = run_phase(loss_joint, params, lrs_j,
                                   cfg.joint_max_iter, decay_j)
            it_j = jnp.int32(cfg.joint_max_iter)

        r_final = decopose_axis(params["obj_r"])
        out = r_final, params["obj_t"], jnp.concatenate([l1, l2, l3])
        return out + ({"joint": it_j, "joint_max": cfg.joint_max_iter},) \
            if report_iters else out

    optimize_object.term_probe = term_probe
    return optimize_object
