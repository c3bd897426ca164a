"""Generic training loop with checkpoint/resume and best-model tracking.

Parity targets: trainer/trainer.py — epoch loop, time-based periodic
checkpoint + eval every ck_period minutes, checkpoints named by cumulative
training time, best-model tracking via a val-min record, val loss on a
bounded number of batches; trainer/trainer_infiller.py — L1 pose + L1
acceleration loss (weights 1.0 / 0.1).

TPU-native replacements: orbax for checkpoints (instead of torch.save
tars), a metrics.jsonl event log (instead of TensorBoard), and jit'd steps
with batches sharded over the mesh (instead of DDP/NCCL). The reference's
always-on autograd anomaly detection (trainer.py:99) maps to optional
jax.debug_nans via config.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Iterable

import numpy as np
import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class LoopConfig:
    num_epochs: int = 80
    ck_period_min: float = 30.0     # checkpoint/eval period in minutes
    epoch_ck_period: int = 1        # checkpoint/eval every N epochs
                                    # (1 = reference parity, trainer.py:
                                    # 190-193; raise for tiny epochs where
                                    # the orbax save + val loop dominates
                                    # the wall time)
    max_val_batches: int = 64       # trainer.py:348-350
    out_dir: str = "experiments/default"
    keep_checkpoints: int = 3
    debug_nans: bool = False        # analog of set_detect_anomaly
    profile_steps: int = 0          # trace this many steps with jax.profiler
                                    # (replaces the reference's ad-hoc
                                    # time.time prints, SURVEY.md §5)


class MetricLogger:
    """Append-only jsonl event log (replaces rank-0 TensorBoard scalars)."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class CheckpointIO:
    """Orbax-backed save/load with best-model tracking.

    Layout: <out_dir>/checkpoints/<step>/ per checkpoint,
    <out_dir>/best_model.json recording {step, val_loss}
    (parity: trainer.py:352-382 val_min + best_model.json)."""

    def __init__(self, out_dir: str, keep: int = 3):
        import orbax.checkpoint as ocp
        self.dir = os.path.abspath(os.path.join(out_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep))
        self.best_file = os.path.join(out_dir, "best_model.json")

    def save(self, step: int, state):
        import orbax.checkpoint as ocp
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def restore_latest(self, template=None):
        """Restore the newest checkpoint. With a template the result has the
        template's exact structure/dtypes; without one the raw pytree (dicts
        of arrays) is returned.

        Template-free restores go through numpy: orbax otherwise replays
        the sharding metadata recorded at save time, so a checkpoint
        written in a TPU process would refuse to load in a CPU process
        (ValueError: Device TPU... not found in jax.local_devices())."""
        import orbax.checkpoint as ocp
        step = self.mngr.latest_step()
        if step is None:
            return None, None
        if template is None:
            path = os.path.join(self.dir, str(step), "default")
            ckptr = ocp.PyTreeCheckpointer()
            meta = ckptr.metadata(path)
            meta = getattr(meta, "item_metadata", meta)
            tree = getattr(meta, "tree", meta)
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
            state = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
        else:
            state = self.mngr.restore(step,
                                      args=ocp.args.StandardRestore(template))
        return state, step

    def record_best(self, step: int, val_loss: float) -> bool:
        best = None
        if os.path.isfile(self.best_file):
            with open(self.best_file) as f:
                best = json.load(f)
        if best is None or val_loss < best["val_loss"]:
            with open(self.best_file, "w") as f:
                json.dump({"step": int(step), "val_loss": float(val_loss)},
                          f)
            return True
        return False

    def best_step(self):
        if os.path.isfile(self.best_file):
            with open(self.best_file) as f:
                return json.load(f)["step"]
        return None


def train_loop(state, step_fn: Callable, train_loader: Iterable,
               val_loader: Iterable | None = None,
               val_loss_fn: Callable | None = None,
               cfg: LoopConfig = LoopConfig(),
               to_device: Callable | None = None,
               downstream_fn: Callable | None = None,
               select_on: str = "val_loss"):
    """Run the epoch loop. step_fn(state, batch) -> (state, loss, terms);
    val_loss_fn(state, batch) -> scalar. Returns the final state.

    downstream_fn(state, step) -> {metric: float} runs a full downstream
    task at every val point and logs its metrics (the
    trainer_cinfiller.py:46-194 integration-eval-inside-training pattern);
    set select_on to one of its keys to use it for best-model selection
    instead of the val loss.

    Resumes automatically from the latest checkpoint in cfg.out_dir.
    """
    logger = MetricLogger(cfg.out_dir)
    ckio = CheckpointIO(cfg.out_dir, cfg.keep_checkpoints)
    restored, at_step = ckio.restore_latest(state)
    if restored is not None:
        state = restored
        print(f"[train] resumed from step {at_step}")

    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    def run_val(state, step):
        """Returns the best-model selection score (lower = better)."""
        val = None
        if val_loader is not None and val_loss_fn is not None:
            losses = []
            for bi, batch in enumerate(val_loader):
                if bi >= cfg.max_val_batches:
                    break
                if to_device is not None:
                    batch = to_device(batch)
                losses.append(float(val_loss_fn(state, batch)))
            val = float(np.mean(losses)) if losses else float("nan")
            logger.log(step, val_loss=val)
        if downstream_fn is not None:
            metrics = downstream_fn(state, step) or {}
            if metrics:
                logger.log(step, **metrics)
            if select_on != "val_loss":
                return metrics.get(select_on, val)
        return val

    last_ck = time.time()
    if at_step is not None:
        step = int(at_step)
    else:
        raw = state["step"] if isinstance(state, dict) else \
            getattr(state, "step", 0)
        step = int(np.asarray(raw))
    last_saved = -1
    profiling = False
    for epoch in range(cfg.num_epochs):
        for batch in train_loader:
            if cfg.profile_steps and step == 1 and not profiling:
                jax.profiler.start_trace(os.path.join(cfg.out_dir, "trace"))
                profiling = True
            if to_device is not None:
                batch = to_device(batch)
            state, loss, terms = step_fn(state, batch)
            step += 1
            if profiling and step >= 1 + cfg.profile_steps:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                profiling = False
            if step % 10 == 0:
                logger.log(step, loss=float(loss), epoch=epoch,
                           **{f"loss_{k}": float(v) for k, v in terms.items()})
            if (time.time() - last_ck) / 60.0 >= cfg.ck_period_min \
                    and step != last_saved:
                ckio.save(step, state)
                last_saved = step
                val = run_val(state, step)
                if val is not None:
                    ckio.record_best(step, val)
                last_ck = time.time()
        # end of epoch: checkpoint + val (trainer.py:190-193); always at
        # the final epoch so the best-model record covers the end state
        if (epoch + 1) % max(1, cfg.epoch_ck_period) \
                and epoch != cfg.num_epochs - 1:
            continue
        if step != last_saved:
            ckio.save(step, state)
            last_saved = step
            val = run_val(state, step)
            if val is not None:
                ckio.record_best(step, val)
    return state


# ---------------------------------------------------------------------------
# SmoothNet training (smoothnet/train recipe: Adam lr 1e-4, exp decay 0.95
# per epoch, L_pos + 0.1 * L_accel on sliding windows — SmoothNet paper
# defaults mirrored in pw3d_spin_3D.yaml)
# ---------------------------------------------------------------------------

def make_smoothnet_train_step(model, learning_rate: float = 1e-4,
                              lr_decay: float = 0.95,
                              steps_per_epoch: int = 1000,
                              lw_pos: float = 1.0, lw_accel: float = 0.1):
    """Training step for SmoothNet / SmoothNetSMPL.

    batch: noisy (N, C, W) windows + gt (N, C, W) clean windows.
    """
    sched = lambda step: learning_rate * lr_decay ** (step // steps_per_epoch)
    opt = optax.adam(sched)

    def loss_fn(params, batch, rng=None):
        det = rng is None
        pred = model.apply(params, batch["noisy"], deterministic=det,
                           rngs=None if det else {"dropout": rng})
        gt = batch["gt"]
        l_pos = jnp.abs(pred - gt).mean()
        acc_p = pred[..., 2:] - 2 * pred[..., 1:-1] + pred[..., :-2]
        acc_g = gt[..., 2:] - 2 * gt[..., 1:-1] + gt[..., :-2]
        l_accel = jnp.abs(acc_p - acc_g).mean()
        total = lw_pos * l_pos + lw_accel * l_accel
        return total, dict(pos=l_pos, accel=l_accel)

    @jax.jit
    def step(state, batch):
        rng = jax.random.fold_in(state["rng"], state["step"])
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, rng)
        updates, opt_state = opt.update(grads, state["opt_state"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state,
                "step": state["step"] + 1, "rng": state["rng"]}, loss, terms

    def init_state(params, rng=None):
        return {"params": params, "opt_state": opt.init(params),
                "step": jnp.zeros((), jnp.int32),
                "rng": rng if rng is not None else jax.random.PRNGKey(0)}

    @jax.jit
    def val_loss(state, batch):
        return loss_fn(state["params"], batch)[0]

    return init_state, step, val_loss


# ---------------------------------------------------------------------------
# Infiller training (trainer_infiller.py)
# ---------------------------------------------------------------------------

def make_infiller_train_step(model, learning_rate: float = 1e-4,
                             milestones=(30, 40), gamma: float = 0.3,
                             steps_per_epoch: int = 1000,
                             lw_pose: float = 1.0, lw_accel: float = 0.1):
    """HVOP-Net training step: L1 pose + L1 acceleration over time."""
    sched = optax.piecewise_constant_schedule(
        learning_rate, {m * steps_per_epoch: gamma for m in milestones})
    opt = optax.adam(sched)

    def loss_fn(params, batch, rng=None):
        # train with dropout ACTIVE (the reference trains in train() mode,
        # cmf-k4-lrot specifies 0.05 dropout in every encoder layer)
        det = rng is None
        pred = model.apply(params, batch["data_smpl"], batch["mask_smpl"],
                           batch["data_obj"], batch["mask_obj"],
                           deterministic=det,
                           rngs=None if det else {"dropout": rng})
        gt = batch["gt_obj"]
        l_pose = jnp.abs(pred - gt).mean()
        acc_p = pred[:, 2:] - 2 * pred[:, 1:-1] + pred[:, :-2]
        acc_g = gt[:, 2:] - 2 * gt[:, 1:-1] + gt[:, :-2]
        l_accel = jnp.abs(acc_p - acc_g).mean()
        total = lw_pose * l_pose + lw_accel * l_accel
        return total, dict(pose=l_pose, accel=l_accel)

    @jax.jit
    def step(state, batch):
        rng = jax.random.fold_in(state["rng"], state["step"])
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, rng)
        updates, opt_state = opt.update(grads, state["opt_state"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state,
                "step": state["step"] + 1, "rng": state["rng"]}, loss, terms

    def init_state(params, rng=None):
        return {"params": params, "opt_state": opt.init(params),
                "step": jnp.zeros((), jnp.int32),
                "rng": rng if rng is not None else jax.random.PRNGKey(0)}

    @jax.jit
    def val_loss(state, batch):
        return loss_fn(state["params"], batch)[0]  # eval: dropout off

    return init_state, step, val_loss
