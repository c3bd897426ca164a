"""SIF-Net training step (data-parallel over a device mesh).

Parity targets: /root/reference/trainer/trainer.py (Adam lr 1e-3,
MultiStepLR gamma 0.3 at milestones [15, 25] epochs; per-step zero-grad;
loss = chore_tri_vis.get_errors) and train_launch.py (DDP wrap + NCCL
all-reduce -> here: jit with the batch axis sharded over the mesh; XLA
inserts the gradient psum automatically).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models.sifnet import SIFNet, sifnet_losses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    milestones: tuple = (15, 25)       # epochs
    gamma: float = 0.3
    steps_per_epoch: int = 1000        # used to convert milestones to steps
    max_dist: float = 0.1              # df clamp (config clamp_thres)
    loss_weights: tuple = (1.0, 1.0, 0.006, 500.0, 1000.0, 1000.0)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with MultiStepLR(gamma) schedule, matching trainer.py:44-52."""
    boundaries = {m * cfg.steps_per_epoch: cfg.gamma for m in cfg.milestones}
    sched = optax.piecewise_constant_schedule(cfg.learning_rate, boundaries)
    return optax.adam(sched)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def init_train_state(model: SIFNet, rng, sample_batch, cfg: TrainConfig) -> TrainState:
    params = model.init(rng, sample_batch["images"], sample_batch["points"],
                        sample_batch["crop_center"], sample_batch["body_center"],
                        train=True)
    opt = make_optimizer(cfg)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(model: SIFNet, cfg: TrainConfig):
    """Returns a jittable (state, batch) -> (state, loss, terms) step.

    batch: images (B,H,W,8), points (B,N,3), crop_center (B,2),
    body_center (B,3), df_h/df_o (B,N), parts (B,N) int32, pca (B,N,3,3),
    obj_center (B,3), visibility (B,N).

    Under a mesh with the batch axis sharded, jit of this function IS
    data-parallel training: the loss mean over B makes XLA psum the grads.
    """
    opt = make_optimizer(cfg)

    def loss_fn(params, batch):
        preds = model.apply(params, batch["images"], batch["points"],
                            batch["crop_center"], batch["body_center"],
                            train=True)
        gt = dict(df_h=batch["df_h"], df_o=batch["df_o"],
                  parts=batch["parts"], pca=batch["pca"],
                  obj_center=batch["obj_center"],
                  visibility=batch["visibility"],
                  # non-vis variants (6-ch center head) train the SMPL
                  # center on channels 0:3 (chore.py:273-277)
                  body_center=batch["body_center"])
        return sifnet_losses(preds, gt, cfg.loss_weights, cfg.max_dist)

    @jax.jit
    def step(state: TrainState, batch):
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = opt.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss, terms

    return step
