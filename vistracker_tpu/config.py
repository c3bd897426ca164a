"""Experiment configuration: dataclass configs + reference-JSON loader.

Parity target: config/config_loader.py (JSON experiment configs with //
comments) and the released configs tri-vis-l2.json / cmf-k4-lrot.json. Our
native format is the frozen dataclasses used across the framework; this
module maps reference JSON keys onto them so released experiment configs
load directly.
"""
from __future__ import annotations

import dataclasses
import json
import os
import re

from .models.sifnet import SIFNetConfig
from .models.infiller import InfillerConfig
from .fit.smplt import SMPLTFitConfig
from .fit.joint import JointFitConfig
from .fit.generator import GeneratorConfig
from .fit.train import TrainConfig


@dataclasses.dataclass(frozen=True)
class PathsConfig:
    """Global path map — replaces the reference's import-time PATHS.yml."""

    behave_root: str = os.environ.get("VISTRACKER_BEHAVE", "")
    recon_root: str = os.environ.get("VISTRACKER_RECON", "recon_out")
    smpl_model_root: str = os.environ.get("VISTRACKER_SMPL_MODELS", "")
    assets_root: str = os.environ.get(
        "VISTRACKER_ASSETS",
        "/root/reference/assets" if os.path.isdir("/root/reference/assets")
        else "assets")
    experiments_root: str = os.environ.get("VISTRACKER_EXPERIMENTS",
                                           "experiments")


def _strip_comments(text: str) -> str:
    return re.sub(r"^\s*//.*$", "", text, flags=re.M)


def load_reference_json(path: str) -> dict:
    with open(path) as f:
        return json.loads(_strip_comments(f.read()))


def sifnet_config_from_json(cfg: dict) -> SIFNetConfig:
    """Map tri-vis-l2.json-style keys onto SIFNetConfig."""
    return SIFNetConfig(
        input_channels=5,
        num_stack=cfg.get("num_stack", 3),
        num_hourglass=cfg.get("num_hourglass", 2),
        hourglass_dim=cfg.get("hourglass_dim", 256),
        tmpx_dim=cfg.get("tmpx_dim", 64),
        triplane_stack=cfg.get("triplane_encoder_stack", 3),
        triplane_hg_dim=cfg.get("triplane_hg_dim", 64),
        triplane_tmpx_dim=cfg.get("triplane_tmpx_dim", 32),
        triplane_shared=cfg.get("triplane_shared_encoder", True),
        hidden_dim=cfg.get("hidden_dim", 128),
        z0=cfg.get("z_0", 2.2),
        crop_size=cfg.get("loadSize", 1200),
        max_dist=cfg.get("clamp_thres", 0.1),
        loss_weights=tuple(cfg.get("loss_weights",
                                   (1.0, 1.0, 0.006, 500.0, 1000.0, 1000.0))),
    )


def infiller_config_from_json(cfg: dict) -> InfillerConfig:
    """Map cmf-k4-lrot.json-style keys onto InfillerConfig."""
    keys = {f.name for f in dataclasses.fields(InfillerConfig)}
    kw = {k: v for k, v in cfg.items() if k in keys}
    if "hidden_dims" in kw:
        kw["hidden_dims"] = tuple(kw["hidden_dims"])
    if "window" in cfg:
        kw["window"] = 30 if cfg["window"] == 1 else cfg["window"]
    return InfillerConfig(**kw)


def camera_config_from_json(cfg: dict):
    """Build the camera from a reference config's camera_params (tri-icap)
    or the BEHAVE Kinect defaults (chore.py:88-93)."""
    from .core.camera import PerspectiveCamera
    cp = cfg.get("camera_params")
    if cp is None:
        return PerspectiveCamera(crop_size=cfg.get("loadSize", 1200))
    return PerspectiveCamera(
        crop_size=cp.get("crop_size", cfg.get("loadSize", 800)),
        fx=cp["fx"], fy=cp["fy"], cx=cp["cx"], cy=cp["cy"],
        width=cp.get("image_width", 1920),
        height=cp.get("image_height", 1080))


def train_config_from_json(cfg: dict) -> TrainConfig:
    return TrainConfig(
        learning_rate=cfg.get("learning_rate", 1e-3),
        milestones=tuple(cfg.get("milestones", (15, 25))),
        max_dist=cfg.get("clamp_thres", 0.1),
        loss_weights=tuple(cfg.get("loss_weights",
                                   (1.0, 1.0, 0.006, 500.0, 1000.0, 1000.0))),
    )
