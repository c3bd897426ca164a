"""Import released PyTorch checkpoints into the flax modules.

Weight parity is the prerequisite for metric parity with the reference
(SURVEY.md §7 hard parts): the released tri-vis-l2 (SIF-Net), cmf-k4-lrot
(HVOP-Net) and SmoothNet checkpoints must load into our modules with exact
layer correspondence. Layout conversions:

  torch Conv2d  (O, I, kH, kW) -> flax Conv kernel (kH, kW, I, O)
  torch Conv1d k=1 (O, I, 1)   -> flax Dense kernel (I, O)
  torch Linear  (O, I)         -> flax Dense kernel (I, O)
  torch GroupNorm/LayerNorm weight/bias -> flax scale/bias
  torch MultiheadAttention in_proj (3D, D) packed -> split q/k/v Dense

Checkpoint containers: trainer tar checkpoints store model_state_dict
(trainer.py:231-253); SmoothNet uses checkpoint.pth.tar['state_dict'];
DDP "module." prefixes are stripped (generator.py:296-303).

Released artifact layout (experiment folders):
  experiments/<exp_name>/
    checkpoints/checkpoint_{H}h:{M}m:{S}s_{secs}.tar   (time-stamped, DDP)
    val_min=<epoch>.npy    = [epoch, val_loss, ck_file] (trainer.py:369-375)
    best_model.json        = {epoch, val_loss, ck_file}
  experiments/*<exp_name>/checkpoint.pth.tar            (SmoothNet layout,
    evaluate_config.py:222-229 + smooth_base.py:25-35 epoch >= 10 gate)
`find_checkpoint` resolves a folder to the best/last checkpoint with the
reference's precedence (generator.py:259-308: val_min file first, else the
tar with the largest training-time suffix).
"""
from __future__ import annotations

import glob
import json
import os

import numpy as np


def convert_secs(sec: float) -> tuple[int, int, int]:
    """Training-time -> (h, m, s) name components (trainer.py:406-410)."""
    return int(sec / 3600), int((sec / 60) % 60), int(sec % 60)


def checkpoint_name(training_time: float) -> str:
    """Time-stamped tar name the reference trainer writes (trainer.py:232)."""
    h, m, s = convert_secs(training_time)
    return f"checkpoint_{h}h:{m}m:{s}s_{training_time}.tar"


def is_torch_experiment_dir(path: str) -> bool:
    """Does `path` look like a released torch experiment folder (vs e.g. an
    orbax checkpoint dir from our own trainer)?

    best_model.json alone is NOT a discriminator — our trainer_loop writes
    one too; the torch layout is identified by its checkpoint artifacts."""
    return bool(
        glob.glob(os.path.join(path, "val_min=*"))
        or glob.glob(os.path.join(path, "checkpoints", "*.tar"))
        or os.path.isfile(os.path.join(path, "checkpoint.pth.tar")))


def find_checkpoint(exp_dir: str) -> str:
    """Resolve an experiment folder to a checkpoint file path.

    Precedence (generator.py:259-280 find_best_checkpoint):
      1. val_min=<epoch>.npy -> checkpoints/<ck_file>
      2. best_model.json['ck_file'] (written alongside the npy,
         trainer.py:369-375)
      3. the checkpoints/*.tar with the largest float training-time suffix
      4. checkpoint.pth.tar in the folder itself (SmoothNet layout)
    """
    if os.path.isfile(exp_dir):
        return exp_dir
    ck_dir = os.path.join(exp_dir, "checkpoints")
    for vm in sorted(glob.glob(os.path.join(exp_dir, "val_min=*"))):
        log = np.load(vm, allow_pickle=True)
        path = os.path.join(ck_dir, str(log[2]))
        if os.path.isfile(path):
            return path
    bm = os.path.join(exp_dir, "best_model.json")
    if os.path.isfile(bm):
        with open(bm, encoding="utf-8") as f:
            ck = json.load(f).get("ck_file")
        if ck and os.path.isfile(os.path.join(ck_dir, ck)):
            return os.path.join(ck_dir, ck)
    tars = glob.glob(os.path.join(ck_dir, "*.tar"))
    if tars:
        def ttime(p):
            try:  # suffix after the last '_' is the float training time
                return float(os.path.splitext(os.path.basename(p))[0]
                             .split("_")[-1])
            except ValueError:
                return -1.0
        return max(tars, key=ttime)
    sn = os.path.join(exp_dir, "checkpoint.pth.tar")
    if os.path.isfile(sn):
        return sn
    raise FileNotFoundError(
        f"no torch checkpoint found under {exp_dir} (looked for val_min=*, "
        "best_model.json, checkpoints/*.tar, checkpoint.pth.tar)")


def load_checkpoint_file(path: str) -> tuple[dict, dict]:
    """Load a checkpoint file or experiment folder.

    Returns (container, state_dict) where container holds the checkpoint
    metadata (epoch, training_time, ...) and state_dict maps parameter
    names (DDP 'module.' prefixes stripped) to numpy arrays."""
    import torch
    if os.path.isdir(path):
        path = find_checkpoint(path)
    ck = torch.load(path, map_location="cpu", weights_only=False)
    container = ck if isinstance(ck, dict) else {}
    sd = ck
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(ck, dict) and key in ck:
            sd = ck[key]
            break
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)
    return container, out


def load_state_dict(path: str) -> dict:
    """Load a torch checkpoint file or experiment folder ->
    {name: np.ndarray}, prefix-stripped."""
    return load_checkpoint_file(path)[1]


def _conv2d(sd, name):
    w = sd[f"{name}.weight"].transpose(2, 3, 1, 0)
    p = {"kernel": w}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _dense(sd, name):
    p = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _conv1d_as_dense(sd, name):
    w = sd[f"{name}.weight"][..., 0].T  # (O, I, 1) -> (I, O)
    p = {"kernel": w}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _convblock(sd, prefix):
    out = {}
    for i in (1, 2, 3):
        out[f"conv{i}"] = _conv2d(sd, f"{prefix}.conv{i}")
        out[f"bn{i}"] = _norm(sd, f"{prefix}.bn{i}")
    if f"{prefix}.downsample.2.weight" in sd:
        out["bn4"] = _norm(sd, f"{prefix}.bn4")
        out["downsample_conv"] = _conv2d(sd, f"{prefix}.downsample.2")
    return out


def _hourglass(sd, prefix, depth):
    out = {}
    for level in range(depth, 0, -1):
        for b in (f"b1_{level}", f"b2_{level}", f"b3_{level}"):
            out[b] = _convblock(sd, f"{prefix}.{b}")
        if level == 1:
            out[f"b2_plus_{level}"] = _convblock(sd, f"{prefix}.b2_plus_{level}")
    return out


def hgfilter_params(sd: dict, prefix: str, num_stack: int,
                    num_hourglass: int) -> dict:
    """Convert one HGFilter's torch weights to our flax tree.

    prefix may be empty (weights at the state-dict root)."""
    if prefix and not prefix.endswith("."):
        prefix = prefix + "."
    out = {
        "conv1": _conv2d(sd, f"{prefix}conv1"),
        "bn1": _norm(sd, f"{prefix}bn1"),
        "conv2": _convblock(sd, f"{prefix}conv2"),
        "conv3": _convblock(sd, f"{prefix}conv3"),
        "conv4": _convblock(sd, f"{prefix}conv4"),
    }
    for i in range(num_stack):
        out[f"m{i}"] = _hourglass(sd, f"{prefix}m{i}", num_hourglass)
        out[f"top_m_{i}"] = _convblock(sd, f"{prefix}top_m_{i}")
        out[f"conv_last{i}"] = _conv2d(sd, f"{prefix}conv_last{i}")
        out[f"bn_end{i}"] = _norm(sd, f"{prefix}bn_end{i}")
        out[f"l{i}"] = _conv2d(sd, f"{prefix}l{i}")
        if i < num_stack - 1:
            out[f"bl{i}"] = _conv2d(sd, f"{prefix}bl{i}")
            out[f"al{i}"] = _conv2d(sd, f"{prefix}al{i}")
    return out


def _decoder_head(sd, prefix):
    # torch Sequential indices 0, 2, 4, 6 (ReLUs between)
    return {"fc0": _conv1d_as_dense(sd, f"{prefix}.0"),
            "fc1": _conv1d_as_dense(sd, f"{prefix}.2"),
            "fc2": _conv1d_as_dense(sd, f"{prefix}.4"),
            "fc3": _conv1d_as_dense(sd, f"{prefix}.6")}


def sifnet_params(path_or_sd, cfg) -> dict:
    """Released tri-vis-l2 checkpoint -> SIFNet flax params."""
    sd = (path_or_sd if isinstance(path_or_sd, dict)
          else load_state_dict(path_or_sd))
    params = {
        "image_filter": hgfilter_params(sd, "image_filter", cfg.num_stack,
                                        cfg.num_hourglass),
        "df": _decoder_head(sd, "df"),
        "part_predictor": _decoder_head(sd, "part_predictor"),
        "pca_predictor": _decoder_head(sd, "pca_predictor"),
        "center_predictor": _decoder_head(sd, "center_predictor"),
        "visib_predictor": _decoder_head(sd, "visib_predictor"),
    }
    if cfg.triplane_shared:
        params["triplane_encoder"] = hgfilter_params(
            sd, "triplane_encoder", cfg.triplane_stack, cfg.num_hourglass)
    else:
        for i in range(3):
            params[f"triplane_encoder_{i}"] = hgfilter_params(
                sd, f"triplane_encoder_{i}", cfg.triplane_stack,
                cfg.num_hourglass)
    return {"params": params}


def _mha(sd, prefix, d):
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    return {
        "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
        "k_proj": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "v_proj": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def transformer_params(sd: dict, prefix: str, num_layers: int, d_model: int,
                       final_norm: bool) -> dict:
    out = {}
    for i in range(num_layers):
        lp = f"{prefix}.encoder.layers.{i}"
        out[f"layer{i}"] = {
            "self_attn": _mha(sd, f"{lp}.self_attn", d_model),
            "linear1": _dense(sd, f"{lp}.linear1"),
            "linear2": _dense(sd, f"{lp}.linear2"),
            "norm1": _norm(sd, f"{lp}.norm1"),
            "norm2": _norm(sd, f"{lp}.norm2"),
        }
    if final_norm:
        out["norm"] = _norm(sd, f"{prefix}.encoder.norm")
    return out


def _mlp_head(sd, prefix, n_hidden):
    out = {}
    for i in range(n_hidden):
        out[f"hidden{i}"] = _dense(sd, f"{prefix}.{2 * i}")
    out["out"] = _dense(sd, f"{prefix}.{2 * n_hidden}")
    return out


def infiller_params(path_or_sd, cfg) -> dict:
    """Released cmf-k4-lrot checkpoint -> ConditionalMInfiller flax params."""
    sd = (path_or_sd if isinstance(path_or_sd, dict)
          else load_state_dict(path_or_sd))
    d_joint = cfg.d_model_smpl + cfg.d_model_obj
    params = {
        "feat_proj_smpl": _dense(sd, "feat_proj_smpl"),
        "feat_proj_obj": _dense(sd, "feat_proj_obj"),
        "encoder_smpl": transformer_params(sd, "encoder_smpl",
                                           cfg.num_layers_smpl,
                                           cfg.d_model_smpl,
                                           cfg.pre_norm_smpl),
        "encoder_obj": transformer_params(sd, "encoder_obj",
                                          cfg.num_layers_obj,
                                          cfg.d_model_obj, cfg.pre_norm_obj),
        "encoder_joint": transformer_params(sd, "encoder_joint",
                                            cfg.num_layers_joint, d_joint,
                                            cfg.pre_norm_joint),
        "predictor": _mlp_head(sd, "predictor", len(cfg.hidden_dims)),
    }
    return {"params": params}


def _smoothnet(sd, prefix, num_blocks):
    p = f"{prefix}." if prefix else ""
    out = {"encoder": _dense(sd, f"{p}encoder.0"),
           "decoder": _dense(sd, f"{p}decoder")}
    for i in range(num_blocks):
        out[f"res{i}"] = {
            "linear1": _dense(sd, f"{p}res_blocks.{i}.linear1"),
            "linear2": _dense(sd, f"{p}res_blocks.{i}.linear2")}
    return out


def smoothnet_params(path_or_sd, num_blocks: int = 1,
                     smpl: bool = False) -> dict:
    """Released SmoothNet checkpoint -> SmoothNet(SMPL) flax params."""
    if isinstance(path_or_sd, dict):
        sd = path_or_sd
    else:
        container, sd = load_checkpoint_file(path_or_sd)
        if "epoch" in container and int(container["epoch"]) < 10:
            # the reference refuses under-trained SmoothNets
            # (smooth_base.py:28: assert epoch >= 10)
            raise ValueError(
                f"SmoothNet checkpoint only trained to epoch "
                f"{container['epoch']} (< 10, smooth_base.py:28)")
    if smpl:
        return {"params": {
            "pose_net": _smoothnet(sd, "pose_net", num_blocks),
            "trans_net": _smoothnet(sd, "trans_net", num_blocks)}}
    return {"params": _smoothnet(sd, "", num_blocks)
            if "encoder.0.weight" in sd else _smoothnet(sd, "model", num_blocks)}
