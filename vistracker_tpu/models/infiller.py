"""Motion infiller networks (HVOP-Net and the unconditional baseline).

Parity targets: /root/reference/model/infill/mfiller_cond.py
(ConditionalMInfiller — the release `cond-transformer` of config
cmf-k4-lrot) and motion_infiller.py (MotionInfiller).

HVOP-Net: separate SMPL (d=128, 2 layers, 4 heads) and object (d=32,
2 layers, 2 heads) encoders — the object stream gets the occlusion
key-padding mask — concatenated into a joint encoder (d=160, 4 layers,
1 head, GELU, dropout 0.05, post-"pre_norm=False" quirk: pre-norm layers,
no final norm), then an MLP [160 -> 32 -> 6] predicting object rot6d.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import flax.linen as nn

from .transformer import TransformerV2


@dataclasses.dataclass(frozen=True)
class InfillerConfig:
    """Hyperparameters, defaults = release config cmf-k4-lrot.json."""

    dim_smpl: int = 147        # 24 joints x rot6d + 3 trans  (B, T, 147)
    dim_obj: int = 6
    out_dim: int = 6
    d_model_smpl: int = 128
    num_layers_smpl: int = 2
    num_heads_smpl: int = 4
    dim_forward_smpl: int = 256
    dropout_smpl: float = 0.05
    pre_norm_smpl: bool = False
    activation_smpl: str = "gelu"
    d_model_obj: int = 32
    num_layers_obj: int = 2
    num_heads_obj: int = 2
    dim_forward_obj: int = 64
    dropout_obj: float = 0.05
    pre_norm_obj: bool = False
    activation_obj: str = "gelu"
    num_layers_joint: int = 4
    num_heads_joint: int = 1
    dim_forward_joint: int = 256
    dropout_joint: float = 0.05
    pre_norm_joint: bool = False
    activation_joint: str = "gelu"
    hidden_dims: tuple = (32,)
    clip_len: int = 180
    window: int = 30           # autoregressive context carry


class MLPHead(nn.Module):
    hidden_dims: tuple
    out_dim: int

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.hidden_dims):
            x = nn.Dense(d, name=f"hidden{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return nn.Dense(self.out_dim, name="out")(x)


class ConditionalMInfiller(nn.Module):
    """HVOP-Net: object-pose infilling conditioned on SMPL motion."""

    cfg: InfillerConfig = InfillerConfig()

    @nn.compact
    def __call__(self, data_smpl, mask_smpl, data_obj, mask_obj,
                 deterministic=True):
        """data_smpl (B,T,147), data_obj (B,T,6); masks (B,T) bool,
        True = occluded/ignored key. Returns (B,T,6) object rot6d."""
        c = self.cfg
        s = nn.Dense(c.d_model_smpl, name="feat_proj_smpl")(data_smpl)
        s = TransformerV2(c.num_layers_smpl, c.d_model_smpl, c.num_heads_smpl,
                          c.dim_forward_smpl, c.dropout_smpl,
                          final_norm=c.pre_norm_smpl,
                          activation=c.activation_smpl,
                          name="encoder_smpl")(s, mask_smpl, deterministic)
        o = nn.Dense(c.d_model_obj, name="feat_proj_obj")(data_obj)
        o = TransformerV2(c.num_layers_obj, c.d_model_obj, c.num_heads_obj,
                          c.dim_forward_obj, c.dropout_obj,
                          final_norm=c.pre_norm_obj,
                          activation=c.activation_obj,
                          name="encoder_obj")(o, mask_obj, deterministic)
        feat = jnp.concatenate([s, o], axis=-1)
        feat = TransformerV2(c.num_layers_joint,
                             c.d_model_smpl + c.d_model_obj,
                             c.num_heads_joint, c.dim_forward_joint,
                             c.dropout_joint, final_norm=c.pre_norm_joint,
                             activation=c.activation_joint,
                             name="encoder_joint")(feat, None, deterministic)
        return MLPHead(c.hidden_dims, c.out_dim, name="predictor")(feat)


class MotionInfiller(nn.Module):
    """Unconditional infiller: one encoder over the combined masked stream."""

    input_dim: int = 153
    out_dim: int = 6
    d_model: int = 256
    num_layers: int = 4
    num_heads: int = 4
    dim_forward: int = 512
    dropout: float = 0.1
    pre_norm: bool = False
    activation: str = "leaky_relu"
    hidden_dims: tuple = (64,)

    @nn.compact
    def __call__(self, src, key_padding_mask, deterministic=True):
        x = nn.Dense(self.d_model, name="feat_proj")(src)
        x = TransformerV2(self.num_layers, self.d_model, self.num_heads,
                          self.dim_forward, self.dropout,
                          final_norm=self.pre_norm,
                          activation=self.activation,
                          name="encoder")(x, key_padding_mask, deterministic)
        return MLPHead(self.hidden_dims, self.out_dim, name="predictor")(x)
