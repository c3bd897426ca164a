"""SmoothNet temporal smoothing networks.

Parity targets: /root/reference/smoothnet/models/smoothnet.py (window-MLP
with LeakyReLU(0.1) encoder, residual blocks with LeakyReLU(0.2) + dropout,
linear decoder, all acting on the TIME axis of (N, C, T) windows) and
smoothnet_smpl.py (separate nets for 144-d rot6d pose and 3-d translation,
betas passed through).

Release hyperparameters (smoothnet/configs/pw3d_spin_3D.yaml): window 64
(exp smplt-srela-w64 / orot-w64d2), hidden 512, res_hidden 16, 1 block.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class SmoothNetResBlock(nn.Module):
    hidden_channels: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic=True):
        identity = x
        y = nn.Dense(self.hidden_channels, name="linear1")(x)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.leaky_relu(y, negative_slope=0.2)
        y = nn.Dense(x.shape[-1], name="linear2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.leaky_relu(y, negative_slope=0.2)
        return y + identity


class SmoothNet(nn.Module):
    """Input/output (N, C, T): each channel's T-window is smoothed by the
    same MLP over the time axis."""

    window_size: int = 64
    output_size: int = 64
    hidden_size: int = 512
    res_hidden_size: int = 16
    num_blocks: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic=True):
        assert x.shape[-1] == self.window_size, (
            f"window mismatch: {x.shape[-1]} != {self.window_size}")
        y = nn.Dense(self.hidden_size, name="encoder")(x)
        y = nn.leaky_relu(y, negative_slope=0.1)
        for i in range(self.num_blocks):
            y = SmoothNetResBlock(self.res_hidden_size, self.dropout,
                                  name=f"res{i}")(y, deterministic)
        return nn.Dense(self.output_size, name="decoder")(y)


class SmoothNetSMPL(nn.Module):
    """Two SmoothNets: rot6d pose (144) + translation (3); betas (10) pass
    through. Input (N, 157, T)."""

    window_size: int = 64
    output_size: int = 64
    hidden_size: int = 512
    res_hidden_size: int = 16
    num_blocks: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic=True):
        assert x.shape[1] == 144 + 10 + 3, f"invalid input shape: {x.shape}"
        kw = dict(window_size=self.window_size, output_size=self.output_size,
                  hidden_size=self.hidden_size,
                  res_hidden_size=self.res_hidden_size,
                  num_blocks=self.num_blocks, dropout=self.dropout)
        pose = SmoothNet(**kw, name="pose_net")(x[:, :144], deterministic)
        trans = SmoothNet(**kw, name="trans_net")(x[:, 154:], deterministic)
        return jnp.concatenate([pose, x[:, 144:154], trans], axis=1)
