"""Stacked-hourglass image encoder (flax.linen, channels-last).

Parity target: /root/reference/model/HGFilters.py (HGFilter / HourGlass) and
model/net_util.py:ConvBlock — the SIF-Net RGB encoder (5ch RGBM3 input,
3 stacks, depth 2, 256 features, GroupNorm(32)) and the shared triplane mask
encoder (1ch input, hg_dim 64, tmpx_dim 32).

Submodule names mirror the torch module paths (conv1, bn1, m0, top_m_0,
conv_last0, bn_end0, l0, bl0, al0; ConvBlock: bn1..4/conv1..3/downsample) so
released checkpoints import by name.

TPU notes: tensors are NHWC (TPU-native conv layout); the in-hourglass
upsample is the exact torch bicubic/align_corners=True grid expressed as two
small dense matmuls (ops/resize.py) — MXU work instead of a gather kernel.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import upsample2x_bicubic, avg_pool2x


@dataclasses.dataclass(frozen=True)
class HGConfig:
    input_channels: int = 5      # RGBM3
    num_stack: int = 3
    num_hourglass: int = 2       # hourglass depth
    hourglass_dim: int = 256     # output feature channels per stack
    tmpx_dim: int = 64           # stem feature channels (skip connection)
    hg_features: int = 256       # internal hourglass width
    norm_groups: int = 32
    hg_down: str = "ave_pool"
    # HGFilterGConv variant (HGFilters.py:205-331): the 1x1 stack-coupling
    # convs (l/bl/al) become grouped convs with groups=256. Requires
    # hourglass_dim % hg_features == 0 for l{i} (torch grouped-conv rule).
    gconv: bool = False
    dtype: object = jnp.float32


def _norm(groups, name, dtype):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name, dtype=dtype)


class ConvBlock(nn.Module):
    """Residual dense-concat block (net_util.py:ConvBlock)."""

    in_planes: int
    out_planes: int
    groups: int = 32
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.out_planes // 2
        quarter = self.out_planes // 4
        conv = lambda c, name: nn.Conv(c, (3, 3), padding=1, use_bias=False,
                                       name=name, dtype=self.dtype)
        out1 = conv(half, "conv1")(nn.relu(_norm(self.groups, "bn1", self.dtype)(x)))
        out2 = conv(quarter, "conv2")(nn.relu(_norm(self.groups, "bn2", self.dtype)(out1)))
        out3 = conv(quarter, "conv3")(nn.relu(_norm(self.groups, "bn3", self.dtype)(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        residual = x
        if self.in_planes != self.out_planes:
            residual = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                               name="downsample_conv", dtype=self.dtype)(
                nn.relu(_norm(self.groups, "bn4", self.dtype)(x)))
        return out + residual


class HourGlass(nn.Module):
    """Recursive hourglass of ConvBlocks (HGFilters.py:HourGlass).

    Lower branch: avg-pool 2x -> recurse -> bicubic 2x upsample; upper branch
    passes through one ConvBlock; branches sum.
    """

    depth: int
    features: int
    groups: int = 32
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        def block(name):
            return ConvBlock(self.features, self.features, self.groups,
                             dtype=self.dtype, name=name)

        def recurse(level, inp):
            up1 = block(f"b1_{level}")(inp)
            low1 = block(f"b2_{level}")(avg_pool2x(inp))
            if level > 1:
                low2 = recurse(level - 1, low1)
            else:
                low2 = block(f"b2_plus_{level}")(low1)
            low3 = block(f"b3_{level}")(low2)
            up2 = upsample2x_bicubic(low3)
            return up1 + up2

        return recurse(self.depth, x)


class HGFilter(nn.Module):
    """Stacked hourglass encoder (cfg.gconv=True gives the HGFilterGConv
    variant, HGFilters.py:205-331: grouped 1x1 stack-coupling convs).

    Input (B, H, W, C) -> (list of per-stack (B, H/4, W/4, hourglass_dim),
    tmpx (B, H/2, W/2, tmpx_dim), normx). tmpx is NOT detached here — the
    caller that wants the reference's detach (HGFilters.py:203) applies
    lax.stop_gradient.
    """

    cfg: HGConfig = HGConfig()

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        conv = lambda ch, k, s, p, name: nn.Conv(
            ch, (k, k), strides=(s, s), padding=p, name=name, dtype=c.dtype)
        # stack-coupling 1x1 convs; grouped in the GConv variant
        gc = c.hg_features if c.gconv else 1
        gconv1x1 = lambda ch, name: nn.Conv(
            ch, (1, 1), padding=0, feature_group_count=gc, name=name,
            dtype=c.dtype)
        x = conv(c.tmpx_dim, 7, 2, 3, "conv1")(x)
        x = nn.relu(_norm(c.norm_groups, "bn1", c.dtype)(x))
        tmpx = x
        if c.hg_down == "ave_pool":
            x = avg_pool2x(ConvBlock(c.tmpx_dim, 128, c.norm_groups,
                                     dtype=c.dtype, name="conv2")(x))
        else:
            raise NotImplementedError(c.hg_down)
        normx = x
        x = ConvBlock(128, 128, c.norm_groups, dtype=c.dtype, name="conv3")(x)
        x = ConvBlock(128, c.hg_features, c.norm_groups, dtype=c.dtype,
                      name="conv4")(x)

        previous = x
        outputs = []
        for i in range(c.num_stack):
            hg = HourGlass(c.num_hourglass, c.hg_features, c.norm_groups,
                           dtype=c.dtype, name=f"m{i}")(previous)
            ll = ConvBlock(c.hg_features, c.hg_features, c.norm_groups,
                           dtype=c.dtype, name=f"top_m_{i}")(hg)
            ll = conv(c.hg_features, 1, 1, 0, f"conv_last{i}")(ll)
            ll = nn.relu(_norm(c.norm_groups, f"bn_end{i}", c.dtype)(ll))
            tmp_out = gconv1x1(c.hourglass_dim, f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < c.num_stack - 1:
                ll_ = gconv1x1(c.hg_features, f"bl{i}")(ll)
                tmp_out_ = gconv1x1(c.hg_features, f"al{i}")(tmp_out)
                previous = previous + ll_ + tmp_out_
        return outputs, tmpx, normx
