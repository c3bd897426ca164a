"""Transformer encoder (DeciWatch-style) for motion infilling.

Parity targets: /root/reference/model/transformers/former_deci.py and
posi_embed.py, including two reference quirks that checkpoint parity
depends on:

  1. Encoder layers are ALWAYS pre-norm — the constructor ignores the
     pre_norm flag for layers (former_deci.py:137-141); the flag only
     controls whether a final LayerNorm is appended (line 142). The release
     infiller config sets pre_norm=False, so: pre-norm layers, NO final norm.
  2. The sine positional embedding uses dim_t = T^(2*i/npf) for i in
     0..npf-1 (posi_embed.py keeps `torch.div(dim_t, 1)`, i.e. no pairing),
     with sin on even and cos on odd feature indices, and positions
     normalized by the LAST position (L-1), scaled to [0, 2*pi].

TPU-first: attention is computed batch-major (B, T, D) with one fused
einsum pair per layer; the key-padding mask becomes an additive bias. No
(L, B, D) permutes.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def sine_position_embedding(length: int, dim: int, temperature: float = 10000.0,
                            scale: float = 2.0 * np.pi) -> np.ndarray:
    """(length, dim) positional embedding with the reference's exact formula."""
    npf = dim // 2
    pos = np.arange(length, dtype=np.float32)
    pos = pos / (pos[-1] + 1e-6) * scale
    dim_t = temperature ** (2.0 * np.arange(npf, dtype=np.float32) / npf)
    ang = pos[:, None] / dim_t[None, :]  # (L, npf)
    pe = np.zeros((length, dim), np.float32)
    if 2 * npf != dim:  # odd dim: last channel unused by sin
        pe[:, :-1][:, 0::2] = np.sin(ang)
    else:
        pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def _activation(name: str):
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "glu": nn.glu,
    }[name]


class MultiheadSelfAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible self-attention (batch-major).

    Separate q/k/v inputs are supported because the pre-norm layer attends
    with q=k=normed+pos but value=normed (no pos).
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, deterministic=True):
        B, T, D = q.shape
        H = self.num_heads
        hd = D // H
        # packed qkv projection mirrors torch's in_proj (one weight matrix)
        qp = nn.Dense(D, name="q_proj")(q)
        kp = nn.Dense(D, name="k_proj")(k)
        vp = nn.Dense(D, name="v_proj")(v)

        def split(x):
            return x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # (B, H, T, hd)

        qh, kh, vh = split(qp), split(kp), split(vp)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
        if key_padding_mask is not None:
            # True = masked out (torch convention)
            bias = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, 0.0)
            logits = logits + bias
        attn = jax.nn.softmax(logits, axis=-1)
        # rows where every key is masked produce NaN; zero them like torch
        attn = jnp.nan_to_num(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer (reference forward_pre path)."""

    d_model: int
    num_heads: int
    dim_feedforward: int = 256
    dropout: float = 0.1
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, src, pos, key_padding_mask=None, deterministic=True):
        act = _activation(self.activation)
        src2 = nn.LayerNorm(name="norm1")(src)
        qk = src2 if pos is None else src2 + pos
        attn = MultiheadSelfAttention(self.d_model, self.num_heads,
                                      self.dropout, name="self_attn")(
            qk, qk, src2, key_padding_mask, deterministic)
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src2 = nn.LayerNorm(name="norm2")(src)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(src2)
        ff = nn.Dropout(self.dropout)(act(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return src


class TransformerV2(nn.Module):
    """Stack of pre-norm encoder layers + sine pos embedding.

    `final_norm` mirrors the reference `pre_norm` constructor argument
    (a final LayerNorm is added only when it is True).
    """

    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int = 256
    dropout: float = 0.1
    final_norm: bool = True
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        """x: (B, T, D); key_padding_mask: (B, T) bool, True = pad/occluded."""
        B, T, D = x.shape
        pos = jnp.asarray(sine_position_embedding(T, D))[None]  # (1, T, D)
        for i in range(self.num_layers):
            x = EncoderLayer(self.d_model, self.num_heads, self.dim_feedforward,
                             self.dropout, self.activation, name=f"layer{i}")(
                x, pos, key_padding_mask, deterministic)
        if self.final_norm:
            x = nn.LayerNorm(name="norm")(x)
        return x
