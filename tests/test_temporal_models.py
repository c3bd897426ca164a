"""SmoothNet / transformer / infiller / window-op tests."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from vistracker_tpu.models.smoothnet import SmoothNet, SmoothNetSMPL
from vistracker_tpu.models.transformer import (TransformerV2,
                                               sine_position_embedding,
                                               MultiheadSelfAttention)
from vistracker_tpu.models.infiller import ConditionalMInfiller, InfillerConfig
from vistracker_tpu.ops.window_ops import seq_to_windows, windows_to_seq


def test_sine_position_embedding_matches_reference_formula():
    # independent torch re-derivation of the reference quirky formula
    L, D = 180, 160
    npf = D // 2
    position = torch.arange(0, L, dtype=torch.float32)
    position = position / (position[-1] + 1e-6) * (2 * np.pi)
    dim_t = 10000.0 ** (2 * torch.arange(npf, dtype=torch.float32) / npf)
    pe = torch.zeros(L, D)
    pe[:, 0::2] = torch.sin(position[:, None] / dim_t)
    pe[:, 1::2] = torch.cos(position[:, None] / dim_t)
    ours = sine_position_embedding(L, D)
    np.testing.assert_allclose(ours, pe.numpy(), atol=1e-5)


def test_mha_matches_torch(rng):
    B, T, D, H = 2, 12, 32, 4
    x = rng.randn(B, T, D).astype(np.float32)
    kpm = rng.rand(B, T) < 0.3
    kpm[:, 0] = False  # keep at least one key

    tmha = torch.nn.MultiheadAttention(D, H, dropout=0.0)
    mod = MultiheadSelfAttention(D, H, 0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x),
                      jnp.asarray(x))
    # copy torch weights into our layout (torch packs qkv in in_proj)
    w_in = tmha.in_proj_weight.detach().numpy()
    b_in = tmha.in_proj_bias.detach().numpy()
    p = jax.tree_util.tree_map(lambda a: a, params)
    p = {"params": {
        "q_proj": {"kernel": jnp.asarray(w_in[:D].T), "bias": jnp.asarray(b_in[:D])},
        "k_proj": {"kernel": jnp.asarray(w_in[D:2*D].T), "bias": jnp.asarray(b_in[D:2*D])},
        "v_proj": {"kernel": jnp.asarray(w_in[2*D:].T), "bias": jnp.asarray(b_in[2*D:])},
        "out_proj": {"kernel": jnp.asarray(tmha.out_proj.weight.detach().numpy().T),
                     "bias": jnp.asarray(tmha.out_proj.bias.detach().numpy())},
    }}
    ours = mod.apply(p, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                     key_padding_mask=jnp.asarray(kpm))
    xt = torch.from_numpy(x).transpose(0, 1)  # (T, B, D)
    theirs, _ = tmha(xt, xt, xt, key_padding_mask=torch.from_numpy(kpm))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy().transpose(1, 0, 2),
                               atol=2e-5)


def test_transformer_shapes_and_mask_effect(rng):
    B, T, D = 2, 30, 32
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    model = TransformerV2(num_layers=2, d_model=D, num_heads=4, final_norm=False)
    params = model.init(jax.random.PRNGKey(0), x)
    y0 = model.apply(params, x)
    assert y0.shape == (B, T, D)
    mask = jnp.zeros((B, T), bool).at[:, 10:20].set(True)
    y1 = model.apply(params, x, key_padding_mask=mask)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_smoothnet_smpl_passthrough_betas(rng):
    N, T = 3, 64
    x = jnp.asarray(rng.randn(N, 157, T).astype(np.float32))
    model = SmoothNetSMPL(window_size=T, output_size=T)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (N, 157, T)
    np.testing.assert_allclose(np.asarray(y[:, 144:154]), np.asarray(x[:, 144:154]))


def test_infiller_forward(rng):
    cfg = InfillerConfig()
    B, T = 2, 60
    ds = jnp.asarray(rng.randn(B, T, cfg.dim_smpl).astype(np.float32))
    do = jnp.asarray(rng.randn(B, T, cfg.dim_obj).astype(np.float32))
    ms = jnp.zeros((B, T), bool)
    mo = jnp.zeros((B, T), bool).at[:, 20:40].set(True)
    model = ConditionalMInfiller(cfg)
    params = model.init(jax.random.PRNGKey(0), ds, ms, do, mo)
    y = model.apply(params, ds, ms, do, mo)
    assert y.shape == (B, T, 6)
    assert np.isfinite(np.asarray(y)).all()


def test_window_roundtrip_matches_naive(rng):
    L, W, D = 100, 64, 7
    x = rng.randn(L, D).astype(np.float32)
    w = seq_to_windows(jnp.asarray(x), W, 1)
    assert w.shape == (L - W + 1, W, D)
    back = np.asarray(windows_to_seq(w, 1))
    # naive overlap-average (slide_window_to_sequence semantics)
    acc = np.zeros((L, D)); cnt = np.zeros((L, 1))
    wn = np.asarray(w)
    for i in range(wn.shape[0]):
        acc[i:i + W] += wn[i]
        cnt[i:i + W] += 1
    np.testing.assert_allclose(back, acc / cnt, atol=1e-5)
    np.testing.assert_allclose(back, x, atol=1e-5)  # identity windows
