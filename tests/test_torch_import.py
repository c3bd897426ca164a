"""Checkpoint-import parity: build torch twins of our modules, export their
state_dicts through the importer, and compare forward outputs."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from vistracker_tpu.models.hourglass import HGFilter, HGConfig
from vistracker_tpu.models.smoothnet import SmoothNet, SmoothNetSMPL
from vistracker_tpu.models.infiller import ConditionalMInfiller, InfillerConfig
from vistracker_tpu.models import torch_import as TI


# ---- torch twin of the hourglass encoder (independent re-implementation of
# the published stacked-hourglass structure; GroupNorm(32), dense-concat
# residual blocks, bicubic in-glass upsampling) ----

def t_conv3x3(i, o):
    return tnn.Conv2d(i, o, 3, 1, 1, bias=False)


class TConvBlock(tnn.Module):
    def __init__(self, inp, out):
        super().__init__()
        self.conv1 = t_conv3x3(inp, out // 2)
        self.conv2 = t_conv3x3(out // 2, out // 4)
        self.conv3 = t_conv3x3(out // 4, out // 4)
        self.bn1 = tnn.GroupNorm(32, inp)
        self.bn2 = tnn.GroupNorm(32, out // 2)
        self.bn3 = tnn.GroupNorm(32, out // 4)
        if inp != out:
            self.bn4 = tnn.GroupNorm(32, inp)
            self.downsample = tnn.Sequential(
                self.bn4, tnn.ReLU(True), tnn.Conv2d(inp, out, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        o1 = self.conv1(tF.relu(self.bn1(x)))
        o2 = self.conv2(tF.relu(self.bn2(o1)))
        o3 = self.conv3(tF.relu(self.bn3(o2)))
        out = torch.cat([o1, o2, o3], 1)
        res = x if self.downsample is None else self.downsample(x)
        return out + res


class THourGlass(tnn.Module):
    def __init__(self, depth, feat):
        super().__init__()
        self.depth = depth
        for lv in range(depth, 0, -1):
            self.add_module(f"b1_{lv}", TConvBlock(feat, feat))
            self.add_module(f"b2_{lv}", TConvBlock(feat, feat))
            if lv == 1:
                self.add_module(f"b2_plus_{lv}", TConvBlock(feat, feat))
            self.add_module(f"b3_{lv}", TConvBlock(feat, feat))

    def _fwd(self, lv, x):
        up1 = self._modules[f"b1_{lv}"](x)
        low1 = self._modules[f"b2_{lv}"](tF.avg_pool2d(x, 2, 2))
        low2 = self._fwd(lv - 1, low1) if lv > 1 else \
            self._modules[f"b2_plus_{lv}"](low1)
        low3 = self._modules[f"b3_{lv}"](low2)
        up2 = tF.interpolate(low3, scale_factor=2, mode="bicubic",
                             align_corners=True)
        return up1 + up2

    def forward(self, x):
        return self._fwd(self.depth, x)


class THGFilter(tnn.Module):
    def __init__(self, in_ch, num_stack, depth, hg_dim, tmpx_dim,
                 groups=1):
        super().__init__()
        self.num_stack = num_stack
        self.conv1 = tnn.Conv2d(in_ch, tmpx_dim, 7, 2, 3)
        self.bn1 = tnn.GroupNorm(32, tmpx_dim)
        self.conv2 = TConvBlock(tmpx_dim, 128)
        self.conv3 = TConvBlock(128, 128)
        self.conv4 = TConvBlock(128, 256)
        for i in range(num_stack):
            self.add_module(f"m{i}", THourGlass(depth, 256))
            self.add_module(f"top_m_{i}", TConvBlock(256, 256))
            self.add_module(f"conv_last{i}", tnn.Conv2d(256, 256, 1))
            self.add_module(f"bn_end{i}", tnn.GroupNorm(32, 256))
            self.add_module(f"l{i}", tnn.Conv2d(256, hg_dim, 1,
                                                groups=groups))
            if i < num_stack - 1:
                self.add_module(f"bl{i}", tnn.Conv2d(256, 256, 1,
                                                     groups=groups))
                self.add_module(f"al{i}", tnn.Conv2d(hg_dim, 256, 1,
                                                     groups=groups))

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        tmpx = x
        x = tF.avg_pool2d(self.conv2(x), 2, 2)
        x = self.conv4(self.conv3(x))
        prev, outs = x, []
        for i in range(self.num_stack):
            hg = self._modules[f"m{i}"](prev)
            ll = self._modules[f"top_m_{i}"](hg)
            ll = tF.relu(self._modules[f"bn_end{i}"](
                self._modules[f"conv_last{i}"](ll)))
            tmp = self._modules[f"l{i}"](ll)
            outs.append(tmp)
            if i < self.num_stack - 1:
                prev = prev + self._modules[f"bl{i}"](ll) \
                    + self._modules[f"al{i}"](tmp)
        return outs, tmpx


def test_hgfilter_torch_parity(rng):
    torch.manual_seed(0)
    num_stack, depth, hg_dim, tmpx_dim = 2, 2, 64, 64
    tmodel = THGFilter(5, num_stack, depth, hg_dim, tmpx_dim).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": TI.hgfilter_params(sd, "", num_stack, depth)}
    # strip the leading "." from prefixless names
    sd = {k.lstrip("."): v for k, v in sd.items()}

    x = rng.randn(1, 5, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_outs, t_tmpx = tmodel(torch.from_numpy(x))

    jmodel = HGFilter(HGConfig(input_channels=5, num_stack=num_stack,
                               num_hourglass=depth, hourglass_dim=hg_dim,
                               tmpx_dim=tmpx_dim))
    j_outs, j_tmpx, _ = jmodel.apply(params,
                                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(j_tmpx).transpose(0, 3, 1, 2),
                               t_tmpx.numpy(), atol=2e-4)
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(np.asarray(j).transpose(0, 3, 1, 2),
                                   t.numpy(), atol=2e-3)


def test_hgfilter_gconv_torch_parity(rng):
    """HGFilterGConv (HGFilters.py:205-331): l/bl/al become grouped 1x1
    convs with groups=256 = the hourglass width."""
    torch.manual_seed(2)
    num_stack, depth, hg_dim = 2, 1, 256
    tmodel = THGFilter(5, num_stack, depth, hg_dim, tmpx_dim=64,
                       groups=256).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": TI.hgfilter_params(sd, "", num_stack, depth)}

    x = rng.randn(1, 5, 32, 32).astype(np.float32)
    with torch.no_grad():
        t_outs, _ = tmodel(torch.from_numpy(x))

    jmodel = HGFilter(HGConfig(input_channels=5, num_stack=num_stack,
                               num_hourglass=depth, hourglass_dim=hg_dim,
                               tmpx_dim=64, gconv=True))
    j_outs, _, _ = jmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(np.asarray(j).transpose(0, 3, 1, 2),
                                   t.numpy(), atol=2e-3)


def _t_hgfilter_params_fix(sd, num_stack, depth):
    return TI.hgfilter_params(sd, "", num_stack, depth)


class TSmoothNet(tnn.Module):
    def __init__(self, W, hidden=512, res_hidden=16, blocks=1):
        super().__init__()
        self.encoder = tnn.Sequential(tnn.Linear(W, hidden),
                                      tnn.LeakyReLU(0.1, True))
        res = []
        for _ in range(blocks):
            m = tnn.Module()
            m.linear1 = tnn.Linear(hidden, res_hidden)
            m.linear2 = tnn.Linear(res_hidden, hidden)
            res.append(m)
        self.res_blocks = tnn.ModuleList(res)
        self.decoder = tnn.Linear(hidden, W)

    def forward(self, x):
        x = self.encoder(x)
        for m in self.res_blocks:
            idn = x
            y = tF.leaky_relu(m.linear1(x), 0.2)
            y = tF.leaky_relu(m.linear2(y), 0.2)
            x = y + idn
        return self.decoder(x)


def test_smoothnet_torch_parity(rng):
    torch.manual_seed(1)
    W = 32
    tmodel = TSmoothNet(W).eval()
    sd = {k.replace("res_blocks.", "res_blocks."): v.detach().numpy()
          for k, v in tmodel.state_dict().items()}
    params = TI.smoothnet_params(sd, num_blocks=1)
    x = rng.randn(3, 7, W).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()
    jmodel = SmoothNet(window_size=W, output_size=W)
    j_out = np.asarray(jmodel.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=2e-5)


def test_infiller_import_shapes(rng):
    """The importer's tree must exactly match the module's init tree."""
    cfg = InfillerConfig()
    model = ConditionalMInfiller(cfg)
    T = 16
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, 147)),
                      jnp.zeros((1, T), bool), jnp.zeros((1, T, 6)),
                      jnp.zeros((1, T), bool))

    # fabricate a torch-style state dict with the reference's names
    sd = {}
    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = np.zeros(o, np.float32)
    def enc(prefix, layers, d, ff):
        for n in range(layers):
            lp = f"{prefix}.encoder.layers.{n}"
            sd[f"{lp}.self_attn.in_proj_weight"] = \
                rng.randn(3 * d, d).astype(np.float32) * 0.02
            sd[f"{lp}.self_attn.in_proj_bias"] = np.zeros(3 * d, np.float32)
            lin(f"{lp}.self_attn.out_proj", d, d)
            lin(f"{lp}.linear1", d, ff)
            lin(f"{lp}.linear2", ff, d)
            for nm in ("norm1", "norm2"):
                sd[f"{lp}.{nm}.weight"] = np.ones(d, np.float32)
                sd[f"{lp}.{nm}.bias"] = np.zeros(d, np.float32)
    lin("feat_proj_smpl", 147, 128)
    lin("feat_proj_obj", 6, 32)
    enc("encoder_smpl", 2, 128, 256)
    enc("encoder_obj", 2, 32, 64)
    enc("encoder_joint", 4, 160, 256)
    lin("predictor.0", 160, 32)
    lin("predictor.2", 32, 6)

    imported = TI.infiller_params(sd, cfg)
    # identical tree structure + leaf shapes
    flat_a = jax.tree_util.tree_leaves_with_path(init)
    flat_b = jax.tree_util.tree_leaves_with_path(imported)
    paths_a = {jax.tree_util.keystr(p): l.shape for p, l in flat_a}
    paths_b = {jax.tree_util.keystr(p): np.asarray(l).shape for p, l in flat_b}
    assert paths_a == paths_b
    # and it runs
    out = model.apply(imported, jnp.zeros((1, T, 147)),
                      jnp.zeros((1, T), bool), jnp.zeros((1, T, 6)),
                      jnp.zeros((1, T), bool))
    assert out.shape == (1, T, 6)
