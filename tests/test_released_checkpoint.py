"""Golden released-checkpoint tests.

Builds state_dicts with the EXACT parameter names of the reference torch
modules (imported from /root/reference — the classes the released
checkpoints were saved from), wraps them in the released artifact layout
(time-stamped DDP tars + val_min=<epoch>.npy + best_model.json, SmoothNet
checkpoint.pth.tar), resolves + imports them through models.torch_import,
and checks activation parity of our flax modules against the reference
torch forward for all three model families (SIF-Net / HVOP-Net / SmoothNet).

Skipped when /root/reference is not present (CI without the upstream).
"""
import json
import os
import re
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not available")


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference torch model modules with CPU/runtime shims.

    Only stubs modules that are genuinely missing from this image, and
    removes the stubs afterwards so later tests see the real ones."""
    import torch
    import torch.nn as tnn
    sys.path.insert(0, REF)
    stubbed = []
    for name in ("skimage", "skimage.measure", "cv2", "yaml"):
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    if "skimage" in stubbed:
        sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    orig_device, orig_cuda = torch.device, tnn.Module.cuda

    def fake_device(*a, **k):
        try:
            return orig_device(*a, **k)
        except RuntimeError:
            return orig_device("cpu")

    torch.device = fake_device
    tnn.Module.cuda = lambda self, *a, **k: self  # chore.py:83-84 on CPU
    try:
        from model.chore_tri_vis import CHORETriplaneVisibility
        from model.infill.mfiller_cond import ConditionalMInfiller as TCMI
        from smoothnet.models.smoothnet import SmoothNet as TSmoothNet
        from smoothnet.models.smoothnet_smpl import SmoothNetSMPL as TSNSMPL
        yield dict(sifnet=CHORETriplaneVisibility, infiller=TCMI,
                   smoothnet=TSmoothNet, smoothnet_smpl=TSNSMPL)
    finally:
        torch.device = orig_device
        tnn.Module.cuda = orig_cuda
        sys.path.remove(REF)
        for name in stubbed:
            sys.modules.pop(name, None)


def _release_args():
    from argparse import Namespace
    txt = re.sub(r"//.*", "", open(f"{REF}/config/tri-vis-l2.json").read())
    return Namespace(**json.loads(txt))


def _infiller_args():
    from argparse import Namespace
    txt = re.sub(r"//.*", "", open(f"{REF}/config/cmf-k4-lrot.json").read())
    return Namespace(**json.loads(txt))


def _write_experiment(tmp_path, name, state_dict, epoch=7,
                      training_time=3725.5, decoy_time=100.25,
                      with_val_min=True):
    """Write the released trainer artifact layout (trainer.py:231-253,
    352-382): DDP-prefixed time-stamped tar + val_min npy + best_model.json,
    plus an older decoy tar that discovery must NOT pick."""
    import torch
    from vistracker_tpu.models import torch_import as TI
    exp = tmp_path / name
    ckd = exp / "checkpoints"
    os.makedirs(ckd)
    ddp_sd = {f"module.{k}": v for k, v in state_dict.items()}
    fname = TI.checkpoint_name(training_time)
    torch.save({"training_time": training_time, "epoch": epoch,
                "model_state_dict": ddp_sd,
                "optimizer_state_dict": {}, "scheduler_state_dict": {}},
               str(ckd / fname))
    # decoy: earlier checkpoint with zeroed weights
    zero_sd = {f"module.{k}": v * 0 for k, v in state_dict.items()}
    torch.save({"training_time": decoy_time, "epoch": 1,
                "model_state_dict": zero_sd},
               str(ckd / TI.checkpoint_name(decoy_time)))
    if with_val_min:
        # trainer.py:369-375: np.save appends .npy; [epoch, val_loss, file]
        np.save(str(exp / f"val_min={epoch}"), [epoch, 0.123, fname])
        with open(exp / "best_model.json", "w") as f:
            json.dump({"epoch": epoch, "val_loss": 0.123, "ck_file": fname},
                      f)
    return str(exp), fname


def test_find_checkpoint_precedence(tmp_path, ref_modules):
    """val_min file wins; without it the largest training-time tar wins."""
    import torch
    from vistracker_tpu.models import torch_import as TI
    sd = {"w": torch.ones(2)}
    exp, fname = _write_experiment(tmp_path, "exp-vm", sd)
    assert os.path.basename(TI.find_checkpoint(exp)) == fname
    assert TI.is_torch_experiment_dir(exp)
    # no val_min -> newest (largest float suffix), not the decoy
    exp2, fname2 = _write_experiment(tmp_path, "exp-latest", sd,
                                     with_val_min=False)
    assert os.path.basename(TI.find_checkpoint(exp2)) == fname2
    # DDP module. prefixes stripped
    assert list(TI.load_state_dict(exp)) == ["w"]


def test_sifnet_released_layout_parity(tmp_path, ref_modules, rng):
    """tri-vis-l2-architecture checkpoint in the released layout loads and
    matches the reference torch forward to float tolerance."""
    import torch
    from vistracker_tpu.models.sifnet import SIFNet, SIFNetConfig
    from vistracker_tpu.models import torch_import as TI
    from vistracker_tpu.core.camera import PerspectiveCamera

    args = _release_args()
    torch.manual_seed(0)
    net = ref_modules["sifnet"](args)
    net.eval()  # release inference mode: only the last stack queried

    exp, _ = _write_experiment(tmp_path, "tri-vis-l2", net.state_dict())

    cfg = SIFNetConfig(crop_size=args.loadSize)
    params = TI.sifnet_params(exp, cfg)
    model = SIFNet(cfg, PerspectiveCamera(crop_size=args.loadSize))

    B, H, N = 1, 64, 24
    images = rng.rand(B, H, H, 8).astype(np.float32)
    pts = (rng.randn(B, N, 3) * 0.4 + np.array([0, 0, 2.2])).astype(
        np.float32)
    pts[0, -1] = [5.0, 5.0, 2.2]  # off-image: OUT_DIST clamp parity
    cc = np.array([[1018.0, 779.0]], np.float32)
    bc = np.array([[0.05, -0.1, 2.2]], np.float32)

    with torch.no_grad():
        net.filter(torch.from_numpy(images.transpose(0, 3, 1, 2)))
        net.query(torch.from_numpy(pts),
                  crop_center=torch.from_numpy(cc),
                  body_center=torch.from_numpy(bc))
        t_df, t_pca, t_parts, t_centers, t_vis = [
            x.numpy() for x in net.preds]

    preds = model.apply(params, jnp.asarray(images), jnp.asarray(pts),
                        jnp.asarray(cc), jnp.asarray(bc))
    last = preds[-1]
    np.testing.assert_allclose(np.asarray(last["df"]),
                               t_df.transpose(0, 2, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(last["pca"]),
                               t_pca.transpose(0, 3, 1, 2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(last["parts"]),
                               t_parts.transpose(0, 2, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(last["centers"]),
                               t_centers.transpose(0, 2, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(last["vis"]),
                               t_vis.transpose(0, 2, 1), atol=2e-4)
    # the off-image point must be clamped to OUT_DIST on both sides
    assert np.allclose(t_df[0, :, -1], 5.0)
    assert np.allclose(np.asarray(last["df"])[0, -1], 5.0)


def test_infiller_released_layout_parity(tmp_path, ref_modules, rng):
    """cmf-k4-lrot checkpoint in the released layout -> HVOP-Net parity."""
    import torch
    from vistracker_tpu.models.infiller import (ConditionalMInfiller,
                                                InfillerConfig)
    from vistracker_tpu.models import torch_import as TI

    args = _infiller_args()
    torch.manual_seed(1)
    net = ref_modules["infiller"](args)
    net.eval()
    exp, _ = _write_experiment(tmp_path, "cmf-k4-lrot", net.state_dict())

    cfg = InfillerConfig(clip_len=args.clip_len, window=args.window)
    params = TI.infiller_params(exp, cfg)
    model = ConditionalMInfiller(cfg)

    B, T = 2, args.clip_len
    smpl = rng.randn(B, T, 147).astype(np.float32) * 0.3
    obj = rng.randn(B, T, 6).astype(np.float32) * 0.3
    mask_s = np.zeros((B, T), bool)
    mask_o = rng.rand(B, T) < 0.3
    mask_o[:, :30] = False  # context frames always visible

    with torch.no_grad():
        t_out = net(torch.from_numpy(smpl), torch.from_numpy(mask_s),
                    torch.from_numpy(obj),
                    torch.from_numpy(mask_o)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(smpl),
                                  jnp.asarray(mask_s), jnp.asarray(obj),
                                  jnp.asarray(mask_o)))
    np.testing.assert_allclose(ours, t_out, atol=3e-4)


def test_smoothnet_released_layout_parity(tmp_path, ref_modules, rng):
    """SmoothNet checkpoint.pth.tar layout (smooth_base.py:25-35 incl. the
    epoch >= 10 gate) -> parity for both the objrot and SMPL variants."""
    import torch
    from vistracker_tpu.models.smoothnet import SmoothNet, SmoothNetSMPL
    from vistracker_tpu.models import torch_import as TI

    W = 64
    torch.manual_seed(2)
    tnet = ref_modules["smoothnet"](W, W, 512, 16, 1)
    tnet.eval()
    exp = tmp_path / "smoothnet-orot-w64"
    os.makedirs(exp)
    torch.save({"epoch": 40, "state_dict": tnet.state_dict()},
               str(exp / "checkpoint.pth.tar"))
    params = TI.smoothnet_params(str(exp))
    x = rng.randn(3, 6, W).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x)).numpy()
    ours = np.asarray(SmoothNet(window_size=W, output_size=W).apply(
        params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, t_out, atol=2e-4)

    # under-trained gate (reference smooth_base.py:28 asserts epoch >= 10)
    exp2 = tmp_path / "smoothnet-young"
    os.makedirs(exp2)
    torch.save({"epoch": 3, "state_dict": tnet.state_dict()},
               str(exp2 / "checkpoint.pth.tar"))
    with pytest.raises(ValueError, match="epoch"):
        TI.smoothnet_params(str(exp2))

    # SMPL variant (pose_net + trans_net, smoothnet_smpl.py:13-48)
    tsn = ref_modules["smoothnet_smpl"](W, W, 512, 16, 1)
    tsn.eval()
    exp3 = tmp_path / "smoothnet-smplt-w64"
    os.makedirs(exp3)
    torch.save({"epoch": 40, "state_dict": tsn.state_dict()},
               str(exp3 / "checkpoint.pth.tar"))
    params3 = TI.smoothnet_params(str(exp3), smpl=True)
    xs = rng.randn(2, 157, W).astype(np.float32)
    with torch.no_grad():
        t_out3 = tsn(torch.from_numpy(xs)).numpy()
    ours3 = np.asarray(SmoothNetSMPL(window_size=W, output_size=W).apply(
        params3, jnp.asarray(xs)))
    np.testing.assert_allclose(ours3, t_out3, atol=2e-4)
