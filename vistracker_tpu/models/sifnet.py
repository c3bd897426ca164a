"""SIF-Net: pixel-aligned implicit network with triplane conditioning and
object-visibility prediction.

Parity targets:
  * /root/reference/model/chore.py (CHORE base: filter/query/decode, z-feat,
    OUT_DIST clamping, decoder MLPs)
  * model/chore_triplane.py (triplane encoders + orthographic projection,
    feature concatenation order)
  * model/chore_tri_vis.py (CHORETriplaneVisibility = the release
    `chore-triplane-vis` model: 3-ch object-center head + sigmoid visibility
    head; loss table in `sifnet_losses`)

Design (TPU-first):
  * Stateless: `encode` returns an explicit FeatureCache pytree; `query`
    consumes it. No mutable buffers — encode once / query many times inside
    jit'd fitting loops (the reference caches in self.im_feat_list).
  * Channels-last everywhere; point features are (B, N, F) so every decoder
    head is a Dense chain fused by XLA into batched matmuls on the MXU.
  * Feature gathers run through ops.grid_sample (sparse bilinear gathers).

Query feature layout per stack, matching chore_triplane.py:139-151 order:
  [rgb_hg_feat(256) | z_feat(3) | rgb_tmpx(64) |
   triplane_tmpx right/back/top (3*32) | triplane_hg right/back/top (3*64)]
  = 611 features for the release config.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .hourglass import HGFilter, HGConfig
from ..core.camera import PerspectiveCamera, triplane_project
from ..ops.grid_sample import (grid_sample_points, grid_sample_points_packed,
                               pack_corners)


def pack_cache(cache: dict, pack_tmpx: bool = True,
               pack_hg: bool = True) -> dict:
    """Repack an encode() cache into the corner-packed layout: sampling then
    needs ONE gather per point per map instead of four (TPU gathers are
    row-count bound, PERF_NOTES.md). 4x cache memory; numerically exact.
    Use for inference (generator + joint optimization), where the cache is
    sampled hundreds of times.

    pack_tmpx=False leaves the half-resolution stem maps (tmpx/tp_tmpx)
    unpacked — they are 4x the pixels of the hourglass maps, and packing
    them quadruples the dominant memory term (e.g. 96 frames at 512² would
    exceed one chip's HBM). pack_hg=False likewise leaves the hourglass
    maps unpacked — at 32+ frame optimization chunks with the release net
    even the packed hg maps are several GB and crowd out the optimizer's
    working set (the gather savings are then not worth the HBM). Mixed
    caches work: per-map packing is detected by each map's own marker
    entry.
    """
    # markers are EMPTY TUPLES: pytree structure (static under jit),
    # not traced leaves like bools would be
    out = dict(
        rgb_feats=([pack_corners(f) for f in cache["rgb_feats"]]
                   if pack_hg else list(cache["rgb_feats"])),
        tp_feats=([[pack_corners(f) for f in fl] for fl in cache["tp_feats"]]
                  if pack_hg else [list(fl) for fl in cache["tp_feats"]]),
    )
    if pack_hg:
        out["packed"] = ()
    if pack_tmpx:
        out["tmpx_packed"] = ()
        out["tmpx"] = pack_corners(cache["tmpx"])
        out["tp_tmpx"] = [pack_corners(t) for t in cache["tp_tmpx"]]
    else:
        out["tmpx"] = cache["tmpx"]
        out["tp_tmpx"] = list(cache["tp_tmpx"])
    return out


def cast_cache(cache: dict, dtype) -> dict:
    """Cast every feature map in an encode()/pack_cache() cache to dtype.

    bfloat16 halves the cache's HBM footprint AND the gather bandwidth of
    every query (the stage-4 surface harvest and the stage-6 optimizer
    loops sample the cache thousands of times; gathers read dtype-sized
    rows). The bilinear blend and all decoder heads still run in fp32 —
    grid_sample promotes to the uv dtype — so only the stored features are
    rounded (~3 significant digits, inference-safe; parity pinned by
    tests/test_ops.py::test_query_bf16_cache_close).
    """
    return jax.tree.map(lambda a: a.astype(dtype), cache)


@dataclasses.dataclass(frozen=True)
class SIFNetConfig:
    # model family variant:
    #   "chore"              — plain CHORE (chore.py): no triplane encoders,
    #                          6-ch center head (SMPL + object), no vis head
    #   "chore-triplane"     — + triplane encoders (chore_triplane.py)
    #   "chore-triplane-vis" — release SIF-Net (chore_tri_vis.py): 3-ch
    #                          object-center head + sigmoid visibility head
    variant: str = "chore-triplane-vis"
    # RGB encoder (tri-vis-l2.json)
    input_channels: int = 5
    num_stack: int = 3
    num_hourglass: int = 2
    hourglass_dim: int = 256
    tmpx_dim: int = 64
    # triplane encoders
    triplane_stack: int = 3
    triplane_hg_dim: int = 64
    triplane_tmpx_dim: int = 32
    triplane_shared: bool = True
    # decoders
    num_parts: int = 14
    hidden_dim: int = 128
    # query geometry
    z0: float = 2.2
    out_dist: float = 5.0
    crop_size: int = 1200
    # training
    max_dist: float = 0.1  # df clamp (config clamp_thres)
    loss_weights: tuple = (1.0, 1.0, 0.006, 500.0, 1000.0, 1000.0)
    remat: bool = False    # checkpoint encoder activations (training memory)
    dtype: Any = jnp.float32

    @property
    def has_triplane(self) -> bool:
        return self.variant != "chore"

    @property
    def has_visibility(self) -> bool:
        return self.variant == "chore-triplane-vis"

    @property
    def feature_size(self) -> int:
        zfeat = 3
        if self.has_triplane:
            zfeat += (self.triplane_hg_dim + self.triplane_tmpx_dim) * 3
        return self.hourglass_dim + zfeat + self.hourglass_dim // 4


def sifnet_preset(name: str, crop_size: int = 1200,
                  remat: bool = False) -> SIFNetConfig:
    """Named size presets shared by the track CLI and the fixture trainer
    (the checkpoint only loads back if both sides build the same config).

    release — tri-vis-l2.json dims (the default SIFNetConfig)
    small   — capacity for a ~100-frame fixture overfit without release
              training cost (the tiny preset's 16-d heads plateau:
              results/fixture_diagnostics.json)
    tiny    — pipeline smoke tests
    """
    if name == "release":
        return SIFNetConfig(crop_size=crop_size, remat=remat)
    if name == "small":
        return SIFNetConfig(num_stack=2, num_hourglass=2, hourglass_dim=64,
                            tmpx_dim=32, triplane_stack=1,
                            triplane_hg_dim=64, triplane_tmpx_dim=32,
                            hidden_dim=64, crop_size=crop_size, remat=remat)
    if name == "tiny":
        return SIFNetConfig(num_stack=1, num_hourglass=1, hourglass_dim=32,
                            tmpx_dim=32, triplane_stack=1,
                            triplane_hg_dim=32, triplane_tmpx_dim=32,
                            hidden_dim=16, crop_size=crop_size, remat=remat)
    raise ValueError(f"unknown sifnet preset {name!r}")


class DecoderHead(nn.Module):
    """4-layer 1x1 MLP head (chore.py:make_decoder), applied per point."""

    out_dim: int
    hidden_dim: int = 128
    sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc0")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc2")(x))
        x = nn.Dense(self.out_dim, name="fc3")(x)
        return nn.sigmoid(x) if self.sigmoid else x


class SIFNet(nn.Module):
    """chore-triplane-vis as a stateless flax module."""

    cfg: SIFNetConfig = SIFNetConfig()
    camera: PerspectiveCamera = PerspectiveCamera()

    def setup(self):
        c = self.cfg
        # remat: recompute encoder activations in the backward pass — the
        # 3-stack hourglass at 512^2 holds GBs of activations at training
        # batch sizes; trading FLOPs for HBM keeps bs=8 on one chip
        hg_cls = nn.remat(HGFilter) if c.remat else HGFilter
        self.image_filter = hg_cls(HGConfig(
            input_channels=c.input_channels, num_stack=c.num_stack,
            num_hourglass=c.num_hourglass, hourglass_dim=c.hourglass_dim,
            tmpx_dim=c.tmpx_dim, dtype=c.dtype), name="image_filter")
        if c.has_triplane:
            tp_cfg = HGConfig(
                input_channels=1, num_stack=c.triplane_stack,
                num_hourglass=c.num_hourglass, hourglass_dim=c.triplane_hg_dim,
                tmpx_dim=c.triplane_tmpx_dim, dtype=c.dtype)
            if c.triplane_shared:
                self.triplane_encoder = hg_cls(tp_cfg, name="triplane_encoder")
            else:
                self.triplane_encoders = [hg_cls(tp_cfg, name=f"triplane_encoder_{i}")
                                          for i in range(3)]
        self.df = DecoderHead(2, c.hidden_dim, name="df")
        self.part_predictor = DecoderHead(c.num_parts, c.hidden_dim,
                                          name="part_predictor")
        self.pca_predictor = DecoderHead(9, c.hidden_dim, name="pca_predictor")
        # chore: 6-ch centers (SMPL + object, chore.py:79);
        # vis variant: 3-ch object center + visibility (chore_tri_vis.py)
        center_dim = 3 if c.has_visibility else 6
        self.center_predictor = DecoderHead(center_dim, c.hidden_dim,
                                            name="center_predictor")
        if c.has_visibility:
            self.visib_predictor = DecoderHead(1, c.hidden_dim, sigmoid=True,
                                               name="visib_predictor")

    # ---------------- encoding ----------------

    def encode(self, images, train: bool = False):
        """images: (B, H, W, 8) = [RGB*unionmask, person mask, object mask,
        triplane right, back, top]. Returns a FeatureCache dict.

        At inference only the last stack's features are kept
        (chore.py:143-144).
        """
        rgb_feats, tmpx, _ = self.image_filter(images[..., :5])
        # reference detaches the stem skip feature (HGFilters.py:203)
        tmpx = jax.lax.stop_gradient(tmpx)
        if not train:
            rgb_feats = rgb_feats[-1:]
        if not self.cfg.has_triplane:
            return dict(rgb_feats=rgb_feats, tmpx=tmpx,
                        tp_feats=[], tp_tmpx=[])
        tp_feats, tp_tmpx = [], []
        for i in range(3):
            enc = (self.triplane_encoder if self.cfg.triplane_shared
                   else self.triplane_encoders[i])
            feats, ttmp, _ = enc(images[..., 5 + i:6 + i])
            if not train:
                feats = feats[-1:]
            tp_feats.append(feats)
            tp_tmpx.append(jax.lax.stop_gradient(ttmp))
        return dict(rgb_feats=rgb_feats, tmpx=tmpx,
                    tp_feats=tp_feats, tp_tmpx=tp_tmpx)

    # ---------------- query ----------------

    def _point_features(self, cache, stack_idx, points, crop_center,
                        body_center):
        """Assemble (B, N, F) features for one stack + in-image mask."""
        xyz = self.camera.project_points(points, crop_center)  # (B, N, 3)
        xy = xyz[..., :2]
        in_img = ((xy[..., 0] >= -1.0) & (xy[..., 0] <= 1.0)
                  & (xy[..., 1] >= -1.0) & (xy[..., 1] <= 1.0))
        z_feat = jnp.concatenate(
            [points[..., 0:2], points[..., 2:3] - self.cfg.z0], axis=-1)

        sample = (grid_sample_points_packed if "packed" in cache
                  else grid_sample_points)
        sample_tmpx = (grid_sample_points_packed if "tmpx_packed" in cache
                       else grid_sample_points)
        feats = [sample(cache["rgb_feats"][stack_idx], xy), z_feat,
                 sample_tmpx(cache["tmpx"], xy)]
        if self.cfg.has_triplane:
            tp_uv = triplane_project(points, body_center)  # (B, 3, N, 2)
            for p in range(3):
                feats.append(sample_tmpx(cache["tp_tmpx"][p], tp_uv[:, p]))
            # the reference ties triplane stacks to main stacks
            # (chore_triplane.py:146 view_feat[feat_idx]); when
            # triplane_stack < num_stack (small preset) every main stack
            # reads the deepest triplane stack
            tp_idx = min(stack_idx, len(cache["tp_feats"][0]) - 1)
            for p in range(3):
                feats.append(sample(cache["tp_feats"][p][tp_idx],
                                    tp_uv[:, p]))
        # reorder to reference layout: tmpx triplanes concatenated before
        # per-plane hourglass feats (chore_triplane.py:135,144-149)
        out = jnp.concatenate(feats, axis=-1)
        return out, in_img

    def decode(self, features):
        """(B, N, F) -> dict of heads, channels-last (B, N, D)."""
        pca = self.pca_predictor(features)
        out = dict(
            df=self.df(features),                       # (B, N, 2)
            pca=pca.reshape(pca.shape[:-1] + (3, 3)),   # (B, N, 3, 3)
            parts=self.part_predictor(features),        # (B, N, 14)
            centers=self.center_predictor(features),    # (B, N, 3 or 6)
        )
        if self.cfg.has_visibility:
            out["vis"] = self.visib_predictor(features)  # (B, N, 1)
        return out

    def query_df(self, cache, points, crop_center, body_center):
        """df head only, last stack — the surface-projection inner loop
        (fit/generator.py) differentiates ONLY df w.r.t. points, so
        skipping the other four heads cuts ~60% of the decode FLOPs in the
        hottest stage-4 loop. Returns (B, N, 2) with OUT_DIST clamping."""
        feat, in_img = self._point_features(cache, -1, points, crop_center,
                                            body_center)
        df = self.df(feat)
        return jnp.where(in_img[..., None], df, self.cfg.out_dist)

    def query_heads(self, cache, points, crop_center, body_center,
                    heads: tuple = ("df",)):
        """Last-stack query restricted to a subset of decoder heads.

        The stage-6 per-step losses read only `df` (object phases,
        fit/joint.py:loss_obj_env/loss_joint_env) or `df` + `parts` (SMPL
        phase, loss_terms); each head is a full 4-layer MLP from the
        611-d feature (make_decoder, reference chore.py:113-126). Under
        jit this is runtime-equivalent to query() + subscript (XLA DCE
        prunes unread heads — measured 1.00x on the stage-6 phases,
        scripts/profile_stage6_heads.py); it keeps the traced program
        smaller and the head dependence explicit. `heads` must be a
        static tuple. df gets the OUT_DIST clamp like query()."""
        feat, in_img = self._point_features(cache, -1, points, crop_center,
                                            body_center)
        table = {"df": self.df, "parts": self.part_predictor,
                 "pca": self.pca_predictor, "centers": self.center_predictor}
        if self.cfg.has_visibility:
            table["vis"] = self.visib_predictor
        out = {}
        for h in heads:
            v = table[h](feat)
            if h == "df":
                v = jnp.where(in_img[..., None], v, self.cfg.out_dist)
            elif h == "pca":
                v = v.reshape(v.shape[:-1] + (3, 3))
            out[h] = v
        return out

    def query(self, cache, points, crop_center, body_center):
        """Query all cached stacks at 3D points.

        Returns a list (one per stack) of head dicts; out-of-image points get
        df = OUT_DIST (chore.py:201-205).
        """
        preds_list = []
        for s in range(len(cache["rgb_feats"])):
            feat, in_img = self._point_features(cache, s, points, crop_center,
                                                body_center)
            preds = self.decode(feat)
            preds["df"] = jnp.where(in_img[..., None], preds["df"],
                                    self.cfg.out_dist)
            preds_list.append(preds)
        return preds_list

    def __call__(self, images, points, crop_center, body_center,
                 train: bool = False):
        cache = self.encode(images, train=train)
        return self.query(cache, points, crop_center, body_center)


def sifnet_losses(preds_list, gt, loss_weights=(1.0, 1.0, 0.006, 500.0,
                                                1000.0, 1000.0),
                  max_dist: float = 0.1):
    """Training loss, parity with chore_tri_vis.py:get_errors.

    gt: dict with df_h (B,N), df_o (B,N), parts (B,N) int, pca (B,N,3,3),
    obj_center (B,3), and visibility (B,N) for the vis variant or
    body_center (B,3) for chore/chore-triplane (whose 6-ch center head
    carries the SMPL center in channels 0:3, chore.py:get_errors).

    Returns (total_error, dict of per-term scalars), both averaged over
    stacks. Note the reference reduction quirks: df losses are sum over
    points then mean over batch; CE likewise; masked MSE terms are plain
    means over ALL elements (mask zeroes, no renormalization).
    """
    w = loss_weights
    total = 0.0
    terms = dict(df_h=0.0, df_o=0.0, parts=0.0, pca=0.0, vis=0.0, ocenter=0.0)
    n_stacks = len(preds_list)
    for preds in preds_list:
        df_h_pred, df_o_pred = preds["df"][..., 0], preds["df"][..., 1]
        l_h = jnp.abs(jnp.minimum(df_h_pred, max_dist)
                      - jnp.minimum(gt["df_h"], max_dist)).sum(-1).mean() * w[0]
        l_o = jnp.abs(jnp.minimum(df_o_pred, max_dist)
                      - jnp.minimum(gt["df_o"], max_dist)).sum(-1).mean() * w[1]

        logp = jax.nn.log_softmax(preds["parts"], axis=-1)
        ce = -jnp.take_along_axis(logp, gt["parts"][..., None], axis=-1)[..., 0]
        l_parts = (ce * w[2]).sum(-1).mean()

        mask_o = (gt["df_o"] < 0.05).astype(jnp.float32)  # (B, N)
        l_pca = ((preds["pca"] - gt["pca"]) ** 2
                 * mask_o[..., None, None]).mean() * w[3]
        if "vis" in preds:
            # vis variant: 3-ch object center + visibility loss
            l_ocent = ((preds["centers"] - gt["obj_center"][:, None, :]) ** 2
                       * mask_o[..., None]).mean() * w[4]
            l_last = ((preds["vis"][..., 0] - gt["visibility"]) ** 2
                      * mask_o).mean() * w[5]
        else:
            # chore(-triplane): 6-ch centers; SMPL-center loss on ch 0:3
            # masked by df_h < 0.05 (chore.py:273-277)
            l_ocent = ((preds["centers"][..., 3:]
                        - gt["obj_center"][:, None, :]) ** 2
                       * mask_o[..., None]).mean() * w[4]
            mask_h = (gt["df_h"] < 0.05).astype(jnp.float32)
            l_last = ((preds["centers"][..., :3]
                       - gt["body_center"][:, None, :]) ** 2
                      * mask_h[..., None]).mean() * w[5]

        total = total + l_h + l_o + l_parts + l_pca + l_ocent + l_last
        for k, v in zip(("df_h", "df_o", "parts", "pca", "ocenter", "vis"),
                        (l_h, l_o, l_parts, l_pca, l_ocent, l_last)):
            terms[k] = terms[k] + v / n_stacks
    return total / n_stacks, terms
