"""CHORE model-family variant tests."""
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.models.sifnet import SIFNet, SIFNetConfig, sifnet_losses


def _inputs(rng, B=1, H=32, W=32, N=20):
    return (jnp.asarray(rng.rand(B, H, W, 8).astype(np.float32)),
            jnp.asarray((rng.randn(B, N, 3) * 0.5
                         + np.array([0, 0, 2.2])).astype(np.float32)),
            jnp.tile(jnp.asarray([[1018.0, 779.0]]), (B, 1)),
            jnp.tile(jnp.asarray([[0.0, 0.0, 2.2]]), (B, 1)))


def _gt(rng, B=1, N=20):
    return dict(df_h=jnp.abs(jnp.asarray(rng.randn(B, N).astype(np.float32))) * 0.1,
                df_o=jnp.abs(jnp.asarray(rng.randn(B, N).astype(np.float32))) * 0.1,
                parts=jnp.asarray(rng.randint(0, 14, (B, N)).astype(np.int32)),
                pca=jnp.asarray(rng.randn(B, N, 3, 3).astype(np.float32)),
                obj_center=jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1),
                body_center=jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1),
                visibility=jnp.asarray(rng.rand(B, N).astype(np.float32)))


def _small(variant):
    return SIFNetConfig(variant=variant, num_stack=1, num_hourglass=1,
                        hourglass_dim=32, tmpx_dim=32, triplane_stack=1,
                        triplane_hg_dim=32, triplane_tmpx_dim=32,
                        hidden_dim=16)


def test_chore_variant_no_triplane(rng):
    cfg = _small("chore")
    model = SIFNet(cfg)
    imgs, pts, cc, bc = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), imgs, pts, cc, bc)
    assert "triplane_encoder" not in params["params"]
    assert "visib_predictor" not in params["params"]
    preds = model.apply(params, imgs, pts, cc, bc)[0]
    assert preds["centers"].shape[-1] == 6
    assert "vis" not in preds
    total, terms = sifnet_losses([preds], _gt(rng))
    assert np.isfinite(float(total))


def test_chore_triplane_variant(rng):
    cfg = _small("chore-triplane")
    model = SIFNet(cfg)
    imgs, pts, cc, bc = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), imgs, pts, cc, bc)
    assert "triplane_encoder" in params["params"]
    preds = model.apply(params, imgs, pts, cc, bc)[0]
    assert preds["centers"].shape[-1] == 6 and "vis" not in preds
    # triplane variant has larger features than plain chore
    assert cfg.feature_size > _small("chore").feature_size


def test_vis_variant_heads(rng):
    cfg = _small("chore-triplane-vis")
    model = SIFNet(cfg)
    imgs, pts, cc, bc = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), imgs, pts, cc, bc)
    preds = model.apply(params, imgs, pts, cc, bc)[0]
    assert preds["centers"].shape[-1] == 3
    assert preds["vis"].shape[-1] == 1
    v = np.asarray(preds["vis"])
    assert (v >= 0).all() and (v <= 1).all()  # sigmoid head


def test_remat_variant_same_outputs_and_grads(rng):
    import dataclasses
    cfg = _small("chore-triplane-vis")
    cfg_r = dataclasses.replace(cfg, remat=True)
    model = SIFNet(cfg)
    model_r = SIFNet(cfg_r)
    imgs, pts, cc, bc = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), imgs, pts, cc, bc)
    out = model.apply(params, imgs, pts, cc, bc)[0]
    out_r = model_r.apply(params, imgs, pts, cc, bc)[0]
    np.testing.assert_allclose(np.asarray(out["df"]), np.asarray(out_r["df"]),
                               atol=1e-6)

    def loss(m):
        def f(p):
            o = m.apply(p, imgs, pts, cc, bc, train=True)[0]
            return (o["df"] ** 2).mean()
        return f
    g = jax.grad(loss(model))(params)
    g_r = jax.grad(loss(model_r))(params)
    a = jax.tree.leaves(g)[0]
    b = jax.tree.leaves(g_r)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sifnet_presets_init_and_cli_parse():
    """sifnet_preset names build valid models (checkpoint compatibility
    between the fixture trainer and `track --net-preset`), and the track
    CLI accepts the preset flag with --tiny-nets as alias."""
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.core.camera import PerspectiveCamera
    from vistracker_tpu.models.sifnet import SIFNet, sifnet_preset
    from vistracker_tpu.cli.main import build_parser

    sizes = {}
    for name in ("tiny", "small"):
        cfg = sifnet_preset(name, crop_size=1200)
        model = SIFNet(cfg, PerspectiveCamera(crop_size=1200))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 8)), jnp.zeros((1, 4, 3)),
                            jnp.zeros((1, 2)), jnp.zeros((1, 3)))
        # train=True exercises the multi-stack path: small has
        # num_stack=2 but triplane_stack=1 (the query clamps the
        # triplane stack index to the deepest available)
        outs = model.apply(params, jnp.zeros((1, 32, 32, 8)),
                           jnp.zeros((1, 4, 3)), jnp.zeros((1, 2)),
                           jnp.zeros((1, 3)), train=True)
        assert len(outs) == cfg.num_stack
        assert outs[-1]["df"].shape == (1, 4, 2)
        sizes[name] = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert sizes["small"] > sizes["tiny"]
    # release preset = default config (no init: the conv trunk is big)
    assert sifnet_preset("release").hourglass_dim == 256

    args = build_parser().parse_args(
        ["track", "--seq", "s", "--net-preset", "small"])
    assert args.net_preset == "small" and not args.tiny_nets
    args = build_parser().parse_args(["track", "--seq", "s", "--tiny-nets"])
    assert args.tiny_nets


def test_query_heads_matches_full_query(rng):
    """query_heads (the stage-6 per-step restricted query) must equal the
    corresponding heads of the full last-stack query() — same features,
    same OUT_DIST clamping, same pca reshape."""
    from vistracker_tpu.models.sifnet import SIFNet, pack_cache

    cfg = _small("chore-triplane-vis")
    model = SIFNet(cfg)
    imgs, pts, cc, bc = _inputs(rng, N=40)
    # push some points out of the crop to exercise the OUT_DIST clamp
    pts = pts.at[:, :5, 0].set(50.0)
    params = model.init(jax.random.PRNGKey(0), imgs, pts, cc, bc)
    cache = model.apply(params, imgs, method=SIFNet.encode)
    full = model.apply(params, cache, pts, cc, bc, method=SIFNet.query)[-1]
    for cache_v in (cache, pack_cache(cache)):
        sub = model.apply(params, cache_v, pts, cc, bc,
                          method=SIFNet.query_heads, heads=("df", "parts"))
        assert set(sub) == {"df", "parts"}
        np.testing.assert_allclose(np.asarray(sub["df"]),
                                   np.asarray(full["df"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sub["parts"]),
                                   np.asarray(full["parts"]), atol=1e-5)
    for h in ("pca", "centers", "vis"):
        sub = model.apply(params, cache, pts, cc, bc,
                          method=SIFNet.query_heads, heads=(h,))
        np.testing.assert_allclose(np.asarray(sub[h]),
                                   np.asarray(full[h]), atol=1e-5)


def test_object_optimizer_df_only_query_matches_full(rng):
    """make_object_optimizer with a df-only step query + full
    contact_query_fn produces the same result as the full query wiring
    (the step losses read only df)."""
    import jax
    from vistracker_tpu.fit.joint import JointFitConfig, make_object_optimizer
    from vistracker_tpu.data.silprep import prepare_sil_refs

    B, N = 2, 64
    tgt = jnp.asarray(rng.randn(3).astype(np.float32) * 0.1
                      + np.array([0, 0, 2.2], np.float32))

    def query_full(ctx, points):
        d = jnp.linalg.norm(points - tgt, axis=-1, keepdims=True) - 0.1
        df = jnp.concatenate([d + 0.05, jnp.maximum(d, 0.0)], -1)
        parts = jnp.tile(jax.nn.one_hot(jnp.arange(points.shape[1]) % 14, 14),
                         (points.shape[0], 1, 1))
        return dict(df=df, parts=parts,
                    centers=jnp.zeros(points.shape[:2] + (3,)),
                    vis=jnp.ones(points.shape[:2] + (1,)))

    def query_df(ctx, points):
        return {"df": query_full(ctx, points)["df"]}

    def project_px(ctx, points):
        return points[..., :2] * 500.0 + 1000.0

    cfg = JointFitConfig(iter_obj=2, iter_sil=1, joint_max_iter=2)
    pts = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.1)
    verts = jnp.asarray(rng.randn(B, 128, 3).astype(np.float32) * 0.3
                        + np.array([0, 0, 2.2], np.float32))
    labels_h = jnp.asarray(rng.randint(0, 14, 128).astype(np.int32))
    faces = jnp.asarray(rng.randint(0, N, (32, 3)).astype(np.int32))
    pm = (rng.rand(B, cfg.sil_size, cfg.sil_size) > 0.7).astype(np.float32)
    om = (rng.rand(B, cfg.sil_size, cfg.sil_size) > 0.8).astype(np.float32)
    sil = prepare_sil_refs(pm, om, np.tile([[1018.0, 779.0]], (B, 1)),
                           1200, cfg.sil_size, cfg.sil_size)
    r0 = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    t0 = jnp.tile(jnp.asarray([[0.0, 0.0, 2.2]]), (B, 1))
    args = (r0, t0, jnp.ones(B), pts, verts, labels_h, jnp.ones(B), sil,
            pts, faces)

    r_a, t_a, _ = make_object_optimizer(query_full, project_px, cfg)(*args)
    r_b, t_b, _ = make_object_optimizer(
        query_df, project_px, cfg, contact_query_fn=query_full)(*args)
    np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b), atol=1e-6)
