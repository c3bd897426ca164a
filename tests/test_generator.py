"""Surface-point generator tests against an analytic sphere UDF: projection
must land points on the sphere and the masked means must be exact."""
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.fit.generator import (GeneratorConfig, make_generator,
                                          init_box_samples)

CENTER = np.array([0.1, -0.2, 2.4], np.float32)
RADIUS = 0.5


def sphere_query_fn(params, cache, points, crop_center, body_center):
    """Analytic UDF of a sphere for both human & object channels; constant
    pca / centers / vis so the masked means have known values."""
    d = jnp.linalg.norm(points - jnp.asarray(CENTER), axis=-1) - RADIUS
    df = jnp.abs(d)
    B, N = df.shape
    return dict(
        df=jnp.stack([df, df], -1),
        parts=jnp.tile(jnp.arange(14.0)[None, None], (B, N, 1)),
        pca=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        centers=jnp.broadcast_to(jnp.asarray([1.0, 2.0, 3.0]), (B, N, 3)),
        vis=jnp.full((B, N, 1), 0.75),
    )


def test_generator_projects_to_sphere():
    cfg = GeneratorConfig(num_steps=10, num_rounds=2, samples_per_round=512,
                          num_points=256, noise_sigma=0.05)
    gen = make_generator(sphere_query_fn, cfg)
    B = 2
    body_center = jnp.asarray(np.tile(CENTER, (B, 1)))
    crop_center = jnp.zeros((B, 2))
    out = gen(None, None, crop_center, body_center, jax.random.PRNGKey(0))
    for target in ("human", "object"):
        o = out[target]
        assert o["points"].shape == (B, 256, 3)
        valid = np.asarray(o["valid"])
        assert valid.mean() > 0.5, valid.mean()  # most selected points valid
        pts = np.asarray(o["points"])
        r = np.linalg.norm(pts - CENTER, axis=-1)
        err = np.abs(r - RADIUS)[valid]
        assert err.max() < cfg.filter_val + 1e-4, err.max()
        # masked means of constant heads are exact
        np.testing.assert_allclose(np.asarray(o["pca_axis"]),
                                   np.broadcast_to(np.eye(3), (B, 3, 3)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(o["centers"]),
                                   np.tile([[1.0, 2.0, 3.0]], (B, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(o["visibility"]), 0.75, atol=1e-5)
        # parts argmax of the constant ramp is 13
        np.testing.assert_array_equal(np.asarray(o["parts"]), 13)


def test_generator_funnel_projects_to_sphere():
    """The row-budget funnel path must harvest the same surface (and the
    same exact masked means) as the reference-budget scan path."""
    cfg = GeneratorConfig(num_points=192, noise_sigma=0.05,
                          funnel=((512, 256, 10), (256, 128, 6)))
    gen = make_generator(sphere_query_fn, cfg)
    B = 2
    body_center = jnp.asarray(np.tile(CENTER, (B, 1)))
    crop_center = jnp.zeros((B, 2))
    out = gen(None, None, crop_center, body_center, jax.random.PRNGKey(0))
    for target in ("human", "object"):
        o = out[target]
        assert o["points"].shape == (B, 192, 3)
        valid = np.asarray(o["valid"])
        assert valid.mean() > 0.5, valid.mean()
        pts = np.asarray(o["points"])
        r = np.linalg.norm(pts - CENTER, axis=-1)
        err = np.abs(r - RADIUS)[valid]
        assert err.max() < cfg.filter_val + 1e-4, err.max()
        np.testing.assert_allclose(np.asarray(o["pca_axis"]),
                                   np.broadcast_to(np.eye(3), (B, 3, 3)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(o["centers"]),
                                   np.tile([[1.0, 2.0, 3.0]], (B, 1)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(o["visibility"]), 0.75,
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(o["parts"]), 13)


def test_init_box_bounds():
    cfg = GeneratorConfig()
    bc = jnp.asarray([[0.0, 0.0, 2.2]])
    s = np.asarray(init_box_samples(jax.random.PRNGKey(0), 1, 4096, bc, cfg))
    assert s[..., 0].min() >= -1.0 and s[..., 0].max() <= 1.0
    assert s[..., 1].min() >= -1.5 and s[..., 1].max() <= 1.5
    assert s[..., 2].min() >= 1.6 and s[..., 2].max() <= 2.8


def test_df_only_fast_path_matches_full():
    """The df-only projection path must produce identical results to
    projecting through the full query."""
    import jax
    import numpy as np
    from vistracker_tpu.models.sifnet import SIFNet, SIFNetConfig
    from vistracker_tpu.fit.generator import (GeneratorConfig, make_generator,
                                              sifnet_query_fn)
    rng = np.random.RandomState(0)
    cfg = SIFNetConfig(num_stack=1, num_hourglass=1, hourglass_dim=32,
                       tmpx_dim=32, triplane_stack=1, triplane_hg_dim=32,
                       triplane_tmpx_dim=32, hidden_dim=16)
    model = SIFNet(cfg)
    B = 1
    imgs = jnp.asarray(rng.rand(B, 32, 32, 8).astype(np.float32))
    cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
    bc = jnp.asarray(np.array([[0, 0, 2.2]], np.float32))
    pts0 = jnp.asarray((rng.randn(B, 8, 3) * 0.3
                        + np.array([0, 0, 2.2])).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs, pts0, cc, bc)
    cache = model.apply(params, imgs, method=SIFNet.encode)

    gcfg = GeneratorConfig(num_steps=3, num_rounds=1, samples_per_round=64,
                           num_points=32)
    qf = sifnet_query_fn(model)
    gen_fast = make_generator(qf, gcfg)
    out_fast = gen_fast(params, cache, cc, bc, jax.random.PRNGKey(1))

    def qf_slow(params, cache, points, cc_, bc_):
        return model.apply(params, cache, points, cc_, bc_,
                           method=SIFNet.query)[-1]
    gen_slow = make_generator(qf_slow, gcfg)
    out_slow = gen_slow(params, cache, cc, bc, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out_fast["human"]["points"]),
                               np.asarray(out_slow["human"]["points"]),
                               atol=1e-6)


def test_generator_median_center_rejects_spurious_pockets():
    """center_agg="median": a second spurious low-df pocket contributing
    <50% of harvested points (with a wildly wrong center prediction there)
    must not move the aggregated center; the reference mean is dragged."""
    POCKET = np.array([1.0, 1.2, 2.9], np.float32)  # inside the search box

    def two_min_query(params, cache, points, crop_center, body_center):
        d1 = jnp.abs(jnp.linalg.norm(points - jnp.asarray(CENTER), axis=-1)
                     - RADIUS)
        d2 = jnp.abs(jnp.linalg.norm(points - jnp.asarray(POCKET), axis=-1)
                     - 0.1)  # small spurious shell
        df = jnp.minimum(d1, d2)
        B, N = df.shape
        # center head: correct near the real sphere, garbage in the pocket
        near_pocket = (d2 < d1)[..., None]
        cent = jnp.where(near_pocket,
                         jnp.asarray([9.0, 9.0, 9.0]),
                         jnp.asarray([1.0, 2.0, 3.0]))
        return dict(df=jnp.stack([df, df], -1),
                    parts=jnp.zeros((B, N, 14)),
                    pca=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
                    centers=jnp.broadcast_to(cent, (B, N, 3)),
                    vis=jnp.full((B, N, 1), 1.0))

    kw = dict(num_steps=10, num_rounds=2, samples_per_round=1024,
              num_points=256, noise_sigma=0.05)
    body_center = jnp.asarray(CENTER)[None]
    crop_center = jnp.zeros((1, 2))
    out_mean = make_generator(two_min_query, GeneratorConfig(**kw))(
        None, None, crop_center, body_center, jax.random.PRNGKey(3))
    out_med = make_generator(
        two_min_query, GeneratorConfig(center_agg="median", **kw))(
        None, None, crop_center, body_center, jax.random.PRNGKey(3))
    # the big sphere dominates the harvest, so the median sticks to the
    # true head value while the mean is visibly polluted
    med_err = np.abs(np.asarray(out_med["object"]["centers"])
                     - [1.0, 2.0, 3.0]).max()
    mean_err = np.abs(np.asarray(out_mean["object"]["centers"])
                      - [1.0, 2.0, 3.0]).max()
    assert med_err < 1e-4, med_err
    assert mean_err > 0.05, mean_err
