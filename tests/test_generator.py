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


def test_init_box_bounds():
    cfg = GeneratorConfig()
    bc = jnp.asarray([[0.0, 0.0, 2.2]])
    s = np.asarray(init_box_samples(jax.random.PRNGKey(0), 1, 4096, bc, cfg))
    assert s[..., 0].min() >= -1.0 and s[..., 0].max() <= 1.0
    assert s[..., 1].min() >= -1.5 and s[..., 1].max() <= 1.5
    assert s[..., 2].min() >= 1.6 and s[..., 2].max() <= 2.8
