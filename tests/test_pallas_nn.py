"""Pallas NN kernel correctness (interpret mode on the CPU mesh)."""
import numpy as np
import jax.numpy as jnp

from vistracker_tpu.ops.pallas_nn import nn_min_sqdist_pallas, chamfer_pallas
from vistracker_tpu.ops.chamfer import chamfer_distance


def test_nn_min_sqdist_matches_bruteforce(rng):
    x = rng.randn(300, 3).astype(np.float32)
    y = rng.randn(250, 3).astype(np.float32)
    ref = ((x[:, None] - y[None]) ** 2).sum(-1).min(1)
    d = np.asarray(nn_min_sqdist_pallas(jnp.asarray(x), jnp.asarray(y),
                                        ty=128, interpret=True))
    np.testing.assert_allclose(d, ref, rtol=1e-5, atol=1e-6)


def test_nn_min_sqdist_masked(rng):
    x = rng.randn(100, 3).astype(np.float32)
    y = rng.randn(120, 3).astype(np.float32)
    mask = rng.rand(120) > 0.4
    ref = np.where(mask[None], ((x[:, None] - y[None]) ** 2).sum(-1),
                   1e10).min(1)
    d = np.asarray(nn_min_sqdist_pallas(jnp.asarray(x), jnp.asarray(y),
                                        jnp.asarray(mask), ty=128,
                                        interpret=True))
    np.testing.assert_allclose(d, ref, rtol=1e-5, atol=1e-6)


def test_chamfer_pallas_matches_xla(rng):
    s1 = rng.randn(2, 200, 3).astype(np.float32)
    s2 = rng.randn(2, 150, 3).astype(np.float32)
    ours = np.asarray(chamfer_pallas(jnp.asarray(s1), jnp.asarray(s2),
                                     interpret=True))
    ref = np.asarray(chamfer_distance(jnp.asarray(s1), jnp.asarray(s2),
                                      chunk=128))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
