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


def _ref_label_nn(x, lx, y, ly, yv):
    d = ((x[:, None] - y[None]) ** 2).sum(-1)
    compat = (lx[:, None] == ly[None]) & yv[None]
    return np.where(compat, d, 1e10).min(1)


def test_label_nn_pallas_matches_bruteforce(rng):
    from vistracker_tpu.ops.pallas_nn import label_compatible_nn_pallas
    x = rng.randn(300, 3).astype(np.float32)
    y = rng.randn(250, 3).astype(np.float32)
    lx = rng.randint(0, 14, 300)
    ly = rng.randint(0, 14, 250)
    yv = rng.rand(250) > 0.3
    ref = _ref_label_nn(x, lx, y, ly, yv)
    d = np.asarray(label_compatible_nn_pallas(
        jnp.asarray(x), jnp.asarray(lx), jnp.asarray(y), jnp.asarray(ly),
        jnp.asarray(yv), ty=128, interpret=True))
    np.testing.assert_allclose(d, ref, rtol=1e-5, atol=1e-6)


def test_label_nn_pallas_no_compatible_rows(rng):
    """Rows whose label has no valid counterpart return _BIG and get zero
    gradient (the XLA path behaves the same: contact_loss masks them)."""
    import jax
    from vistracker_tpu.ops.pallas_nn import label_compatible_nn_pallas
    x = rng.randn(40, 3).astype(np.float32)
    y = rng.randn(30, 3).astype(np.float32)
    lx = np.concatenate([np.zeros(20, np.int64), np.ones(20, np.int64)])
    ly = np.zeros(30, np.int64)  # label 1 has NO counterpart
    yv = np.ones(30, bool)
    d, (gx, gy) = jax.value_and_grad(
        lambda xx, yy: label_compatible_nn_pallas(
            xx, jnp.asarray(lx), yy, jnp.asarray(ly), jnp.asarray(yv),
            ty=128, interpret=True).sum(), argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y))
    dd = np.asarray(label_compatible_nn_pallas(
        jnp.asarray(x), jnp.asarray(lx), jnp.asarray(y), jnp.asarray(ly),
        jnp.asarray(yv), ty=128, interpret=True))
    assert (dd[20:] >= 1e9).all()
    np.testing.assert_allclose(np.asarray(gx)[20:], 0.0)


def test_label_nn_pallas_grad_matches_xla(rng):
    """Custom VJP == autodiff of the XLA path on clouds in general
    position (no distance ties), both directions, through a weighted sum."""
    import jax
    from vistracker_tpu.ops.pallas_nn import label_compatible_nn_pallas
    from vistracker_tpu.ops.chamfer import label_compatible_nn
    x = rng.randn(200, 3).astype(np.float32)
    y = rng.randn(150, 3).astype(np.float32)
    lx = rng.randint(0, 5, 200)
    ly = rng.randint(0, 5, 150)
    yv = rng.rand(150) > 0.2
    w = rng.rand(200).astype(np.float32)  # non-uniform cotangent

    def loss_pallas(xx, yy):
        d = label_compatible_nn_pallas(
            xx, jnp.asarray(lx), yy, jnp.asarray(ly), jnp.asarray(yv),
            ty=128, interpret=True)
        return (jnp.where(d < 1e9, d, 0.0) * w).sum()

    def loss_xla(xx, yy):
        d = label_compatible_nn(xx, jnp.asarray(lx), yy, jnp.asarray(ly),
                                jnp.asarray(yv), chunk=64)
        return (jnp.where(d < 1e9, d, 0.0) * w).sum()

    gx_p, gy_p = jax.grad(loss_pallas, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y))
    gx_x, gy_x = jax.grad(loss_xla, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_x),
                               rtol=1e-4, atol=1e-5)


def test_label_nn_pallas_batched(rng):
    """The contact loss uses the batched API over the frame axis (the
    batch lives in the Pallas grid — vmap-of-pallas_call violates Mosaic's
    last-two-dims block tiling rules). Forward AND backward per-example
    parity vs the unbatched reference."""
    import jax
    from vistracker_tpu.ops.pallas_nn import label_nn_pallas_batched
    B = 3
    x = rng.randn(B, 100, 3).astype(np.float32)
    y = rng.randn(B, 80, 3).astype(np.float32)
    lx = rng.randint(0, 4, (B, 100))
    ly = rng.randint(0, 4, (B, 80))
    yv = rng.rand(B, 80) > 0.3

    def loss(a, b):
        d = label_nn_pallas_batched(a, jnp.asarray(lx), b, jnp.asarray(ly),
                                    jnp.asarray(yv), ty=128, interpret=True)
        return jnp.where(d < 1e9, d, 0.0).sum(), d

    (val, d), (gx, gy) = jax.value_and_grad(loss, argnums=(0, 1),
                                            has_aux=True)(
        jnp.asarray(x), jnp.asarray(y))
    out = np.asarray(d)
    for i in range(B):
        ref = _ref_label_nn(x[i], lx[i], y[i], ly[i], yv[i])
        np.testing.assert_allclose(out[i], ref, rtol=1e-5, atol=1e-6)

        def loss_i(a, b):
            from vistracker_tpu.ops.chamfer import label_compatible_nn
            di = label_compatible_nn(a, jnp.asarray(lx[i]), b,
                                     jnp.asarray(ly[i]), jnp.asarray(yv[i]),
                                     chunk=64)
            return jnp.where(di < 1e9, di, 0.0).sum()

        gxi, gyi = jax.grad(loss_i, argnums=(0, 1))(jnp.asarray(x[i]),
                                                    jnp.asarray(y[i]))
        np.testing.assert_allclose(np.asarray(gx)[i], np.asarray(gxi),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy)[i], np.asarray(gyi),
                                   rtol=1e-4, atol=1e-5)
