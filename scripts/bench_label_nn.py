"""Contact-pairing kernel bench: Pallas label-NN vs XLA lax.map path.

Measures the contact_loss-shaped value_and_grad (B=8, 6890<->3000, both
directions, part labels 0..13) — the top stage-6 joint-phase term per
scripts/profile_stage6_step.py. Run on the TPU.
"""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    from vistracker_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.ops.chamfer import label_compatible_nn
    from vistracker_tpu.ops.pallas_nn import label_nn_pallas_batched

    rng = np.random.RandomState(0)
    B, V, NO = 8, 6890, 3000
    sv = jnp.asarray(rng.randn(B, V, 3).astype(np.float32) * 0.3)
    ov = jnp.asarray(rng.randn(B, NO, 3).astype(np.float32) * 0.15)
    lh = jnp.asarray(rng.randint(0, 14, (B, V)).astype(np.int32))
    lo = jnp.asarray(rng.randint(0, 14, (B, NO)).astype(np.int32))
    mh = jnp.asarray(rng.rand(B, V) < 0.1)
    mo = jnp.asarray(rng.rand(B, NO) < 0.3)

    def contact_xla(obj_arg):
        def one(s, o, mhh, moo, lhh, loo):
            d_h = label_compatible_nn(s, lhh, o, loo, moo)
            d_o = label_compatible_nn(o, loo, s, lhh, mhh)
            return (jnp.where(d_h < 1e9, d_h, 0.0).sum()
                    + jnp.where(d_o < 1e9, d_o, 0.0).sum())
        return jax.vmap(one)(sv, obj_arg, mh, mo, lh, lo).sum()

    def contact_pallas(obj_arg):
        d_h = label_nn_pallas_batched(sv, lh, obj_arg, lo, mo)
        d_o = label_nn_pallas_batched(obj_arg, lo, sv, lh, mh)
        return (jnp.where(d_h < 1e9, d_h, 0.0).sum()
                + jnp.where(d_o < 1e9, d_o, 0.0).sum())

    @jax.jit
    def tiny(x):
        return (x * 2.0).mean()

    x8 = jnp.ones((8, 8))
    np.asarray(tiny(x8))
    t0 = time.perf_counter()
    for _ in range(20):
        np.asarray(tiny(x8))
    floor = (time.perf_counter() - t0) / 20
    print(f"rpc floor {floor * 1e3:.1f} ms")

    for name, fn in (("xla  ", jax.jit(jax.value_and_grad(contact_xla))),
                     ("pallas", jax.jit(jax.value_and_grad(contact_pallas)))):
        v, g = fn(ov)
        np.asarray(v)
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            np.asarray(fn(ov)[0])
        dt = ((time.perf_counter() - t0) / n - floor) * 1e3
        print(f"{name} contact v+g: {dt:7.2f} ms  (value {float(v):.4f})")


if __name__ == "__main__":
    main()
