"""SIF-Net training-step benchmark at the reference's configuration.

Reference: one training forward pass at bs 8, 20k query samples took
~3.34 s on the training GPU (trainer/trainer.py:149). This measures our
full train STEP (forward + backward + Adam) at the same batch/sample
config on one TPU chip, with encoder remat on (memory) and off.

Usage: python scripts/bench_sifnet_train.py [--size 512] [--remat]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--samples", type=int, default=20000)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vistracker_tpu.models.sifnet import SIFNet, SIFNetConfig
    from vistracker_tpu.fit.train import (TrainConfig, init_train_state,
                                          make_train_step)

    rng = np.random.RandomState(0)
    B, S, N = args.batch, args.size, args.samples
    cfg = SIFNetConfig(remat=args.remat)
    model = SIFNet(cfg)
    batch = dict(
        images=jnp.asarray(rng.rand(B, S, S, 8).astype(np.float32)),
        points=jnp.asarray((rng.randn(B, N, 3) * 0.5
                            + np.array([0, 0, 2.2])).astype(np.float32)),
        crop_center=jnp.tile(jnp.asarray([[1018.0, 779.0]]), (B, 1)),
        body_center=jnp.tile(jnp.asarray([[0.0, 0.0, 2.2]]), (B, 1)),
        df_h=jnp.abs(jnp.asarray(rng.randn(B, N).astype(np.float32))) * 0.1,
        df_o=jnp.abs(jnp.asarray(rng.randn(B, N).astype(np.float32))) * 0.1,
        parts=jnp.asarray(rng.randint(0, 14, (B, N)).astype(np.int32)),
        pca=jnp.asarray(rng.randn(B, N, 3, 3).astype(np.float32)),
        obj_center=jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1),
        visibility=jnp.asarray(rng.rand(B, N).astype(np.float32)),
    )
    tcfg = TrainConfig()
    state = init_train_state(model, jax.random.PRNGKey(0), batch, tcfg)
    step = make_train_step(model, tcfg)
    state, loss, _ = step(state, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        state, loss, _ = step(state, batch)
        jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / args.reps
    print(f"sifnet train step bs={B} {S}x{S} {N} samples remat={args.remat}: "
          f"{dt * 1000:.0f} ms (reference fwd-only: ~3340 ms)")


if __name__ == "__main__":
    main()
