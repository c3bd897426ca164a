"""Benchmark: SMPL-T fitting throughput on TPU (pipeline stages 1-2 analog).

Prints ONE JSON line {metric, value, unit, vs_baseline}.

Baseline context: the reference fits SMPL-T with a 100-iter x 10-step Adam
python loop on GPU; stages 1-2 are a stated bottleneck of the 6-8 h
/1500-frame pipeline (reference README.md:50-52). We benchmark the same
workload shape — a 512-frame chunk, full SMPL-H (6890 verts, 52 joints),
full iteration budget (1080 Adam steps) — as one jit'd lax.scan program.

vs_baseline: reference stages 1-2 take >= 2 h for 1500 frames on GPU
(>= 4.8 s/frame incl. the smooth+refit pass); we report
frames_per_second / (1500 frames / 7200 s) so >1.0 means faster than the
reference per-frame rate.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.core import smpl as S
    from vistracker_tpu.core.landmarks import BodyLandmarks
    from vistracker_tpu.core.priors import MahalanobisPrior, HandPrior
    from vistracker_tpu.fit.smplt import (SMPLTFitConfig, SMPLTParams,
                                          fit_smplt, project_pixels)
    from vistracker_tpu.core.smpl import lbs_forward

    B = 512  # frames per chunk (reference demo.sh stage-1 batch size)
    V = 6890
    rng = np.random.RandomState(0)

    model = S.random_smpl_model(0, num_joints=52, num_verts=V)
    reg = rng.rand(25, V).astype(np.float32)
    reg /= reg.sum(1, keepdims=True)
    lms = BodyLandmarks(body25=jnp.asarray(reg), face=jnp.asarray(reg[:1]),
                        hand=jnp.asarray(reg[:1]))
    bp = MahalanobisPrior(mean=jnp.zeros(63), prec=jnp.eye(63) * 0.1)
    hp = HandPrior(mean=jnp.zeros(90), lhand_prec=jnp.eye(45) * 0.1,
                   rhand_prec=jnp.eye(45) * 0.1)
    cfg = SMPLTFitConfig()  # full budget: 8 global + 92 all iters x 10 steps

    t = np.linspace(0, 2 * np.pi, B).astype(np.float32)
    pose = np.zeros((B, 156), np.float32)
    pose[:, 3:66] = 0.3 * np.sin(t)[:, None] * rng.randn(63)[None] * 0.2
    trans = np.stack([0.3 * np.sin(t), 0.1 * np.cos(t), 2.2 + 0.2 * np.sin(t)], -1)
    verts, _, _, _ = lbs_forward(model, jnp.asarray(pose),
                                 jnp.zeros((B, 10)), jnp.asarray(trans))
    kpts2d = np.asarray(project_pixels(lms.body_joints(verts), cfg))
    kpts = jnp.asarray(np.concatenate(
        [kpts2d, np.ones((B, 25, 1), np.float32)], -1))
    init = SMPLTParams.from_full(
        jnp.zeros((B, 156)), jnp.zeros((B, 10)),
        jnp.asarray(trans + np.array([0.15, -0.1, 0.2], np.float32)))

    # compile
    params, losses = fit_smplt(model, lms, bp, hp, kpts, init, cfg)
    jax.block_until_ready(losses)

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        params, losses = fit_smplt(model, lms, bp, hp, kpts, init, cfg)
        jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / runs

    fps = B / dt
    baseline_fps = 1500.0 / 7200.0  # reference stages 1-2: >=2 h / 1500 frames
    print(json.dumps({
        "metric": "smplt_fit_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s (512-frame chunk, 1080 Adam steps, SMPL-H 6890 verts)",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
