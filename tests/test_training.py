"""Training loop, dataset pipeline, and checkpoint/resume tests."""
import os
import numpy as np
import jax
import jax.numpy as jnp

from vistracker_tpu.data.datasets import (PrefetchLoader, sifnet_example,
                                          gen_drop_mask, InfillerClips)
from vistracker_tpu.data.images import (crop_around, prepare_input_crop,
                                        crop_center_from_masks)
from vistracker_tpu.fit.trainer_loop import (LoopConfig, train_loop,
                                             CheckpointIO,
                                             make_infiller_train_step)
from vistracker_tpu.models.infiller import ConditionalMInfiller, InfillerConfig
from vistracker_tpu.core.rotations import axis_angle_to_rotmat


def test_crop_around_padding(rng):
    img = rng.rand(100, 120, 3).astype(np.float32)
    c = crop_around(img, (10, 10), 60)
    assert c.shape == (60, 60, 3)
    assert c[0, 0, 0] == 0.0  # zero-padded corner
    # interior crop reproduces pixels
    c2 = crop_around(img, (60, 50), 40)
    np.testing.assert_array_equal(c2, img[30:70, 40:80])


def test_prepare_input_crop(rng):
    rgb = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    pm = np.zeros((300, 400), bool); pm[100:200, 150:250] = True
    om = np.zeros((300, 400), bool); om[120:180, 230:300] = True
    img, center = prepare_input_crop(rgb, pm, om, crop_size=200, net_size=64)
    assert img.shape == (64, 64, 5)
    # crop center = union bbox center
    np.testing.assert_array_equal(center, crop_center_from_masks(
        pm.astype(np.float32), om.astype(np.float32)).astype(np.float32))
    # background pixels are zeroed in RGB channels
    assert img[..., :3].max() <= 1.0
    bg = (img[..., 3] < 0.5) & (img[..., 4] < 0.5)
    assert np.abs(img[..., :3][bg]).max() < 0.6  # bilinear edge bleed only


def test_prefetch_loader_retry_and_shapes(rng):
    calls = []

    def example(i):
        calls.append(i)
        if i == 3:
            raise ValueError("bad example")  # must be resampled, not fatal
        return {"x": np.full((4,), i, np.float32)}

    loader = PrefetchLoader(example, 10, batch_size=2, shuffle=False,
                            num_workers=2)
    batches = list(loader)
    assert len(batches) == 5
    for b in batches:
        assert b["x"].shape == (2, 4)


def test_prefetch_loader_order_deterministic():
    """Batch ORDER must be reproducible run to run even when worker
    completion order is scrambled (slow early examples). The pre-round-4
    shared output queue yielded in completion order — retrained
    checkpoints were non-reproducible and fixture experiments
    non-comparable across sessions."""
    import time

    def example(i):
        time.sleep(0.02 if i < 4 else 0.0)  # early examples finish LAST
        return {"x": np.full((2,), i, np.float32)}

    def run():
        loader = PrefetchLoader(example, 12, batch_size=2, shuffle=True,
                                num_workers=6, seed=7)
        return [b["x"][:, 0].tolist() for b in loader]

    a, b = run(), run()
    assert a == b
    assert sorted(x for bt in a for x in bt) == list(map(float, range(12)))


def test_prefetch_loader_early_stop_no_deadlock():
    """A consumer that stops after a few batches (bounded val pass) must
    not deadlock or starve subsequent epochs."""
    loader = PrefetchLoader(lambda i: {"x": np.zeros(1, np.float32)}, 40,
                            batch_size=2, num_workers=4)
    for _ in range(3):  # several abandoned epochs
        for bi, _ in enumerate(loader):
            if bi == 2:
                break
    assert len(list(loader)) == 20  # full epoch still completes


def test_gen_drop_mask_bounds(rng):
    for i in range(20):
        m = gen_drop_mask(180, 10, 120, np.random.RandomState(i))
        assert 10 <= m.sum() <= 120


def test_infiller_clips_and_training_step(rng, tmp_path):
    T = 50
    seqs = [dict(poses=(rng.randn(T, 72) * 0.2).astype(np.float32),
                 trans=rng.randn(T, 3).astype(np.float32),
                 obj_rot_real=np.asarray(axis_angle_to_rotmat(
                     jnp.asarray((rng.randn(T, 3) * 0.3).astype(np.float32)))))]
    clips = InfillerClips(seqs, clip_len=40, min_drop=5, max_drop=20)
    assert len(clips) == T - 40 + 1
    ex = clips.example(0)
    assert ex["data_smpl"].shape == (40, 147)
    assert ex["data_obj"].shape == (40, 6)
    # occluded object inputs are zeroed
    np.testing.assert_allclose(ex["data_obj"][ex["mask_obj"]], 0.0)

    cfg = InfillerConfig(clip_len=40, window=10)
    model = ConditionalMInfiller(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 40, 147)), jnp.zeros((1, 40), bool),
                        jnp.zeros((1, 40, 6)), jnp.zeros((1, 40), bool))
    init_state, step_fn, val_fn = make_infiller_train_step(
        model, learning_rate=1e-3)
    state = init_state(params)

    loader = PrefetchLoader(clips.example, len(clips), batch_size=4,
                            num_workers=2)
    lcfg = LoopConfig(num_epochs=2, ck_period_min=1e9,
                      out_dir=str(tmp_path / "exp"), max_val_batches=2)
    to_dev = lambda b: {k: jnp.asarray(v) for k, v in b.items()}

    # in-training downstream autoregressive eval on a held-out sequence
    # (trainer_cinfiller.py:46-194 parity): chamfer/v2v per val epoch in
    # metrics.jsonl + best-model selection on the downstream v2v
    from vistracker_tpu.fit.infill import make_infiller, downstream_recon_eval
    from vistracker_tpu.cli.synthetic import box_mesh
    run = make_infiller(model, cfg)
    occ = np.ones(T, np.float32)
    occ[20:32] = 0.0
    bv, bf = box_mesh()
    held_out = [dict(poses=seqs[0]["poses"], trans=seqs[0]["trans"],
                     obj_rot_real=seqs[0]["obj_rot_real"],
                     obj_rot_gt=seqs[0]["obj_rot_real"], occ=occ,
                     temp_verts=bv, temp_faces=bf)]
    downstream_calls = []

    def downstream(state, step):
        m = downstream_recon_eval(run, state["params"], held_out,
                                  init_thres=0.0, samples=200)
        downstream_calls.append(step)
        return m

    state = train_loop(state, step_fn, loader, val_loader=loader,
                       val_loss_fn=val_fn, cfg=lcfg, to_device=to_dev,
                       downstream_fn=downstream,
                       select_on="downstream_v2v_cm")
    assert int(np.asarray(state["step"])) == 2 * len(loader)
    # metrics written, checkpoint + best model recorded
    assert os.path.isfile(str(tmp_path / "exp" / "metrics.jsonl"))
    assert os.path.isfile(str(tmp_path / "exp" / "best_model.json"))
    # downstream ran per val epoch and its metrics were logged
    assert len(downstream_calls) == 2
    import json as _json
    recs = [_json.loads(l) for l in
            open(str(tmp_path / "exp" / "metrics.jsonl"))]
    dsr = [r for r in recs if "downstream_v2v_cm" in r]
    assert len(dsr) == 2
    assert all(np.isfinite(r["downstream_chamfer_cm"]) for r in dsr)

    # resume restores the saved step
    ckio = CheckpointIO(str(tmp_path / "exp"))
    # template-free raw restore (used when loading weights for inference)
    raw, at_raw = ckio.restore_latest()
    assert "params" in raw and at_raw is not None
    restored, at = ckio.restore_latest(state)
    assert at == int(np.asarray(state["step"]))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored["params"])[0]),
        np.asarray(jax.tree.leaves(state["params"])[0]))


def test_sifnet_example_from_synthetic_frame(rng):
    from vistracker_tpu.cli.synthetic import box_mesh
    sv = rng.randn(60, 3).astype(np.float32) * 0.3 + np.array([0, 0, 2.2],
                                                              np.float32)
    sf = rng.randint(0, 60, (80, 3)).astype(np.int32)
    ov, of = box_mesh()
    frame = dict(image=rng.rand(32, 32, 8).astype(np.float32),
                 crop_center=np.array([1000.0, 800.0], np.float32),
                 body_center=np.array([0, 0, 2.2], np.float32),
                 smpl_verts=sv, smpl_faces=sf,
                 obj_verts=ov + np.array([0.4, 0, 2.2], np.float32),
                 obj_faces=of, visibility=0.8)
    labels = rng.randint(0, 14, 60).astype(np.int32)
    ex = sifnet_example(frame, labels, num_samples=500,
                        rng=np.random.RandomState(0))
    n = len(ex["points"])
    assert ex["df_h"].shape == (n,) and ex["df_o"].shape == (n,)
    assert ex["pca"].shape == (n, 3, 3)
    assert 0 <= ex["parts"].min() and ex["parts"].max() < 14
    # distances are plausible: points near surfaces have small df
    assert ex["df_h"].min() < 0.05 and ex["df_o"].min() < 0.05


def test_reexpress_in_camera_consistency(rng):
    """Re-expressing in a camera must map world root-joint positions through
    the camera transform exactly."""
    from vistracker_tpu.data.datasets import (reexpress_smpl_in_camera,
                                              reexpress_obj_in_camera)
    from scipy.spatial.transform import Rotation
    T = 5
    poses = (rng.randn(T, 156) * 0.3).astype(np.float32)
    trans = rng.randn(T, 3).astype(np.float32)
    roots0 = rng.randn(T, 3).astype(np.float32) * 0.1  # zero-pose roots
    roots = roots0 + trans
    R = Rotation.from_rotvec([0.3, -0.5, 0.2]).as_matrix()
    t = np.array([0.1, 0.2, -0.3])
    new_poses, new_trans = reexpress_smpl_in_camera(poses, trans, roots, R, t)
    # the root joint in the new frame = R @ root_world + t
    new_roots = roots0 + new_trans
    expected = roots @ R.T + t
    np.testing.assert_allclose(new_roots, expected, atol=1e-5)
    # global orientation left-multiplied
    g_old = Rotation.from_rotvec(poses[:, :3]).as_matrix()
    g_new = Rotation.from_rotvec(new_poses[:, :3]).as_matrix()
    np.testing.assert_allclose(g_new, R[None] @ g_old, atol=1e-5)
    # body pose unchanged
    np.testing.assert_array_equal(new_poses[:, 3:], poses[:, 3:])

    rots = Rotation.from_rotvec(rng.randn(T, 3) * 0.4).as_matrix()
    otr = rng.randn(T, 3).astype(np.float32)
    nr, nt = reexpress_obj_in_camera(rots, otr, R, t)
    np.testing.assert_allclose(nr, R[None] @ rots, atol=1e-6)
    np.testing.assert_allclose(nt, otr @ R.T + t, atol=1e-5)


def test_kinect_calib_roundtrip(tmp_path, rng):
    """KinectCalib world<->local roundtrip and KinectTransform wiring."""
    import json
    from scipy.spatial.transform import Rotation
    from vistracker_tpu.data.behave import KinectCalib, KinectTransform
    seq = tmp_path / "Date01_Sub01_box"
    cfg_dir = seq / "config"
    R = Rotation.from_rotvec([0.2, -0.4, 0.1]).as_matrix()
    t = np.array([0.3, -0.1, 1.2])
    for kid in range(2):
        d = cfg_dir / str(kid)
        d.mkdir(parents=True)
        with open(d / "config.json", "w") as f:
            json.dump(dict(rotation=R.reshape(-1).tolist(),
                           translation=t.tolist()), f)
    with open(seq / "info.json", "w") as f:
        json.dump(dict(cat="box", gender="male", kinects=[0, 1],
                       config=str(cfg_dir), empty=None, intrinsic=None), f)

    calib = KinectCalib(str(cfg_dir), 0)
    pts = rng.randn(10, 3)
    back = calib.local2world(calib.world2local(pts))
    np.testing.assert_allclose(back, pts, atol=1e-10)

    kt = KinectTransform(str(seq))
    np.testing.assert_allclose(kt.world2local(pts, 1),
                               calib.world2local(pts), atol=1e-12)

def test_epoch_ck_period_checkpoint_cadence(tmp_path):
    """epoch_ck_period=N checkpoints every N epochs plus always at the
    final epoch (the 1-core-host knob: tiny epochs pay ~25 s per orbax
    save + val otherwise). Default 1 keeps reference parity
    (trainer.py:190-193: checkpoint + val at every epoch end)."""
    import json

    def step_fn(state, batch):
        return {"params": state["params"],
                "step": state["step"] + 1}, jnp.float32(1.0), {}

    def val_fn(state, batch):
        return jnp.float32(2.0)

    loader = PrefetchLoader(lambda i: {"x": np.zeros(2, np.float32)},
                            4, batch_size=2, num_workers=1)

    def run(period, epochs, out):
        state = {"params": jnp.zeros(3), "step": jnp.int32(0)}
        cfg = LoopConfig(num_epochs=epochs, ck_period_min=1e9,
                         epoch_ck_period=period, out_dir=str(out),
                         max_val_batches=1)
        train_loop(state, step_fn, loader, val_loader=loader,
                   val_loss_fn=val_fn, cfg=cfg,
                   to_device=lambda b: b)
        recs = [json.loads(l) for l in open(str(out / "metrics.jsonl"))]
        return [r["step"] for r in recs if "val_loss" in r]

    # default parity: a val record per epoch (2 steps/epoch)
    assert run(1, 3, tmp_path / "p1") == [2, 4, 6]
    # period 2 over 5 epochs: epochs 2, 4 and the forced final epoch 5
    assert run(2, 5, tmp_path / "p2") == [4, 8, 10]
    # period larger than the run still checkpoints the final epoch
    assert run(10, 3, tmp_path / "p10") == [6]
