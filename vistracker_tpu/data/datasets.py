"""Training datasets / host input pipelines.

Parity targets:
  * data/traindata_online.py (BehaveDatasetOnline): per example — RGBM3
    crop + triplane channels (8ch input), 20k boundary samples with online
    GT labeling, per-frame visibility from packed occ_ratios. The igl
    labeling (its 1-2 s/sample bottleneck) is data/sampling.py here.
  * data/traindata_mfiller.py + traindata_cmfiller.py: packed GT sequences
    concatenated, 180-frame clips, random occlusion drops (10-120 frames),
    rot6d streams, optional multi-kinect re-expression augmentation.
  * data/base_data.py exception->resample retry and worker sharding
    (DistributedSampler) -> per-host shard + thread-pool prefetch here.

Design: datasets are plain iterables of numpy batches; device transfer and
sharding happen in the training loop (parallel/mesh.shard_leading). Workers
are threads (numpy releases the GIL in the heavy kernels) with a bounded
prefetch queue.
"""
from __future__ import annotations

import queue
import threading
import traceback
from typing import Callable, Iterator, Sequence

import numpy as np

from .sampling import boundary_sample
from ..core.rotations import axis_angle_to_rot6d, rot6d_to_axis_angle


class PrefetchLoader:
    """Wrap an index-based example fn into a shuffled, batched, prefetched
    loader with the reference's retry-on-error semantics
    (base_data.py:43-53: a failing example is replaced by a random one)."""

    def __init__(self, example_fn: Callable[[int], dict], n_examples: int,
                 batch_size: int, shuffle: bool = True, num_workers: int = 4,
                 seed: int = 0, host_id: int = 0, num_hosts: int = 1,
                 drop_last: bool = True):
        self.example_fn = example_fn
        self.n = n_examples
        self.bs = batch_size
        self.shuffle = shuffle
        self.workers = max(1, num_workers)
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.drop_last = drop_last
        self.epoch = 0

    def _indices(self):
        idx = np.arange(self.n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx[self.host_id::self.num_hosts]  # per-host shard

    def _get(self, i, rng):
        for _ in range(10):
            try:
                return self.example_fn(int(i))
            except Exception:
                traceback.print_exc()
                i = rng.randint(self.n)
        raise RuntimeError("10 consecutive failing examples")

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        self.epoch += 1
        nb = len(idx) // self.bs if self.drop_last else \
            -(-len(idx) // self.bs)
        # one single-slot queue PER BATCH, consumed in batch order: workers
        # still produce in parallel but the yielded stream is deterministic.
        # (The old shared output queue yielded batches in thread-completion
        # order — training batch order varied run to run, which made
        # retrained checkpoints non-reproducible and fixture experiments
        # non-comparable across sessions.)
        slots = [queue.Queue(maxsize=1) for _ in range(nb)]
        rng = np.random.RandomState(self.seed + 1000 + self.epoch)
        # backpressure: at most workers + 4 batches materialized ahead of
        # the consumer (the old shared queue bounded this with maxsize=4)
        ahead = threading.Semaphore(self.workers + 4)
        cancelled = threading.Event()  # set when the consumer stops early

        def produce(batch_indices, slot_q):
            try:
                ex = [self._get(i, rng) for i in batch_indices]
                batch = {k: np.stack([e[k] for e in ex], 0) for k in ex[0]}
                slot_q.put(batch)
            except Exception as e:  # surface worker failures to the consumer
                slot_q.put(e)

        def runner():
            threads = []
            for b in range(nb):
                while not ahead.acquire(timeout=1.0):
                    if cancelled.is_set():
                        return
                if cancelled.is_set():
                    return
                bi = idx[b * self.bs:(b + 1) * self.bs]
                # daemon: a consumer may stop iterating early (e.g. a
                # bounded val pass); blocked producers must not prevent
                # process exit
                t = threading.Thread(target=produce, args=(bi, slots[b]),
                                     daemon=True)
                t.start()
                threads.append(t)
                while len([x for x in threads if x.is_alive()]) >= self.workers:
                    # wait on the oldest live worker instead of spinning
                    for x in threads:
                        if x.is_alive():
                            x.join(timeout=0.05)
                            break
                    threads = [x for x in threads if x.is_alive()]

        threading.Thread(target=runner, daemon=True).start()
        try:
            for b in range(nb):
                batch = slots[b].get()
                ahead.release()
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            # a consumer that stops early (bounded val pass, exception)
            # must not leave producers blocked on backpressure forever
            cancelled.set()

    def __len__(self):
        return len(self._indices()) // self.bs


def sifnet_example(frame: dict, part_labels: np.ndarray,
                   num_samples: int = 20000,
                   sigmas=(0.08, 0.02, 0.003), ratios=(0.01, 0.49, 0.5),
                   grid_ratio: float = 0.01,
                   rng: np.random.RandomState | None = None) -> dict:
    """Build one SIF-Net training example from a prepared frame dict:
    {image (H, W, 8) float32 — RGBM3 + triplane channels,
     crop_center (2,), body_center (3,),
     smpl_verts/smpl_faces, obj_verts/obj_faces (camera frame),
     visibility: scalar occ ratio}.

    Returns the batch-ready training dict (traindata_online.py:83-201).
    """
    rng = rng or np.random.RandomState()
    labels = boundary_sample(frame["smpl_verts"], frame["smpl_faces"],
                             frame["obj_verts"], frame["obj_faces"],
                             part_labels, sigmas, ratios, num_samples,
                             grid_ratio=grid_ratio, rng=rng)
    n = len(labels["points"])
    return dict(
        images=frame["image"].astype(np.float32),
        points=labels["points"],
        df_h=labels["df_h"],
        df_o=labels["df_o"],
        parts=labels["parts"],
        pca=np.broadcast_to(labels["pca_axis"], (n, 3, 3)).copy(),
        obj_center=(labels["obj_center"]
                    - frame["body_center"]).astype(np.float32),
        visibility=np.full(n, frame["visibility"], np.float32),
        crop_center=frame["crop_center"].astype(np.float32),
        body_center=frame["body_center"].astype(np.float32),
    )


# ---------------------------------------------------------------------------
# Multi-kinect view augmentation (traindata_mfiller.py:231-296)
# ---------------------------------------------------------------------------

def reexpress_smpl_in_camera(poses: np.ndarray, trans: np.ndarray,
                             roots: np.ndarray, w2c_R: np.ndarray,
                             w2c_t: np.ndarray):
    """Re-express SMPL poses/translations in another camera.

    poses (T, >=3) axis-angle (global orientation first), trans (T, 3),
    roots (T, 3) root-joint positions (pose-independent), w2c_R (3, 3),
    w2c_t (3,). Returns (new_poses, new_trans). Exact math of
    traindata_mfiller.py:get_smpl_input: the root orientation is
    left-multiplied by R; the translation is corrected for the root
    offset (roots - trans is the beta-dependent zero-pose root)."""
    from scipy.spatial.transform import Rotation
    g = Rotation.from_rotvec(poses[:, :3]).as_matrix()
    new_g = np.matmul(w2c_R[None], g)
    roots_cent = roots - trans
    new_trans = (trans @ w2c_R.T + w2c_t
                 + roots_cent @ w2c_R.T - roots_cent)
    out = poses.copy()
    out[:, :3] = Rotation.from_matrix(new_g).as_rotvec()
    return out, new_trans.astype(np.float32)


def reexpress_obj_in_camera(rots: np.ndarray, trans: np.ndarray,
                            w2c_R: np.ndarray, w2c_t: np.ndarray):
    """Re-express object rotations/translations in another camera
    (traindata_mfiller.py:get_obj_input): R_new = w2c_R @ R,
    t_new = t @ w2c_R.T + w2c_t. rots (T, 3, 3) REAL rotations."""
    new_rot = np.matmul(w2c_R[None], rots)
    new_trans = trans @ w2c_R.T + w2c_t
    return new_rot, new_trans.astype(np.float32)


# ---------------------------------------------------------------------------
# Motion-infiller dataset
# ---------------------------------------------------------------------------

def gen_drop_mask(length: int, min_drop: int, max_drop: int,
                  rng: np.random.RandomState) -> np.ndarray:
    """Random contiguous occlusion drop (traindata_mfiller.py:222-229)."""
    drop = rng.randint(min_drop, max_drop + 1)
    drop = min(drop, length - 1)
    start = rng.randint(0, max(1, length - drop))
    mask = np.zeros(length, bool)
    mask[start:start + drop] = True
    return mask


class InfillerClips:
    """Clip sampler over concatenated packed GT sequences.

    Each example: SMPL stream (clip, 147) = 24-joint rot6d + trans, object
    stream (clip, 6) rot6d, occlusion mask (clip,), GT object rot6d
    (clip, 6). Sequences shorter than clip_len are skipped.
    """

    def __init__(self, sequences: Sequence[dict], clip_len: int = 180,
                 min_drop: int = 10, max_drop: int = 120, seed: int = 0):
        from ..fit.infill import prepare_streams
        self.clips = []
        self.clip_len = clip_len
        self.min_drop = min_drop
        self.max_drop = max_drop
        self.seed = seed
        self.streams = []
        for seq in sequences:
            T = len(seq["poses"])
            if T < clip_len:
                continue
            smpl_s, obj_s = prepare_streams(
                np.asarray(seq["poses"]).reshape(T, -1),
                np.asarray(seq["trans"]),
                np.asarray(seq["obj_rot_real"]))
            sid = len(self.streams)
            self.streams.append((smpl_s, obj_s))
            for start in range(0, T - clip_len + 1):
                self.clips.append((sid, start))

    def __len__(self):
        return len(self.clips)

    def example(self, i: int) -> dict:
        rng = np.random.RandomState(self.seed + i)
        sid, start = self.clips[i]
        smpl_s, obj_s = self.streams[sid]
        sl = slice(start, start + self.clip_len)
        mask = gen_drop_mask(self.clip_len, self.min_drop, self.max_drop, rng)
        obj_in = obj_s[sl] * (1.0 - mask[:, None].astype(np.float32))
        return dict(data_smpl=smpl_s[sl].astype(np.float32),
                    mask_smpl=np.zeros(self.clip_len, bool),
                    data_obj=obj_in.astype(np.float32),
                    mask_obj=mask,
                    gt_obj=obj_s[sl].astype(np.float32))
