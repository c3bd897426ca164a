"""Device-mesh utilities for SPMD execution.

The reference's parallelism inventory (SURVEY.md §2.5): DDP data-parallel
training over NCCL, plus hand-rolled chunk fan-out of per-sequence
optimization across cluster jobs. TPU-native equivalents:

  * training DP  -> jit with batch sharded over a 1-D "data" mesh axis;
    XLA GSPMD inserts the gradient psum (replacing dist_utils.py NCCL).
  * per-sequence frame chunking -> ONE program with the frame axis sharded
    over a "frames" mesh axis; the +-1/+-2-frame temporal stencils become
    automatic collective-permute halo exchanges (replacing --start/--end
    cluster fan-out, README.md:52).
  * multi-host -> jax.distributed.initialize + an extra DCN axis (unused on
    a single slice, kept out of the hot path).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost():
    """Initialize multi-host JAX if a coordinator is configured.

    The reference discovers ranks from env:// or SLURM variables
    (utils/dist_utils.py:12-33); the same class of environment drives this:
    COORDINATOR_ADDRESS (+ NUM_PROCESSES / PROCESS_ID for explicit env://
    -style wiring, matching torch's MASTER_ADDR/RANK/WORLD_SIZE trio) or
    SLURM/TPU-metadata auto-detection. No-op on a single host. Exercised by
    a real 2-process test (tests/test_multihost.py)."""
    import os
    if os.environ.get("COORDINATOR_ADDRESS"):
        kw = {}
        if "NUM_PROCESSES" in os.environ:
            kw["num_processes"] = int(os.environ["NUM_PROCESSES"])
        if "PROCESS_ID" in os.environ:
            kw["process_id"] = int(os.environ["PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"], **kw)
    elif os.environ.get("SLURM_NTASKS"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def global_shard_leading(mesh: Mesh, arr: np.ndarray, axis: str = "data"):
    """Build a GLOBAL sharded array from a host-replicated numpy array in a
    multi-process program: each process materializes only the shards its
    local devices own (the DistributedSampler analog, base_data.py:74-94)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def make_mesh(n_devices: int | None = None, axis: str = "frames") -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


def shard_leading(mesh: Mesh, tree, axis: str = "frames"):
    """Shard every array's leading axis over `axis`; scalars replicate."""
    def put(x):
        if getattr(x, "ndim", 0) == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P(axis)))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (e.g. model params)."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
