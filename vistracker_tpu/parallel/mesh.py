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
    (utils/dist_utils.py:12-33); jax.distributed.initialize() reads the
    same class of environment (COORDINATOR_ADDRESS / SLURM / TPU metadata)
    and wires the DCN mesh axis. No-op on a single host.
    """
    import os
    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("SLURM_NTASKS"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


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
