"""Worker process for the 2-process jax.distributed test.

Run as: python multihost_worker.py <process_id> <num_processes> <port>
Each process gets 4 virtual CPU devices -> an 8-device global mesh. The
worker initializes through parallel.mesh.init_multihost (env://-style),
builds a global data-sharded batch, and runs one data-parallel SIF-Net-like
train step where the gradient all-reduce crosses the process boundary.
Prints "MULTIHOST_OK <loss>" on success.
"""
import os
import sys


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    for k in list(os.environ):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "PJRT_")):
            os.environ.pop(k)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["NUM_PROCESSES"] = str(n)
    os.environ["PROCESS_ID"] = str(pid)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from vistracker_tpu.parallel.mesh import (init_multihost, make_mesh,
                                              global_shard_leading)

    host_id, n_hosts = init_multihost()
    assert n_hosts == n, (host_id, n_hosts)
    assert jax.device_count() == 4 * n
    assert jax.local_device_count() == 4

    mesh = make_mesh(axis="data")
    B, D = 16, 8
    rng = np.random.RandomState(0)  # same data on every host
    x = rng.randn(B, D).astype(np.float32)
    y = rng.randn(B, 1).astype(np.float32)
    w0 = jnp.asarray(rng.randn(D, 1).astype(np.float32) * 0.1)
    xg = global_shard_leading(mesh, x, "data")
    yg = global_shard_leading(mesh, y, "data")

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(w)
        return loss, w - 0.1 * g

    loss, w1 = step(w0, xg, yg)
    # reference: single-process numpy
    pred = x @ np.asarray(w0)
    ref_loss = float(np.mean((pred - y) ** 2))
    ref_g = 2.0 * x.T @ (pred - y) / B
    got = float(jax.device_get(loss))
    assert abs(got - ref_loss) < 1e-4, (got, ref_loss)
    w1_local = np.asarray(jax.device_get(w1))
    np.testing.assert_allclose(w1_local, np.asarray(w0) - 0.1 * ref_g,
                               atol=1e-4)
    print(f"MULTIHOST_OK {got:.6f} proc={host_id}/{n_hosts}", flush=True)


if __name__ == "__main__":
    main()
