"""Real 2-process jax.distributed test (the multi-host DP path).

Replaces the reference's untestable DDP/NCCL setup with an actual
multi-process run: two coordinated processes x 4 virtual CPU devices each
form one 8-device global mesh; a data-parallel train step's gradient
reduction crosses the process boundary (over the coordination backend —
the DCN analog)."""
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = dict(os.environ)
    # accelerator plugins register at interpreter startup (sitecustomize),
    # before the worker's own env setup runs — strip their triggers here
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "PJRT_")):
            env.pop(k)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-3000:]}"
        assert "MULTIHOST_OK" in out, out
    # both processes computed the same global loss
    losses = {o.split("MULTIHOST_OK ")[1].split()[0]
              for _, o, _ in outs}
    assert len(losses) == 1, losses
