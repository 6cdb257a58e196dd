"""Multi-process (DCN-tier) smoke: 2 jax.distributed processes x 4
virtual CPU devices run one sharded training step over a shared 8-device
mesh (VERDICT round-1 item 10 — `--distributed` must have executed
somewhere before a pod shows up).

Spawned as subprocesses because jax.distributed can only initialize once
per process and the main pytest process already owns a backend.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_step():
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert "DIST_OK" in out, out[-3000:]
    # Both processes computed the SAME global loss.
    losses = sorted(line.split("loss=")[1] for out in outs
                    for line in out.splitlines() if "DIST_OK" in line)
    assert losses[0] == losses[1], losses
