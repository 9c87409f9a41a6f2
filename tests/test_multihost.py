"""Multi-host DP: two REAL processes (jax.distributed over Gloo CPU
collectives), 2 local devices each, one global 4-device mesh. Upgrades
``parallel/multihost.py`` from helper-only to exercised: cross-process
gradient all-reduce verified against the locally-computed global mean.

(The reference's analog is Lightning spawning DDP ranks over NCCL,
reference ``train.py:270-274`` — never exercised there either; this test
is new capability evidence, not parity.)
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step(tmp_path):
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker pins its own device count
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-3000:]
        assert f"MULTIHOST_FSDP_OK pid={pid}" in out, out[-3000:]
        assert f"MULTIHOST_CP_OK pid={pid}" in out, out[-3000:]
        assert f"MULTIHOST_CLI_OK pid={pid}" in out, out[-3000:]
        assert f"MULTIHOST_FSDP_CLI_OK pid={pid}" in out, out[-3000:]
        assert f"MULTIHOST_SPC_CLI_OK pid={pid}" in out, out[-3000:]
        assert "resumed from step 3" in out, out[-3000:]
