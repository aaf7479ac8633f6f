"""Multi-host (multi-process) decode test over localhost jax.distributed.

VERDICT r1 item 7 / SURVEY §4 implication (e): spawn 2 processes with
jax.distributed.initialize (CPU device fakes, 2 virtual devices each),
shard a 4-utterance batch over the global ('data',) mesh, and assert each
host's rows equal the single-process result (tests/_distributed_worker.py).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

WORKER = Path(__file__).with_name("_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_decode():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for pr in procs:
            out, err = pr.communicate(timeout=600)
            outs.append((pr.returncode, out, err))
    except subprocess.TimeoutExpired:
        for pr in procs:
            pr.kill()
        pytest.fail("distributed workers timed out")

    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{err[-3000:]}"
        assert "DIST_OK" in out, f"worker {i} missing DIST_OK:\n{out}\n{err[-1500:]}"
