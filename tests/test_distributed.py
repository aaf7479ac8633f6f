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


def test_two_process_cross_host_tensor_parallel(tmp_path):
    """VERDICT r3 missing #2: tensor-parallel collectives actually crossing
    a process boundary. A single-process (2,2)-mesh run records the
    bit-exact expectation; then 2 processes x 2 local devices build a mesh
    whose MODEL axis spans the processes (make_cross_host_mesh) and every
    TP psum in the batched windowed decode rides the inter-process link.
    Exact token equality is required — same mesh shape, same program
    (whisper_tpu/tools/dist_check.py)."""
    repo = str(WORKER.parent.parent)
    npz = str(tmp_path / "expected.npz")
    base_env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    base_env.pop("JAX_COORDINATOR_ADDRESS", None)

    ref = subprocess.run(
        [sys.executable, "-m", "whisper_tpu.tools.dist_check",
         "reference", npz],
        env={**base_env,
             "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        cwd=repo, capture_output=True, text=True, timeout=600)
    assert ref.returncode == 0, f"reference failed:\n{ref.stderr[-3000:]}"
    assert "REF_OK" in ref.stdout

    coordinator = f"127.0.0.1:{_free_port()}"
    env = {**base_env,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "whisper_tpu.tools.dist_check",
             "worker", coordinator, "2", str(i), npz],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
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
        pytest.fail("cross-host TP workers timed out")

    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{err[-3000:]}"
        assert "TP_DIST_OK" in out, (
            f"worker {i} missing TP_DIST_OK:\n{out}\n{err[-1500:]}")
