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


def _run_dist_topology(tmp_path, topology, n_procs, devs_per_proc, refmode):
    """Spawn a single-process reference and n_procs workers of one
    dist_check topology; assert every worker checked its shards."""
    repo = str(WORKER.parent.parent)
    npz = str(tmp_path / f"expected_{topology}.npz")
    base_env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    base_env.pop("JAX_COORDINATOR_ADDRESS", None)

    ref = subprocess.run(
        [sys.executable, "-m", "whisper_tpu.tools.dist_check", refmode, npz],
        env={**base_env,
             "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        cwd=repo, capture_output=True, text=True, timeout=600)
    assert ref.returncode == 0, f"{refmode} failed:\n{ref.stderr[-3000:]}"
    assert "REF_OK" in ref.stdout

    coordinator = f"127.0.0.1:{_free_port()}"
    env = {**base_env,
           "XLA_FLAGS":
           f"--xla_force_host_platform_device_count={devs_per_proc}"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "whisper_tpu.tools.dist_check",
             "worker", coordinator, str(n_procs), str(i), npz, topology],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(n_procs)
    ]
    outs = []
    try:
        for pr in procs:
            out, err = pr.communicate(timeout=600)
            outs.append((pr.returncode, out, err))
    except subprocess.TimeoutExpired:
        for pr in procs:
            pr.kill()
        pytest.fail(f"{topology} workers timed out")
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"{topology} worker {i} failed:\n{err[-3000:]}"
        assert f"TP_DIST_OK topology={topology}" in out, (
            f"worker {i}:\n{out}\n{err[-1500:]}")


def test_production_topology_tp_intra_dp_across(tmp_path):
    """VERDICT r4 item 5: the layout production would use — TP pairs
    INTRA-process (ICI), the data axis crossing processes (DCN) — runs
    live and matches the single-process (2,2) run bit-for-bit (same mesh
    shape -> same partitioning -> same reduction order)."""
    _run_dist_topology(tmp_path, "dp", n_procs=2, devs_per_proc=2,
                       refmode="reference")


def test_tp4_cross_process(tmp_path):
    """VERDICT r4 item 6: TP=4 with the model axis spanning FOUR
    processes. TP=4 reduction order is not shape-pinned across backends,
    so equality rides the decisive config (argmax gap >> ulps) rather
    than the TP=2 single-add argument — exact token equality against the
    single-process (1,4)-mesh run."""
    _run_dist_topology(tmp_path, "tp4", n_procs=4, devs_per_proc=1,
                       refmode="reference4")
