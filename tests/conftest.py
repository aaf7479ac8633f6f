"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/multi-chip tests work without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py uses the real chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if the env pins a TPU platform
# tests never benefit from the persistent XLA cache (CPU compiles are
# seconds) and stale cross-machine entries can SIGSEGV on load (r4) —
# keep the suite hermetic
os.environ.setdefault("WHISPER_TPU_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize hook re-writes jax_platforms at import time; force
# CPU again post-import so tests never touch the (single) real TPU.
jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402
import sys  # noqa: E402

# cwd-independent: helpers like test_ggml_io._make_test_tensors import by
# module name from this directory; pytest usually adds it, but running from
# outside the repo root should work too
sys.path.insert(0, str(pathlib.Path(__file__).parent))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_executable_memory():
    """Drop compiled XLA executables after each test module. A full-suite
    process accumulates hundreds of CPU executables; under memory/CPU
    pressure the XLA:CPU compiler has been observed to segfault late in
    such runs (r4, rc=139 twice in contended full-suite runs; every
    per-module run of the same tests passes). Bounding live executables
    to one module's worth removes the pressure; recompiles are seconds
    on these micro models."""
    yield
    import jax

    jax.clear_caches()

# (the donated-buffer warning filter lives in pyproject.toml
# [tool.pytest.ini_options].filterwarnings — a module-level
# warnings.filterwarnings here is undone by pytest's per-test contexts)


@pytest.fixture(scope="session")
def tiny_ctx():
    """A micro random-weight context shared across tests (f32 on CPU for
    numerical checks)."""
    from whisper_tpu.api import WhisperContext
    from whisper_tpu.checkpoint.init import tiny_test_hparams
    from whisper_tpu.config import ContextParams

    return WhisperContext.random(
        params=ContextParams(dtype="float32"), hp=tiny_test_hparams(), seed=0)


@pytest.fixture()
def jfk_like_audio():
    """Deterministic 11 s speech-like test signal (no real audio ships in
    this repo): sum of AM-modulated harmonics + noise bursts."""
    rng = np.random.default_rng(42)
    sr = 16000
    t = np.arange(11 * sr) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    sig = np.zeros_like(t, dtype=np.float64)
    for h in range(1, 6):
        sig += np.sin(2 * np.pi * f0 * h * t) / h
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.3 * t)) * (t % 3.0 < 2.0)
    sig = sig * env + 0.01 * rng.standard_normal(t.shape)
    return (0.3 * sig / np.abs(sig).max()).astype(np.float32)
