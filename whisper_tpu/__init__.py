"""whisper_tpu — a TPU-native Whisper inference framework.

Built from scratch in JAX/XLA/Pallas with the full capability surface of
arkCyber/whisper-rust (whisper-rs + whisper.cpp). The reference defines
*behavior* (see /root/reference and SURVEY.md); the architecture here is
idiomatic JAX: pure-functional model code, explicit decode state, pjit/mesh
sharding for scale-out, Pallas kernels for the hot ops.

Layering (mirrors SURVEY.md §1, re-designed TPU-first):

  serving/   CLI, HTTP server, streaming          (reference L6 examples)
  api        WhisperContext/WhisperState surface   (reference L5 whisper-rs)
  decoding/  full() orchestrator, beam, filters    (reference L3 whisper.cpp)
  models/    encoder/decoder/VAD as pure JAX fns   (reference L3 graph builders)
  ops/       Pallas kernels: attention, mel, dtw   (reference L1 backends)
  checkpoint ggml .bin reader/writer + quant       (reference L2 ggml/gguf)
  parallel/  mesh + shardings (DP/TP)              (reference: threads + rpc)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compile of each (program, shape)
# is 20-40 s on TPU; subsequent processes reuse it (reference analogue:
# whisper.cpp pre-measures worst-case graphs once per state,
# src/whisper.cpp:3488-3558). Opt out with WHISPER_TPU_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("WHISPER_TPU_NO_COMPILE_CACHE"):
    import jax as _jax

    def _machine_tag() -> str:
        """CPU-feature fingerprint for the default cache path: XLA:CPU AOT
        executables embed target features (avx512 prefer-no-gather etc.),
        and loading an executable cached by a machine with different
        features SIGILLs/segfaults (r4: observed as rc=139 in the test
        suite after a host change). Scoping the directory per feature-set
        makes stale cross-machine entries unreachable."""
        import hashlib
        import platform
        tag = platform.machine()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        tag += hashlib.sha1(line.encode()).hexdigest()[:8]
                        break
        except OSError:
            pass
        return tag

    _cache_dir = _os.environ.get(
        "WHISPER_TPU_COMPILE_CACHE",
        _os.path.expanduser("~/.cache/whisper_tpu_xla-" + _machine_tag()))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

# Version of the reference behavior surface this framework reproduces
# (whisper-rs v0.14.3 over vendored whisper.cpp; /root/reference/Cargo.toml:9-14).
REFERENCE_VERSION = "whisper-rs 0.14.3 / whisper.cpp 1.7"

from whisper_tpu.config import (  # noqa: F401
    WhisperHParams,
    ContextParams,
    FullParams,
    VadParams,
    SamplingStrategy,
    SAMPLE_RATE,
    N_FFT,
    HOP_LENGTH,
    CHUNK_SIZE,
)
from whisper_tpu.tokenizer import WhisperVocab, Tokenizer  # noqa: F401
from whisper_tpu.api import WhisperContext, WhisperState  # noqa: F401
from whisper_tpu.models.vad import VadContext  # noqa: F401
from whisper_tpu.utils.logging import install_logging_hooks, log_set, LogLevel  # noqa: F401
from whisper_tpu.serving.writers import system_info_string as print_system_info  # noqa: F401
from whisper_tpu.utils.device_info import (  # noqa: F401
    device_count,
    device_description,
    device_total_memory,
    devices_info,
)
