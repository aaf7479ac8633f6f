"""jax.profiler integration — the TPU analogue of the reference's timing
taxonomy + bench scripts (SURVEY.md §5.1: whisper_get_timings per-phase
counters, scripts/bench-all.sh). Phase wall-clocks live in utils/timings;
this module adds hardware-level traces viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Context manager: capture a jax.profiler trace into `log_dir`
    (no-op when log_dir is falsy, so callers can thread a CLI flag
    straight through)."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
