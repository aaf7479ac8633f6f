"""The per-token decoder state machine, shared by every jitted decode loop.

Reference whisper_full_with_state's per-decoder update rules
(src/whisper.cpp:7297-7378): timestamp-token seek_delta tracking,
timestamp-regression failure, EOT / max_tokens / end-of-audio completion,
the result_len==0 end-of-segment rule (:7341-7351), and the final-step
repetition bail-out (:7364-7377).

One implementation, shape-polymorphic: every input may be a scalar (the
speculative fold, decoding/speculative.py) or a (B,) vector (the
single-utterance loop in decoding/device_loop.py; the multi-utterance
batch loop in decoding/batch_loop.py with per-row seek bounds) — jnp
broadcasting covers both. Keeping these three callers on one copy removes
the rule-drift risk flagged by the r3 code review.

decoding/host_loop.py deliberately does NOT use this helper: it is the
independently-written readable twin that the device==host parity tests
compare against — sharing code would make those tests tautological.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisper_tpu.config import CHUNK_SIZE

DELTA_MIN = 10  # 100 ms guard (reference :6847)


class StepUpdate(NamedTuple):
    has_ts: jax.Array
    seek_delta: jax.Array
    result_len: jax.Array
    failed: jax.Array
    completed: jax.Array
    live2: jax.Array      # live and not newly regress-failed this step
    eos: jax.Array        # completed by this token
    terminal: jax.Array   # this token ended the decoder (eos or any failure)


def advance(
    tok,            # sampled token id(s)
    s,              # 0-based step index of this token
    live,           # decoder was live before this token
    has_ts, seek_delta, result_len, failed, completed,
    seek, seek_end,  # window bounds (scalar or per-row)
    tids,           # filters.TokenIds
    *,
    max_tokens: int,
    single_segment: bool,
    no_timestamps: bool,
    n_max: int,
) -> StepUpdate:
    """Advance the state machine by one sampled token (rules cited above)."""
    is_ts_tok = live & (tok > tids.beg)            # strictly > (:7317)
    sd_new = 2 * (tok - tids.beg)
    regress = is_ts_tok & has_ts & (seek_delta > sd_new) & (result_len < s)
    failed = failed | regress
    ok_ts = is_ts_tok & ~regress
    seek_delta = jnp.where(ok_ts, sd_new, seek_delta)
    result_len = jnp.where(ok_ts, s + 1, result_len)
    has_ts = has_ts | ok_ts

    live2 = live & ~regress

    end_of_audio = has_ts & (seek + seek_delta + DELTA_MIN >= seek_end)
    hit_max = (max_tokens > 0) & (s >= max_tokens)
    eos = live2 & ((tok == tids.eot) | hit_max | end_of_audio)

    # result_len == 0 at end-of-segment (:7341-7351)
    rl0 = eos & (result_len == 0) & (not no_timestamps)
    rl0_ok = rl0 & (seek + seek_delta + DELTA_MIN >= seek_end)
    rl0_fail = rl0 & ~rl0_ok
    result_len = jnp.where(rl0_ok, s + 1, result_len)
    failed = failed | rl0_fail
    eos = eos & ~rl0_fail

    if single_segment or no_timestamps:
        result_len = jnp.where(eos, s + 1, result_len)
        seek_delta = jnp.where(eos, 100 * CHUNK_SIZE, seek_delta)
    completed = completed | eos

    # repetition bail-out on the final step (:7364-7377)
    rep = (s == n_max - 1) & live2 & ~eos & (
        (result_len == 0) | (seek_delta < 100 * CHUNK_SIZE // 2))
    failed = failed | rep

    return StepUpdate(
        has_ts=has_ts, seek_delta=seek_delta, result_len=result_len,
        failed=failed, completed=completed, live2=live2, eos=eos,
        terminal=eos | regress | rl0_fail | rep)
