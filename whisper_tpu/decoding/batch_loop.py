"""Multi-utterance on-device window decode — continuous batching.

The TPU-native replacement for whisper_full_parallel's thread-per-chunk
model (reference src/whisper.cpp:7736-7864): B independent utterances
decode their current 30 s windows TOGETHER in one jitted lax.while_loop,
each with its own prompt length, seek position, and completion state. The
decoder runs with batch B on the MXU; per-row prompt offsets use the
vector-pos0 path in models/whisper.decoder_forward.

Greedy / multinomial only: a beam would fork rows within an utterance
group (device_loop.py handles single-utterance beams).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from whisper_tpu.config import CHUNK_SIZE, WhisperHParams
from whisper_tpu.decoding.device_loop import DELTA_MIN, SAMPLE, NEG_INF
from whisper_tpu.decoding.filters import FilterConsts, TokenIds, apply_filters, timestamp_stats
from whisper_tpu.models import whisper as model_mod
from whisper_tpu.models.whisper import KVCache


class BatchWindowResult(NamedTuple):
    tokens: jax.Array        # (B, N_MAX)
    tok_p: jax.Array
    tok_plog: jax.Array
    tok_pt: jax.Array
    tok_ptsum: jax.Array
    tok_tid: jax.Array
    n_tokens: jax.Array      # () — steps executed
    result_len: jax.Array    # (B,)
    seek_delta: jax.Array    # (B,)
    failed: jax.Array
    completed: jax.Array
    sum_logprobs_all: jax.Array
    no_speech_prob: jax.Array  # (B,)


@functools.partial(
    jax.jit,
    static_argnames=("hp", "tids", "n_rows", "strategy", "max_tokens",
                     "single_segment", "no_timestamps", "dtype"),
)
def decode_windows_batch(
    params,
    hp: WhisperHParams,
    consts: FilterConsts,
    cross_k, cross_v,         # (L, B, H, Ta, Dh)
    prompts: jax.Array,       # (B, PROMPT_MAX) i32, right-padded per row
    prompt_len: jax.Array,    # (B,) i32
    kv: KVCache,              # (L, B, H, Tmax, Dh)
    temperature: jax.Array,   # () f32
    seek: jax.Array,          # (B,) i32
    seek_end: jax.Array,      # (B,) i32
    row_active: jax.Array,    # (B,) bool — False rows are skipped entirely
    rng_key: jax.Array,
    *,
    tids: TokenIds,
    n_rows: int,
    strategy: int,
    max_tokens: int = 0,
    single_segment: bool = False,
    no_timestamps: bool = False,
    dtype=jnp.bfloat16,
) -> BatchWindowResult:
    V = tids.n_vocab
    B = n_rows
    n_max = hp.n_text_ctx // 2 - 4

    # ---- batched prompt pass (per-row lengths via vector pos0=0) ----------
    logits_p, kv, _ = model_mod.decoder_forward(
        params, hp, prompts, jnp.zeros(B, jnp.int32), kv, cross_k, cross_v, dtype,
        logit_rows=prompt_len - 1)
    last_row = logits_p[:, 0]                                       # (B, V)

    no_speech_prob = jax.nn.softmax(last_row.astype(jnp.float32), axis=-1)[:, tids.nosp]

    class _S(NamedTuple):
        i: jax.Array
        kv: KVCache
        logits: jax.Array
        tokens: jax.Array
        tok_p: jax.Array
        tok_plog: jax.Array
        tok_pt: jax.Array
        tok_ptsum: jax.Array
        tok_tid: jax.Array
        sum_lp: jax.Array
        seek_delta: jax.Array
        has_ts: jax.Array
        failed: jax.Array
        completed: jax.Array
        result_len: jax.Array
        last_token: jax.Array

    st0 = _S(
        i=jnp.int32(0), kv=kv, logits=last_row.astype(jnp.float32),
        tokens=jnp.zeros((B, n_max), jnp.int32),
        tok_p=jnp.zeros((B, n_max), jnp.float32),
        tok_plog=jnp.zeros((B, n_max), jnp.float32),
        tok_pt=jnp.zeros((B, n_max), jnp.float32),
        tok_ptsum=jnp.zeros((B, n_max), jnp.float32),
        tok_tid=jnp.zeros((B, n_max), jnp.int32),
        sum_lp=jnp.zeros(B, jnp.float32),
        seek_delta=jnp.full(B, 100 * CHUNK_SIZE, jnp.int32),
        has_ts=jnp.zeros(B, bool),
        failed=jnp.zeros(B, bool),
        completed=~row_active,          # inactive rows never decode
        result_len=jnp.zeros(B, jnp.int32),
        last_token=jnp.zeros(B, jnp.int32),
    )

    def cond(st):
        return (st.i < n_max) & ~jnp.all(st.completed | st.failed)

    def body(st):
        i = st.i
        live = ~(st.completed | st.failed)

        last_was_ts = jnp.where(i > 0,
                                st.tokens[:, jnp.maximum(i - 1, 0)] >= tids.beg, False)
        penult_was_ts = jnp.where(i >= 2,
                                  st.tokens[:, jnp.maximum(i - 2, 0)] >= tids.beg, True)

        lg, logprobs, probs = apply_filters(
            st.logits, consts, tids,
            is_initial=jnp.broadcast_to(i == 0, (B,)),
            last_was_ts=last_was_ts, penult_was_ts=penult_was_ts,
            has_ts=st.has_ts, seek_delta=st.seek_delta, temperature=temperature)
        pt, ptsum, tid = timestamp_stats(probs, tids)

        if strategy == SAMPLE:
            g = jax.random.gumbel(jax.random.fold_in(rng_key, i), (B, V))
            tok = jnp.argmax(jnp.where(jnp.isinf(logprobs), NEG_INF, logprobs + g),
                             axis=-1).astype(jnp.int32)
        else:
            tok = jnp.argmax(probs, axis=-1).astype(jnp.int32)

        p_tok = jnp.take_along_axis(probs, tok[:, None], axis=-1)[:, 0]
        plog_tok = jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]
        is_ts = tok >= tids.beg
        tid = jnp.where(is_ts, tok, tid).astype(jnp.int32)
        pt = jnp.where(is_ts, p_tok, pt)

        tokens = st.tokens.at[:, i].set(jnp.where(live, tok, st.tokens[:, i]))
        tok_p = st.tok_p.at[:, i].set(jnp.where(live, p_tok, st.tok_p[:, i]))
        tok_plog = st.tok_plog.at[:, i].set(jnp.where(live, plog_tok, st.tok_plog[:, i]))
        tok_pt = st.tok_pt.at[:, i].set(jnp.where(live, pt, st.tok_pt[:, i]))
        tok_ptsum = st.tok_ptsum.at[:, i].set(jnp.where(live, ptsum, st.tok_ptsum[:, i]))
        tok_tid = st.tok_tid.at[:, i].set(jnp.where(live, tid, st.tok_tid[:, i]))
        sum_lp = jnp.where(live, st.sum_lp + plog_tok, st.sum_lp)

        # per-decoder state machine with PER-ROW seek bounds (:7297-7378)
        has_ts, failed, completed = st.has_ts, st.failed, st.completed
        seek_delta, result_len = st.seek_delta, st.result_len

        is_ts_tok = live & (tok > tids.beg)
        sd_new = 2 * (tok - tids.beg)
        regress = is_ts_tok & has_ts & (seek_delta > sd_new) & (result_len < i)
        failed = failed | regress
        ok_ts = is_ts_tok & ~regress
        seek_delta = jnp.where(ok_ts, sd_new, seek_delta)
        result_len = jnp.where(ok_ts, i + 1, result_len)
        has_ts = has_ts | ok_ts

        live2 = live & ~regress
        end_of_audio = has_ts & (seek + seek_delta + DELTA_MIN >= seek_end)
        hit_max = (max_tokens > 0) & (i >= max_tokens)
        eos = live2 & ((tok == tids.eot) | hit_max | end_of_audio)

        rl0 = eos & (result_len == 0) & (not no_timestamps)
        rl0_ok = rl0 & (seek + seek_delta + DELTA_MIN >= seek_end)
        result_len = jnp.where(rl0_ok, i + 1, result_len)
        failed = failed | (rl0 & ~rl0_ok)
        eos = eos & ~(rl0 & ~rl0_ok)

        if single_segment or no_timestamps:
            result_len = jnp.where(eos, i + 1, result_len)
            seek_delta = jnp.where(eos, 100 * CHUNK_SIZE, seek_delta)
        completed = completed | eos

        rep = (i == n_max - 1) & live2 & ~eos & (
            (result_len == 0) | (seek_delta < 100 * CHUNK_SIZE // 2))
        failed = failed | rep

        next_tok = jnp.where(live, tok, st.last_token)
        pos = prompt_len + i                      # (B,) vector positions
        lg_next, kv_next = model_mod.decode_logits_only(
            params, hp, next_tok[:, None], pos, st.kv, cross_k, cross_v, dtype)

        return _S(i=i + 1, kv=kv_next, logits=lg_next[:, 0],
                  tokens=tokens, tok_p=tok_p, tok_plog=tok_plog, tok_pt=tok_pt,
                  tok_ptsum=tok_ptsum, tok_tid=tok_tid, sum_lp=sum_lp,
                  seek_delta=seek_delta, has_ts=has_ts, failed=failed,
                  completed=completed, result_len=result_len,
                  last_token=next_tok)

    fin = lax.while_loop(cond, body, st0)
    return BatchWindowResult(
        tokens=fin.tokens, tok_p=fin.tok_p, tok_plog=fin.tok_plog,
        tok_pt=fin.tok_pt, tok_ptsum=fin.tok_ptsum, tok_tid=fin.tok_tid,
        n_tokens=fin.i, result_len=fin.result_len, seek_delta=fin.seek_delta,
        failed=fin.failed, completed=fin.completed, sum_logprobs_all=fin.sum_lp,
        no_speech_prob=no_speech_prob,
    )
