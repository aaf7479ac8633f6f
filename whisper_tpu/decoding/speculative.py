"""Speculative greedy decoding — draft-model accelerated window decode.

A TPU-native throughput feature beyond the reference: the greedy decode
step is HBM-bandwidth-bound on the main model's weight reads (~2.1 GB per
token at large-v3 — PERF.md "Decode step"), so verifying k draft-proposed
tokens in ONE chunked decoder forward amortizes that weight traffic over
the accepted run length. A cheap draft model (e.g. distil-large-v3 against
large-v3: same 51866-token vocab, ~4% of the weight bytes) proposes k-1
tokens autoregressively; the main model scores the whole chunk in a single
forward pass (chunk rows ride the MXU together); the longest prefix whose
filtered argmax matches is accepted. With greedy sampling the output is
EXACTLY the main model's own greedy stream (modulo XLA reduction-order ulp
between the T=1 and T=k program shapes — the same caveat as any program-
shape change, see CLAUDE.md), so WER is unchanged by construction.

Everything runs inside one jitted `lax.while_loop` per window, like
decoding/device_loop.py: per round, k draft steps (lax.scan) + one main
k-token verify forward + the exact per-token state machine of the vanilla
loop (reference src/whisper.cpp:7297-7378) replayed positionally over the
accepted tokens. Only the final token buffers cross to the host.

KV-cache correctness under rejection: both models' caches are position-
indexed (models/whisper.py). A rejected suffix leaves stale entries at
positions >= the accepted frontier, but every subsequent round writes its
k-token chunk starting AT the frontier — dynamic_update_slice overwrites
the stale region before any attention reads it, and the causal mask hides
positions beyond the chunk. No cache rollback is ever needed.

Reference parity: the emitted stream, token stats (p/plog/pt/ptsum/tid),
seek_delta/result_len/failed/completed semantics are identical to
device_loop.decode_window (greedy, n_dec=1); tests/test_speculative.py
asserts stream equality under the decisive config.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from whisper_tpu.config import CHUNK_SIZE, WhisperHParams
from whisper_tpu.decoding import state_machine
from whisper_tpu.decoding.device_loop import WindowResult
from whisper_tpu.decoding.filters import (
    FilterConsts,
    TokenIds,
    apply_filters,
    timestamp_stats,
)
from whisper_tpu.models import whisper as model_mod
from whisper_tpu.models.whisper import KVCache


class _Fold(NamedTuple):
    """Sequential per-decoder state replayed positionally over a chunk —
    exactly the vanilla loop's state machine (device_loop.body, reference
    src/whisper.cpp:7297-7378), B=1 scalars."""

    has_ts: jax.Array      # () bool
    seek_delta: jax.Array  # () i32
    result_len: jax.Array  # () i32
    failed: jax.Array      # () bool
    completed: jax.Array   # () bool
    last_tok: jax.Array    # () i32 — token at step s-1 (0 if none)
    penult_tok: jax.Array  # () i32 — token at step s-2 (0 if none)


def _filter_inputs(fold: _Fold, s, tids: TokenIds):
    """Filter-rule inputs for sampling the token at absolute step s, given
    the fold state after step s-1 (device_loop.body's is_initial /
    last_was_ts / penult_was_ts derivations)."""
    is_initial = s == 0
    last_was_ts = (s >= 1) & (fold.last_tok >= tids.beg)
    penult_was_ts = (s < 2) | (fold.penult_tok >= tids.beg)
    return is_initial, last_was_ts, penult_was_ts


def _fold_token(fold: _Fold, tok, s, tids: TokenIds, seek, seek_end,
                *, max_tokens: int, single_segment: bool,
                no_timestamps: bool, n_max: int):
    """Advance the state machine by the token sampled at absolute step s
    (the shared single-copy rule set, decoding/state_machine.py). Returns
    (new_fold, terminal): terminal == this token completed or failed the
    decoder (no further tokens may be emitted after it)."""
    upd = state_machine.advance(
        tok, s, jnp.array(True), fold.has_ts, fold.seek_delta,
        fold.result_len, fold.failed, fold.completed, seek, seek_end, tids,
        max_tokens=max_tokens, single_segment=single_segment,
        no_timestamps=no_timestamps, n_max=n_max)
    new = _Fold(has_ts=upd.has_ts, seek_delta=upd.seek_delta,
                result_len=upd.result_len, failed=upd.failed,
                completed=upd.completed,
                last_tok=tok, penult_tok=fold.last_tok)
    return new, upd.terminal


class _SpecState(NamedTuple):
    i: jax.Array             # () i32 — emitted tokens so far
    rounds: jax.Array        # () i32 — draft/verify rounds executed
    kv: KVCache              # main-model cache
    dkv: KVCache             # draft-model cache
    logits: jax.Array        # (V,) raw main logits predicting step i
    fold: _Fold
    tokens: jax.Array        # (n_buf,) i32
    tok_p: jax.Array
    tok_plog: jax.Array
    tok_pt: jax.Array
    tok_ptsum: jax.Array
    tok_tid: jax.Array
    sum_logprobs: jax.Array  # () f32


@functools.partial(
    jax.jit,
    static_argnames=("hp", "hp_draft", "tids", "k_spec", "max_tokens",
                     "single_segment", "no_timestamps", "dtype", "kv_quant"),
)
def decode_window_speculative(
    params,                  # main model weights
    params_draft,            # draft model weights
    hp: WhisperHParams,
    hp_draft: WhisperHParams,
    consts: FilterConsts,
    cross_k, cross_v,        # main (L, 1, H, Ta, Dh)
    draft_ck, draft_cv,      # draft (Ld, 1, Hd, Ta, Dhd)
    prompt: jax.Array,       # (PROMPT_MAX,) i32, right-padded
    prompt_len: jax.Array,   # () i32
    seek: jax.Array,         # () i32
    seek_end: jax.Array,     # () i32
    *,
    tids: TokenIds,
    k_spec: int = 8,
    max_tokens: int = 0,
    single_segment: bool = False,
    no_timestamps: bool = False,
    dtype=jnp.bfloat16,
    kv_quant: bool = False,
) -> WindowResult:
    V = tids.n_vocab
    k = max(1, k_spec)
    n_max = hp.n_text_ctx // 2 - 4               # reference :7157
    n_buf = n_max + k                            # chunk-write slack

    t0 = jnp.float32(0.0)                        # greedy temperature

    # ---- prompt ingestion, both models (reference :7115-7154) -----------
    kv = KVCache.zeros(hp, 1, dtype, quant=kv_quant)
    logits_p, kv, _ = model_mod.decoder_forward(
        params, hp, prompt[None, :], jnp.int32(0), kv, cross_k, cross_v,
        dtype, logit_rows=prompt_len - 1)
    last_row = logits_p[0, 0].astype(jnp.float32)            # (V,)
    no_speech_prob = jax.nn.softmax(last_row)[tids.nosp]

    dkv = KVCache.zeros(hp_draft, 1, dtype, quant=kv_quant)
    _, dkv, _ = model_mod.decoder_forward(
        params_draft, hp_draft, prompt[None, :], jnp.int32(0), dkv,
        draft_ck, draft_cv, dtype, logit_rows=jnp.int32(0))

    fold0 = _Fold(
        has_ts=jnp.array(False), seek_delta=jnp.int32(100 * CHUNK_SIZE),
        result_len=jnp.int32(0), failed=jnp.array(False),
        completed=jnp.array(False), last_tok=jnp.int32(0),
        penult_tok=jnp.int32(0))

    st0 = _SpecState(
        i=jnp.int32(0), rounds=jnp.int32(0), kv=kv, dkv=dkv,
        logits=last_row, fold=fold0,
        tokens=jnp.zeros(n_buf, jnp.int32),
        tok_p=jnp.zeros(n_buf, jnp.float32),
        tok_plog=jnp.zeros(n_buf, jnp.float32),
        tok_pt=jnp.zeros(n_buf, jnp.float32),
        tok_ptsum=jnp.zeros(n_buf, jnp.float32),
        tok_tid=jnp.zeros(n_buf, jnp.int32),
        sum_logprobs=jnp.float32(0.0),
    )

    fold_kw = dict(max_tokens=max_tokens, single_segment=single_segment,
                   no_timestamps=no_timestamps, n_max=n_max)

    def _filtered(raw_logits_2d, fold: _Fold, s):
        """apply_filters for one row at absolute step s (raw (1, V))."""
        ii, lw, pw = _filter_inputs(fold, s, tids)
        _, logprobs, probs = apply_filters(
            raw_logits_2d, consts, tids,
            is_initial=jnp.broadcast_to(ii, (1,)),
            last_was_ts=jnp.broadcast_to(lw, (1,)),
            penult_was_ts=jnp.broadcast_to(pw, (1,)),
            has_ts=fold.has_ts[None], seek_delta=fold.seek_delta[None],
            temperature=t0)
        return logprobs[0], probs[0]

    def cond(st: _SpecState):
        return (st.i < n_max) & ~(st.fold.completed | st.fold.failed)

    def body(st: _SpecState):
        i = st.i
        p = prompt_len + i                       # cache position of c_0

        # ---- c_0: the main model's own next greedy token ----------------
        lp0, pr0 = _filtered(st.logits[None, :], st.fold, i)
        c0 = jnp.argmax(pr0).astype(jnp.int32)

        # ---- draft phase: k sequential draft steps over c_0..c_{k-1} ----
        # step j feeds c_j at position p+j; its logits propose c_{j+1}.
        # The fold state is advanced by c_j first, so the proposal uses the
        # exact filter inputs the vanilla loop would use at step i+j+1.
        def draft_step(carry, j):
            dkv_c, tok_c, fold_c = carry
            fold_n, term = _fold_token(
                fold_c, tok_c, i + j, tids, seek, seek_end, **fold_kw)
            dlog, dkv_n = model_mod.decode_logits_only(
                params_draft, hp_draft, tok_c[None, None], p + j, dkv_c,
                draft_ck, draft_cv, dtype)
            _, dprobs = _filtered(dlog[:, 0].astype(jnp.float32), fold_n,
                                  i + j + 1)
            nxt = jnp.argmax(dprobs).astype(jnp.int32)
            return (dkv_n, nxt, fold_n), (tok_c, fold_n, term)

        (dkv_new, _, _), (chunk, folds, terms) = lax.scan(
            draft_step, (st.dkv, c0, st.fold), jnp.arange(k))
        # chunk: (k,) tokens c_0..c_{k-1}; folds/terms: state after each

        # ---- verify phase: ONE main forward over the whole chunk --------
        rows, kv_new, _ = model_mod.decoder_forward(
            params, hp, chunk[None, :], p, st.kv, cross_k, cross_v, dtype)
        rows = rows[0].astype(jnp.float32)                   # (k, V)

        # filtered distributions for rows 0..k-2 (predicting c_1..c_{k-1});
        # row j's filter state is the fold after c_j
        ii = i + 1 + jnp.arange(k - 1) if k > 1 else jnp.zeros(0, jnp.int32)
        if k > 1:
            lastw = folds.last_tok[: k - 1] >= tids.beg
            penw = (ii < 2) | (folds.penult_tok[: k - 1] >= tids.beg)
            _, v_logprobs, v_probs = apply_filters(
                rows[: k - 1], consts, tids,
                is_initial=jnp.zeros(k - 1, bool),
                last_was_ts=lastw, penult_was_ts=penw,
                has_ts=folds.has_ts[: k - 1],
                seek_delta=folds.seek_delta[: k - 1],
                temperature=t0)
            a_hat = jnp.argmax(v_probs, axis=-1).astype(jnp.int32)  # (k-1,)
            match = chunk[1:] == a_hat
            m = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))       # leading run
            logprobs_all = jnp.concatenate([lp0[None], v_logprobs])  # (k, V)
            probs_all = jnp.concatenate([pr0[None], v_probs])
        else:
            m = jnp.int32(0)
            logprobs_all = lp0[None]
            probs_all = pr0[None]

        # ---- emitted count: accepted prefix, cut at terminal / n_max ----
        M = m + 1
        idx = jnp.arange(k)
        term_pos = jnp.where(jnp.any(terms), jnp.argmax(terms), k)
        M = jnp.minimum(M, term_pos + 1)
        M = jnp.minimum(M, n_max - i)

        # ---- per-token stats over the chunk -----------------------------
        p_tok = jnp.take_along_axis(probs_all, chunk[:, None], axis=-1)[:, 0]
        plog_tok = jnp.take_along_axis(logprobs_all, chunk[:, None], axis=-1)[:, 0]
        pt, ptsum, tid = timestamp_stats(probs_all, tids)
        is_ts = chunk >= tids.beg
        tid = jnp.where(is_ts, chunk, tid).astype(jnp.int32)
        pt = jnp.where(is_ts, p_tok, pt)

        emit = idx < M
        def wr(buf, vals):
            old = lax.dynamic_slice(buf, (i,), (k,))
            return lax.dynamic_update_slice(buf, jnp.where(emit, vals, old), (i,))

        new_fold = jax.tree_util.tree_map(lambda a: a[M - 1], folds)

        return _SpecState(
            i=i + M, rounds=st.rounds + 1, kv=kv_new, dkv=dkv_new,
            logits=rows[M - 1], fold=new_fold,
            tokens=wr(st.tokens, chunk),
            tok_p=wr(st.tok_p, p_tok),
            tok_plog=wr(st.tok_plog, plog_tok),
            tok_pt=wr(st.tok_pt, pt),
            tok_ptsum=wr(st.tok_ptsum, ptsum),
            tok_tid=wr(st.tok_tid, tid),
            sum_logprobs=st.sum_logprobs + jnp.sum(jnp.where(emit, plog_tok, 0.0)),
        )

    fin = lax.while_loop(cond, body, st0)

    return WindowResult(
        tokens=fin.tokens[None, :n_max], tok_p=fin.tok_p[None, :n_max],
        tok_plog=fin.tok_plog[None, :n_max], tok_pt=fin.tok_pt[None, :n_max],
        tok_ptsum=fin.tok_ptsum[None, :n_max], tok_tid=fin.tok_tid[None, :n_max],
        n_tokens=fin.i, result_len=fin.fold.result_len[None],
        seek_delta=fin.fold.seek_delta[None], failed=fin.fold.failed[None],
        completed=fin.fold.completed[None],
        sum_logprobs_all=fin.sum_logprobs[None],
        no_speech_prob=no_speech_prob,
        n_rounds=fin.rounds,
    )
