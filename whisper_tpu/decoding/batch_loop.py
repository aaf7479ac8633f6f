"""Multi-utterance on-device window decode — continuous batching.

The TPU-native replacement for whisper_full_parallel's thread-per-chunk
model (reference src/whisper.cpp:7736-7864): U independent utterances
decode their current 30 s windows TOGETHER in one jitted lax.while_loop,
each with its own prompt length, seek position, and completion state.

Each utterance owns K decoder rows (K = beam_size for BEAM, best_of for
SAMPLE, 1 for greedy), folded into one (B = U*K)-row decoder batch on the
MXU. Beam forking stays block-diagonal: row u*K+j may only gather from
rows u*K..u*K+K-1 (the reference's kv_seq_cp within one state,
src/whisper.cpp:7239-7290, vmapped over utterances). The encoder K/V is
kept at batch U — models/whisper.decoder_forward folds each utterance's K
rows into the query axis instead of materializing B copies.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from whisper_tpu.config import CHUNK_SIZE, WhisperHParams
from whisper_tpu.decoding import state_machine
from whisper_tpu.decoding.device_loop import (
    BEAM,
    HASH_MULT,
    NEG_INF,
    SAMPLE,
    beam_select,
)
from whisper_tpu.decoding.filters import FilterConsts, TokenIds, apply_filters, timestamp_stats
from whisper_tpu.models import whisper as model_mod
from whisper_tpu.models.whisper import KVCache


class BatchWindowResult(NamedTuple):
    tokens: jax.Array        # (B, N_MAX) — B = n_utt * rows-per-utterance
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
    no_speech_prob: jax.Array  # (U,) — one per utterance


def rows_per_utt(strategy: int, beam_size: int, best_of: int = 1) -> int:
    """Decoder rows per utterance for a batch attempt (reference
    n_decoders_cur logic, src/whisper.cpp:7024-7044)."""
    if strategy == BEAM:
        return max(1, beam_size)
    if strategy == SAMPLE:
        return max(1, best_of)
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("hp", "tids", "n_utt", "n_per_utt", "strategy",
                     "max_tokens", "single_segment", "no_timestamps", "dtype",
                     "kv_quant", "beam_multinomial"),
)
def decode_windows_batch(
    params,
    hp: WhisperHParams,
    consts: FilterConsts,
    cross_k, cross_v,         # (L, U, H, Ta, Dh) — one encoder copy per utt
    prompts: jax.Array,       # (U, PROMPT_MAX) i32, right-padded per row
    prompt_len: jax.Array,    # (U,) i32
    temperature: jax.Array,   # () f32
    seek: jax.Array,          # (U,) i32
    seek_end: jax.Array,      # (U,) i32
    row_active: jax.Array,    # (U,) bool — False utterances are skipped
    rng_key: jax.Array,
    grammar_reject=None,      # (S, V) bool — token-DFA reject mask rows
    grammar_trans=None,       # (S, V) i32 — token-DFA transition table
    grammar_penalty=None,     # () f32 — logit penalty for rejected tokens
    *,
    tids: TokenIds,
    n_utt: int,
    n_per_utt: int = 1,
    strategy: int,
    max_tokens: int = 0,
    single_segment: bool = False,
    no_timestamps: bool = False,
    dtype=jnp.bfloat16,
    kv_quant: bool = False,
    beam_multinomial: bool = False,
) -> BatchWindowResult:
    V = tids.n_vocab
    U = n_utt
    K = n_per_utt
    B = U * K
    n_max = hp.n_text_ctx // 2 - 4

    def to_rows(x):
        """(U, ...) -> (B, ...) utterance-major repeat."""
        return jnp.repeat(x, K, axis=0, total_repeat_length=B)

    # ---- batched prompt pass: once per UTTERANCE, KV broadcast over its K
    # rows (the reference decodes the prompt on decoder 0 and kv_seq_cp's
    # to the others, :7115-7154). KV created inside the jit — pure scratch,
    # no H2D argument (see device_loop.decode_window)
    kv_u = KVCache.zeros(hp, U, dtype, quant=kv_quant)
    logits_p, kv_u, _ = model_mod.decoder_forward(
        params, hp, prompts, jnp.zeros(U, jnp.int32), kv_u, cross_k, cross_v,
        dtype, logit_rows=prompt_len - 1)
    last_row = logits_p[:, 0]                                       # (U, V)

    no_speech_prob = jax.nn.softmax(
        last_row.astype(jnp.float32), axis=-1)[:, tids.nosp]        # (U,)

    L = kv_u.k.shape[0]

    def _fold(a):
        """(L, U, ...) -> (L, U*K, ...): each utterance's prompt KV copied
        to its K decoder rows."""
        if a is None:
            return None
        return (jnp.broadcast_to(a[:, :, None], (L, U, K) + a.shape[2:])
                  .reshape((L, B) + a.shape[2:]))

    kv = KVCache(*(_fold(a) for a in kv_u))
    logits0 = to_rows(last_row.astype(jnp.float32))                 # (B, V)

    plen_row = to_rows(prompt_len)
    seek_row = to_rows(seek)
    seek_end_row = to_rows(seek_end)

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
        prefix_hash: jax.Array
        gstate: jax.Array     # (B,) i32 — grammar-DFA state (0 if unused)

    st0 = _S(
        i=jnp.int32(0), kv=kv, logits=logits0,
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
        completed=~to_rows(row_active),   # inactive rows never decode
        result_len=jnp.zeros(B, jnp.int32),
        last_token=jnp.zeros(B, jnp.int32),
        prefix_hash=jnp.zeros(B, jnp.uint32),
        gstate=jnp.zeros(B, jnp.int32),
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

        # grammar-DFA penalty: one gathered mask row per decoder row (same
        # tables as device_loop; see decoding/grammar_dfa.py)
        g_rej = grammar_reject[st.gstate] if grammar_reject is not None else None
        lg, logprobs, probs = apply_filters(
            st.logits, consts, tids,
            is_initial=jnp.broadcast_to(i == 0, (B,)),
            last_was_ts=last_was_ts, penult_was_ts=penult_was_ts,
            has_ts=st.has_ts, seek_delta=st.seek_delta, temperature=temperature,
            grammar_reject=g_rej,
            grammar_penalty=(grammar_penalty
                             if grammar_penalty is not None else 100.0))
        pt, ptsum, tid = timestamp_stats(
            probs, tids,
            default_tid=tids.beg if strategy == BEAM else 0)

        if strategy == SAMPLE:
            g = jax.random.gumbel(jax.random.fold_in(rng_key, i), (B, V))
            tok = jnp.argmax(jnp.where(jnp.isinf(logprobs), NEG_INF, logprobs + g),
                             axis=-1).astype(jnp.int32)
        elif strategy == BEAM:
            # block-diagonal fork: beam_select per utterance group, vmapped
            bsel = functools.partial(beam_select, beam_size=K, i=i)
            group_args = (
                logprobs.reshape(U, K, V),
                live.reshape(U, K),
                st.sum_lp.reshape(U, K),
                st.prefix_hash.reshape(U, K),
                st.last_token.reshape(U, K))
            if beam_multinomial:
                # strict-parity candidates (see device_loop.beam_select)
                noise = jax.random.gumbel(
                    jax.random.fold_in(jax.random.fold_in(rng_key, i), 7),
                    (U, K, K, V))
                sel = jax.vmap(lambda lp, lv, slp, ph, lt, cn: bsel(
                    lp, lv, slp, ph, lt, cand_noise=cn))(*group_args, noise)
            else:
                sel = jax.vmap(bsel)(*group_args)
            src_local, tok = sel
            src = (jnp.arange(U)[:, None] * K + src_local).reshape(B)
            tok = tok.reshape(B)
            st = st._replace(
                # KV fork DEFERRED into the next decode step's per-layer
                # scan (decoder_forward fork_src): pay-per-fork traffic
                # AND no cache-sized temp — strictly better than both the
                # r3 eager gather (full cache r/w every step) and the
                # whole-cache cond (+0.4 GB x batch of temps at large-v3)
                tokens=st.tokens[src],
                tok_p=st.tok_p[src], tok_plog=st.tok_plog[src],
                tok_pt=st.tok_pt[src], tok_ptsum=st.tok_ptsum[src],
                tok_tid=st.tok_tid[src],
                sum_lp=st.sum_lp[src],
                seek_delta=st.seek_delta[src], has_ts=st.has_ts[src],
                result_len=st.result_len[src],
                prefix_hash=st.prefix_hash[src] * HASH_MULT + tok.astype(jnp.uint32),
                gstate=st.gstate[src],
            )
            logprobs = logprobs[src]
            probs = probs[src]
            pt, ptsum, tid = pt[src], ptsum[src], tid[src]
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

        # per-decoder state machine with PER-ROW seek bounds (:7297-7378;
        # shared single copy, decoding/state_machine.py)
        upd = state_machine.advance(
            tok, i, live, st.has_ts, st.seek_delta, st.result_len,
            st.failed, st.completed, seek_row, seek_end_row, tids,
            max_tokens=max_tokens, single_segment=single_segment,
            no_timestamps=no_timestamps, n_max=n_max)
        has_ts, seek_delta, result_len = upd.has_ts, upd.seek_delta, upd.result_len
        failed, completed = upd.failed, upd.completed

        # grammar accept: table lookup on the sampled token (reference
        # whisper_grammar_accept_token at :7329; in the beam branch
        # st.gstate is already the forked source state). Gated on live2:
        # the reference `continue`s past the accept when the token trips
        # the timestamp-regress failure (:7320-7329).
        if grammar_trans is not None:
            gstate = jnp.where(upd.live2, grammar_trans[st.gstate, tok],
                               st.gstate)
        else:
            gstate = st.gstate

        next_tok = jnp.where(live, tok, st.last_token)
        pos = plen_row + i                        # (B,) vector positions
        lg_next, kv_next = model_mod.decode_logits_only(
            params, hp, next_tok[:, None], pos, st.kv, cross_k, cross_v, dtype,
            fork_src=src if strategy == BEAM else None)

        return _S(i=i + 1, kv=kv_next, logits=lg_next[:, 0],
                  tokens=tokens, tok_p=tok_p, tok_plog=tok_plog, tok_pt=tok_pt,
                  tok_ptsum=tok_ptsum, tok_tid=tok_tid, sum_lp=sum_lp,
                  seek_delta=seek_delta, has_ts=has_ts, failed=failed,
                  completed=completed, result_len=result_len,
                  last_token=next_tok, prefix_hash=st.prefix_hash,
                  gstate=gstate)

    fin = lax.while_loop(cond, body, st0)
    return BatchWindowResult(
        tokens=fin.tokens, tok_p=fin.tok_p, tok_plog=fin.tok_plog,
        tok_pt=fin.tok_pt, tok_ptsum=fin.tok_ptsum, tok_tid=fin.tok_tid,
        n_tokens=fin.i, result_len=fin.result_len, seek_delta=fin.seek_delta,
        failed=fin.failed, completed=fin.completed, sum_logprobs_all=fin.sum_lp,
        no_speech_prob=no_speech_prob,
    )
