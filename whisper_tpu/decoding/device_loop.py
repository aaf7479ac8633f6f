"""On-device decode loop for one 30 s window at one temperature.

TPU-native replacement for the reference's host token loop
(whisper_full_with_state inner loop, src/whisper.cpp:7115-7477). The
reference crosses the device boundary twice per token (logits D2H, next
token H2D, :2910-2971); here the ENTIRE window decode — prompt ingestion,
logit filtering, sampling (greedy / multinomial / beam-search with KV
reorder), per-decoder state machine — runs inside ONE jitted function built
around `lax.while_loop`. Only the final token buffers cross back to the
host, once per (window × temperature).

Matching reference semantics:
- sampling: whisper_sample_token (:6432-6493); beam CANDIDATES are
  deterministic top-k by default (an intentional improvement over
  whisper_sample_token_topk's k multinomial draws, :6549-6558) —
  `FullParams.beam_search.multinomial_candidates` restores the
  reference's sampled-candidate law exactly (see beam_select)
- beam candidate sort + dedup + KV fork: (:7239-7290), with the KV
  seq-copy replaced by a batch-axis gather (models/whisper.py KVCache)
- per-decoder update rules (timestamp/seek_delta/completed/failed):
  (:7297-7378)
- no_speech_prob from the prompt-pass NOSP logit (:7124-7134)

The beam candidate cursor (sort + adjacent-dup skip + wrap-on-exhaustion)
mirrors the reference machine exactly, including the :7260-7262 wrap —
see beam_select.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from whisper_tpu.config import CHUNK_SIZE, WhisperHParams
from whisper_tpu.decoding import state_machine
from whisper_tpu.decoding.filters import FilterConsts, TokenIds, apply_filters, timestamp_stats
from whisper_tpu.models import whisper as model_mod
from whisper_tpu.models.whisper import KVCache

NEG_INF = float("-inf")
DELTA_MIN = state_machine.DELTA_MIN   # single copy: state_machine.py
# numpy (not jnp): a module-level jnp constant would initialize the XLA
# backend at import, breaking jax.distributed.initialize in multi-host runs
import numpy as _np
HASH_MULT = _np.uint32(1000003)

# sampling strategies (static)
GREEDY_BEST = 0   # t == 0, argmax
SAMPLE = 1        # t > 0, multinomial over filtered probs
BEAM = 2          # beam search (t == 0 under BEAM_SEARCH strategy)


def beam_select(logprobs, live, sum_logprobs, prefix_hash, last_token, i,
                beam_size: int, cand_noise=None):
    """Beam candidate sort + slot assignment for ONE beam group, exactly
    mirroring the reference cursor machine (src/whisper.cpp:7239-7290):

    - top-k candidates per LIVE decoder, one global sort by cumulative
      logprob desc with ties to the lower decoder index (:7240-7248) —
      dead decoders contribute no candidates;
    - a single cursor walks the sorted list; each live slot takes the
      candidate at the cursor, then the cursor skips past immediately
      following candidates whose full token sequence equals the one just
      taken (the `while ... tokens_equal ... && i > 0` at :7265-7267;
      equal sequences have equal scores, so they are always adjacent);
    - when the cursor runs off the end it WRAPS to 0 and reuses
      candidates (:7260-7262) — reachable only with degenerate
      distributions (> n_cand duplicates).

    Sequence equality is a rolling 32-bit hash of the token vector
    (prefix_hash * HASH_MULT + tok), collision odds ~2^-32 per step.

    Shapes are per-group: logprobs (K, V), the rest (K,). Returns
    (src, tok): source slot to fork from and sampled token per slot —
    local indices, so the multi-utterance loop can vmap this over
    utterance groups and offset src afterwards.
    """
    B = logprobs.shape[0]
    k = beam_size
    nc_max = B * k
    if cand_noise is None:
        top_lp, top_id = lax.top_k(logprobs, k)             # (B, k)
    else:
        # strict-parity candidates (FullParams.beam_search
        # .multinomial_candidates): the reference draws its beam_size
        # candidates from std::discrete_distribution(probs) — its
        # partial_sort output is unused (whisper_sample_token_topk,
        # src/whisper.cpp:6548-6558). k independent Gumbel-max draws over
        # the same filtered distribution reproduce that law; duplicate
        # draws become adjacent equal candidates, which the cursor machine
        # below skips exactly like the reference's tokens_equal walk.
        pert = (jnp.where(jnp.isinf(logprobs), NEG_INF, logprobs)[:, None, :]
                + cand_noise)                               # (B, k, V)
        top_id = jnp.argmax(pert, axis=-1).astype(jnp.int32)
        top_lp = jnp.take_along_axis(logprobs, top_id, axis=1)
    cand_score = (sum_logprobs[:, None] + top_lp).reshape(-1)
    cand_dead = jnp.repeat(~live, k)
    cand_tok = top_id.reshape(-1).astype(jnp.int32)
    cand_src = jnp.repeat(jnp.arange(B), k)
    cand_hash = prefix_hash[cand_src] * HASH_MULT + cand_tok.astype(jnp.uint32)

    # primary: live first; secondary: score desc; stable -> lower decoder
    # index on ties (the reference comparator, :7243-7248)
    order = jnp.lexsort((-cand_score, cand_dead))
    n_cand = jnp.sum((~cand_dead).astype(jnp.int32))

    def slot(j, carry):
        c, s_src, s_tok = carry
        c0 = jnp.where(c >= n_cand, 0, c)                   # wrap (:7260)
        idx = order[c0]
        h = cand_hash[idx]

        def skip_cond(cc):
            nxt = order[jnp.minimum(cc, nc_max - 1)]
            return (cc < n_cand) & (cand_hash[nxt] == h) & (i > 0)

        cc = lax.while_loop(skip_cond, lambda cc: cc + 1, c0 + 1)
        ok = live[j]
        s_src = s_src.at[j].set(jnp.where(ok, cand_src[idx], s_src[j]))
        s_tok = s_tok.at[j].set(jnp.where(ok, cand_tok[idx], s_tok[j]))
        return (jnp.where(ok, cc, c), s_src, s_tok)

    _, src, tok = lax.fori_loop(
        0, B, slot, (jnp.int32(0), jnp.arange(B), last_token))
    return src, tok


class WindowResult(NamedTuple):
    tokens: jax.Array        # (B, N_MAX) i32
    tok_p: jax.Array         # (B, N_MAX) f32
    tok_plog: jax.Array      # (B, N_MAX) f32
    tok_pt: jax.Array        # (B, N_MAX) f32
    tok_ptsum: jax.Array     # (B, N_MAX) f32
    tok_tid: jax.Array       # (B, N_MAX) i32
    n_tokens: jax.Array      # () i32 — loop steps executed
    result_len: jax.Array    # (B,) i32
    seek_delta: jax.Array    # (B,) i32
    failed: jax.Array        # (B,) bool
    completed: jax.Array     # (B,) bool
    sum_logprobs_all: jax.Array  # (B,) f32
    no_speech_prob: jax.Array    # () f32
    # speculative decoding only: verify rounds executed (0 = vanilla loop);
    # acceptance rate = n_tokens / n_rounds (decoding/speculative.py)
    n_rounds: jax.Array = _np.int32(0)


class _LoopState(NamedTuple):
    i: jax.Array
    kv: KVCache
    logits: jax.Array        # (B, V) raw logits for next sample
    tokens: jax.Array
    tok_p: jax.Array
    tok_plog: jax.Array
    tok_pt: jax.Array
    tok_ptsum: jax.Array
    tok_tid: jax.Array
    sum_logprobs_all: jax.Array
    seek_delta: jax.Array
    has_ts: jax.Array
    failed: jax.Array
    completed: jax.Array
    result_len: jax.Array
    last_token: jax.Array    # (B,) i32
    prefix_hash: jax.Array   # (B,) u32
    gstate: jax.Array        # (B,) i32 — grammar-DFA state (0 if unused)


@functools.partial(
    jax.jit,
    static_argnames=("hp", "tids", "n_dec", "strategy", "beam_size", "max_tokens",
                     "single_segment", "no_timestamps", "dtype", "kv_quant",
                     "beam_multinomial"),
)
def decode_window(
    params,
    hp: WhisperHParams,
    consts: FilterConsts,
    cross_k, cross_v,        # (L, 1, H, Ta, Dh) — broadcast over decoders here
    prompt: jax.Array,       # (PROMPT_MAX,) i32, right-padded
    prompt_len: jax.Array,   # () i32
    temperature: jax.Array,  # () f32
    seek: jax.Array,         # () i32
    seek_end: jax.Array,     # () i32
    rng_key: jax.Array,
    grammar_reject=None,     # (S, V) bool — token-DFA reject mask rows
    grammar_trans=None,      # (S, V) i32 — token-DFA transition table
    grammar_penalty=None,    # () f32 — logit penalty for rejected tokens
    *,
    tids: TokenIds,
    n_dec: int,
    strategy: int,
    beam_size: int = 5,
    max_tokens: int = 0,
    single_segment: bool = False,
    no_timestamps: bool = False,
    dtype=jnp.bfloat16,
    kv_quant: bool = False,
    beam_multinomial: bool = False,
) -> WindowResult:
    V = tids.n_vocab
    B = n_dec
    n_max = hp.n_text_ctx // 2 - 4           # reference :7157

    # ---- prompt pass (batch 1, then broadcast KV over decoders ----------
    # mirrors the reference decoding the prompt once on decoder 0 and
    # kv_seq_cp'ing to the others (:7115-7154). The KV cache is created
    # INSIDE the jit: it's pure scratch for this window, so as a temp
    # buffer XLA places it without an H2D argument transfer or donation
    # (large-v3 beam-5: ~0.4 GB that never leaves the chip)
    kv1 = KVCache.zeros(hp, 1, dtype, quant=kv_quant)
    logits_p, kv1, _ = model_mod.decoder_forward(
        params, hp, prompt[None, :], jnp.int32(0), kv1, cross_k, cross_v, dtype,
        logit_rows=prompt_len - 1)
    last_row = logits_p[:, 0]                            # (1, V)

    # no_speech prob BEFORE any filtering (reference :7124-7134)
    no_speech_prob = jax.nn.softmax(last_row[0].astype(jnp.float32))[tids.nosp]

    def _bcast(a):
        return (None if a is None else
                jnp.broadcast_to(a, (a.shape[0], B) + a.shape[2:]))

    kv = KVCache(*(_bcast(a) for a in kv1))
    logits0 = jnp.broadcast_to(last_row, (B, V)).astype(jnp.float32)

    # encoder K/V stays at batch 1 — decoder_forward contracts all B
    # decoders against the shared copy (no B-fold HBM duplication)
    ck, cv = cross_k, cross_v

    state = _LoopState(
        i=jnp.int32(0),
        kv=kv,
        logits=logits0,
        tokens=jnp.zeros((B, n_max), jnp.int32),
        tok_p=jnp.zeros((B, n_max), jnp.float32),
        tok_plog=jnp.zeros((B, n_max), jnp.float32),
        tok_pt=jnp.zeros((B, n_max), jnp.float32),
        tok_ptsum=jnp.zeros((B, n_max), jnp.float32),
        tok_tid=jnp.zeros((B, n_max), jnp.int32),
        sum_logprobs_all=jnp.zeros(B, jnp.float32),
        seek_delta=jnp.full(B, 100 * CHUNK_SIZE, jnp.int32),
        has_ts=jnp.zeros(B, bool),
        failed=jnp.zeros(B, bool),
        completed=jnp.zeros(B, bool),
        result_len=jnp.zeros(B, jnp.int32),
        last_token=jnp.zeros(B, jnp.int32),
        prefix_hash=jnp.zeros(B, jnp.uint32),
        gstate=jnp.zeros(B, jnp.int32),
    )

    def cond(st: _LoopState):
        return (st.i < n_max) & ~jnp.all(st.completed | st.failed)

    def body(st: _LoopState):
        i = st.i
        live = ~(st.completed | st.failed)                      # (B,)

        is_initial = i == 0
        last_was_ts = jnp.where(i > 0,
                                st.tokens[:, jnp.maximum(i - 1, 0)] >= tids.beg,
                                False)
        penult_was_ts = jnp.where(i >= 2,
                                  st.tokens[:, jnp.maximum(i - 2, 0)] >= tids.beg,
                                  True)                          # <2 tokens -> true (:6264)

        # grammar-DFA penalty: one gathered mask row per decoder (the
        # reference's whisper_suppress_invalid_grammar at :6336, precompiled
        # — see decoding/grammar_dfa.py)
        g_rej = grammar_reject[st.gstate] if grammar_reject is not None else None
        lg, logprobs, probs = apply_filters(
            st.logits, consts, tids,
            is_initial=jnp.broadcast_to(is_initial, (B,)),
            last_was_ts=last_was_ts,
            penult_was_ts=penult_was_ts,
            has_ts=st.has_ts,
            seek_delta=st.seek_delta,
            temperature=temperature,
            grammar_reject=g_rej,
            grammar_penalty=(grammar_penalty
                             if grammar_penalty is not None else 100.0),
        )
        pt, ptsum, tid = timestamp_stats(
            probs, tids,
            default_tid=tids.beg if strategy == BEAM else 0)

        key = jax.random.fold_in(rng_key, i)

        if strategy == GREEDY_BEST:
            tok = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            src = jnp.arange(B)
        elif strategy == SAMPLE:
            g = jax.random.gumbel(key, (B, V))
            tok = jnp.argmax(jnp.where(jnp.isinf(logprobs), NEG_INF, logprobs + g),
                             axis=-1).astype(jnp.int32)
            src = jnp.arange(B)
        else:  # BEAM
            cand_noise = (
                jax.random.gumbel(jax.random.fold_in(key, 7),
                                  (B, beam_size, V))
                if beam_multinomial else None)
            src, tok = beam_select(
                logprobs, live, st.sum_logprobs_all, st.prefix_hash,
                st.last_token, i, beam_size, cand_noise)

            # fork: gather every per-decoder datum from the source beam.
            # The KV gather (the only HBM-heavy one) is DEFERRED into the
            # next decode step's per-layer scan (decoder_forward fork_src):
            # pay-per-fork like the reference's kv_seq_cp, with no
            # cache-sized temp buffer (models/whisper.py docstring).
            st = st._replace(
                tokens=st.tokens[src],
                tok_p=st.tok_p[src], tok_plog=st.tok_plog[src],
                tok_pt=st.tok_pt[src], tok_ptsum=st.tok_ptsum[src],
                tok_tid=st.tok_tid[src],
                sum_logprobs_all=st.sum_logprobs_all[src],
                seek_delta=st.seek_delta[src], has_ts=st.has_ts[src],
                result_len=st.result_len[src],
                prefix_hash=st.prefix_hash[src] * HASH_MULT + tok.astype(jnp.uint32),
                gstate=st.gstate[src],
            )
            logprobs = logprobs[src]
            probs = probs[src]
            pt, ptsum, tid = pt[src], ptsum[src], tid[src]

        p_tok = jnp.take_along_axis(probs, tok[:, None], axis=-1)[:, 0]
        plog_tok = jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]
        # sampled timestamp overrides the stats token (:6481-6484)
        is_ts = tok >= tids.beg
        tid = jnp.where(is_ts, tok, tid).astype(jnp.int32)
        pt = jnp.where(is_ts, p_tok, pt)

        # ---- append token for live decoders --------------------------------
        tokens = st.tokens.at[:, i].set(jnp.where(live, tok, st.tokens[:, i]))
        tok_p = st.tok_p.at[:, i].set(jnp.where(live, p_tok, st.tok_p[:, i]))
        tok_plog = st.tok_plog.at[:, i].set(jnp.where(live, plog_tok, st.tok_plog[:, i]))
        tok_pt = st.tok_pt.at[:, i].set(jnp.where(live, pt, st.tok_pt[:, i]))
        tok_ptsum = st.tok_ptsum.at[:, i].set(jnp.where(live, ptsum, st.tok_ptsum[:, i]))
        tok_tid = st.tok_tid.at[:, i].set(jnp.where(live, tid, st.tok_tid[:, i]))
        sum_lp = jnp.where(live, st.sum_logprobs_all + plog_tok, st.sum_logprobs_all)

        # ---- per-decoder state machine (:7297-7378; shared single copy,
        # decoding/state_machine.py) ----------------------------------------
        upd = state_machine.advance(
            tok, i, live, st.has_ts, st.seek_delta, st.result_len,
            st.failed, st.completed, seek, seek_end, tids,
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

        # ---- next decode step ---------------------------------------------
        next_tok = jnp.where(live, tok, st.last_token)
        pos = prompt_len + i
        lg_next, kv_next = model_mod.decode_logits_only(
            params, hp, next_tok[:, None], pos, st.kv, ck, cv, dtype,
            fork_src=src if strategy == BEAM else None)

        return _LoopState(
            i=i + 1, kv=kv_next, logits=lg_next[:, 0],
            tokens=tokens, tok_p=tok_p, tok_plog=tok_plog,
            tok_pt=tok_pt, tok_ptsum=tok_ptsum, tok_tid=tok_tid,
            sum_logprobs_all=sum_lp, seek_delta=seek_delta, has_ts=has_ts,
            failed=failed, completed=completed, result_len=result_len,
            last_token=next_tok, prefix_hash=st.prefix_hash,
            gstate=gstate,
        )

    final = lax.while_loop(cond, body, state)

    return WindowResult(
        tokens=final.tokens, tok_p=final.tok_p, tok_plog=final.tok_plog,
        tok_pt=final.tok_pt, tok_ptsum=final.tok_ptsum, tok_tid=final.tok_tid,
        n_tokens=final.i, result_len=final.result_len,
        seek_delta=final.seek_delta, failed=final.failed,
        completed=final.completed, sum_logprobs_all=final.sum_logprobs_all,
        no_speech_prob=no_speech_prob,
    )
