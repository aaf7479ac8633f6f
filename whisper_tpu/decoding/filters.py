"""Logit-filter pipeline — vectorized, jittable.

Reproduces the reference's whisper_process_logits rule set IN ORDER
(src/whisper.cpp:6183-6417); this ordering is where WER parity is won or
lost (SURVEY.md §7 hard parts):

 1. suppress blank at initial step (EOT + " ")            (:6186-6193)
 2. suppress <|notimestamps|>; all timestamps if no_timestamps (:6195-6202)
 3. suppress SOT, NOSP                                    (:6204-6206)
 4. suppress SOLM unless tdrz                             (:6208-6211)
 5. suppress task tokens translate/transcribe/prev        (:6213-6222)
 6. suppress lang tokens                                  (:6218-6220)
 7. user logits_filter_callback                           (:6224-6226) [host path]
 8. suppress_regex matches                                (:6228-6237) [static mask]
 9. suppress non-speech tokens if suppress_nst            (:6239-6259) [static mask]
10. timestamp pairing rules                               (:6262-6281)
11. max_initial_ts at initial step                        (:6283-6292)
12. monotonic timestamps (>= seek_delta/2 when has_ts)    (:6294-6302)
13. log_softmax -> logprobs                               (:6305)
14. timestamp-vs-text logsumexp rule                      (:6307-6358)
15. (grammar penalty — host path, decoding/grammar.py)

Static rules (1-9, 11) are precomputed into boolean masks host-side once per
(vocab, params); dynamic rules (10, 12, 14) depend on per-decoder state and
are computed on device each step. -inf suppression is jnp.where against
NEG_INF so the subsequent softmax matches the C code's -INFINITY handling.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import CHUNK_SIZE, FullParams, WhisperHParams
from whisper_tpu.tokenizer import WhisperVocab

NEG_INF = float("-inf")

# reference src/whisper.cpp:6102-6107
NON_SPEECH_TOKENS = [
    "\"", "#", "(", ")", "*", "+", "/", ":", ";", "<", "=", ">", "@", "[",
    "\\", "]", "^", "_", "`", "{", "|", "}", "~", "「", "」", "『", "』",
    "<<", ">>", "<<<", ">>>", "--", "---", "-(", "-[", "('", "(\"", "((",
    "))", "(((", ")))", "[[", "]]", "{{", "}}", "♪♪", "♪♪♪", "♩", "♪",
    "♫", "♬", "♭", "♮", "♯",
]


class TokenIds(NamedTuple):
    """Static (hashable) special-token ids — compile-time constants."""

    eot: int
    beg: int
    nosp: int
    n_vocab: int


class FilterConsts(NamedTuple):
    """Device-resident constants driving the per-step filter kernel."""

    suppress_always: jax.Array   # (V,) bool — rules 2-6, 8, 9
    suppress_initial: jax.Array  # (V,) bool — rule 1 (blank) + rule 11 (max_initial_ts)


def build_filter_consts(
    vocab: WhisperVocab,
    hp: WhisperHParams,
    params: FullParams,
) -> FilterConsts:
    V = vocab.n_vocab
    always = np.zeros(V, bool)
    initial = np.zeros(V, bool)

    # rule 1: suppress blank at initial (EOT + " ")
    if params.suppress_blank:
        initial[vocab.token_eot] = True
        space = vocab.token_to_id.get(b" ")
        if space is not None:
            initial[space] = True

    # rule 2: <|notimestamps|> always; all timestamps if no_timestamps
    always[vocab.token_not] = True
    if params.no_timestamps:
        always[vocab.token_beg :] = True

    # rules 3-6
    always[vocab.token_sot] = True
    always[vocab.token_nosp] = True
    if not params.tdrz_enable:
        always[vocab.token_solm] = True
    always[vocab.token_translate] = True
    always[vocab.token_transcribe] = True
    always[vocab.token_prev] = True
    for lang_id in range(100):
        t = vocab.token_lang(lang_id)
        if t < V:
            always[t] = True

    # rule 8: suppress_regex. The reference matches token BYTES with
    # std::regex_match (src/whisper.cpp:6232-6238: char-traits regex over
    # the raw token string, one byte = one char), so compile the pattern
    # as bytes — decoding to UTF-8 first would both change `.`/class
    # semantics on multi-byte tokens and silently skip the 128-255 byte
    # tokens (proven divergent by tests/test_reference_parity.py)
    if params.suppress_regex:
        pat = re.compile(params.suppress_regex.encode("utf-8"))
        for tok, tid in vocab.token_to_id.items():
            if pat.fullmatch(tok):
                always[tid] = True

    # rule 9: non-speech tokens
    if params.suppress_nst:
        for t in NON_SPEECH_TOKENS:
            for s in (t, " " + t):
                tid = vocab.token_to_id.get(s.encode("utf-8"))
                if tid is not None:
                    always[tid] = True
        for s in (" -", " '"):
            tid = vocab.token_to_id.get(s.encode("utf-8"))
            if tid is not None:
                always[tid] = True

    # rule 11: initial timestamp cap (max_initial_ts)
    if params.max_initial_ts > 0:
        precision = float(CHUNK_SIZE) / hp.n_audio_ctx
        tid0 = int(round(params.max_initial_ts / precision))
        initial[vocab.token_beg + tid0 + 1 :] = True

    return (
        FilterConsts(
            suppress_always=jnp.asarray(always),
            suppress_initial=jnp.asarray(initial),
        ),
        TokenIds(eot=vocab.token_eot, beg=vocab.token_beg,
                 nosp=vocab.token_nosp, n_vocab=V),
    )


def apply_filters(
    logits: jax.Array,        # (B, V) f32 — raw model logits for the last token
    consts: FilterConsts,
    tid_consts: TokenIds,
    *,
    is_initial: jax.Array,    # (B,) bool — no sampled tokens yet
    last_was_ts: jax.Array,   # (B,) bool — last sampled token >= beg
    penult_was_ts: jax.Array, # (B,) bool — 2nd-to-last >= beg (or <2 tokens)
    has_ts: jax.Array,        # (B,) bool — a timestamp was sampled this segment
    seek_delta: jax.Array,    # (B,) i32 — current per-decoder seek delta
    temperature: jax.Array,   # scalar f32
    grammar_reject: Optional[jax.Array] = None,  # (B, V) bool
    grammar_penalty: float = 100.0,
):
    """Returns (logits, logprobs, probs) after the full ordered rule set.

    Fully vectorized over the decoder batch: every rule is a masked where,
    fused by XLA into the surrounding softmax — the reference loops over the
    51 k-entry vocab on the CPU per decoder per token (:6183-6358).
    """
    V = tid_consts.n_vocab
    beg = tid_consts.beg
    ids = jnp.arange(V)
    is_ts_token = ids >= beg  # (V,)

    # temperature scaling (reference :6170-6174, applied before the filters)
    logits = jnp.where(temperature > 0.0, logits / jnp.maximum(temperature, 1e-8), logits)

    # static rules
    logits = jnp.where(consts.suppress_always[None, :], NEG_INF, logits)
    logits = jnp.where(is_initial[:, None] & consts.suppress_initial[None, :],
                       NEG_INF, logits)

    # rule 10: timestamp pairing
    #   last && penultimate were ts -> no more timestamps
    #   last was ts, penultimate wasn't -> only timestamps or EOT
    suppress_ts = (last_was_ts & penult_was_ts)[:, None] & is_ts_token[None, :]
    text_and_not_eot = (~is_ts_token & (ids < tid_consts.eot))[None, :]
    suppress_text = (last_was_ts & ~penult_was_ts)[:, None] & text_and_not_eot
    logits = jnp.where(suppress_ts | suppress_text, NEG_INF, logits)

    # rule 12: monotonic timestamps
    tid0 = seek_delta // 2                                    # (B,)
    mono = is_ts_token[None, :] & (ids[None, :] < beg + tid0[:, None])
    logits = jnp.where(has_ts[:, None] & mono, NEG_INF, logits)

    # rule 13: log-softmax (matches whisper_compute_logprobs :6110-6129)
    logprobs = jax.nn.log_softmax(logits, axis=-1)

    # rule 14: timestamp-vs-text logsumexp
    ts_logprob = jax.nn.logsumexp(jnp.where(is_ts_token[None, :], logprobs, NEG_INF),
                                  axis=-1)                     # (B,)
    max_text = jnp.max(jnp.where(is_ts_token[None, :], NEG_INF, logprobs), axis=-1)
    force_ts = ts_logprob > max_text                           # (B,)
    kill_text = force_ts[:, None] & ~is_ts_token[None, :]
    logits = jnp.where(kill_text, NEG_INF, logits)
    logprobs = jnp.where(kill_text, NEG_INF, logprobs)

    # rule 15: grammar penalty — only when timestamps were NOT forced, then
    # re-run log_softmax (reference :6344-6390)
    if grammar_reject is not None:
        apply_g = (~force_ts)[:, None] & grammar_reject
        logits = jnp.where(apply_g, logits - grammar_penalty, logits)
        logprobs2 = jax.nn.log_softmax(jnp.where(jnp.isinf(logits), NEG_INF, logits),
                                       axis=-1)
        logprobs2 = jnp.where(jnp.isinf(logits), NEG_INF, logprobs2)
        logprobs = jnp.where(force_ts[:, None], logprobs, logprobs2)

    probs = jnp.where(jnp.isinf(logprobs), 0.0, jnp.exp(logprobs))
    return logits, logprobs, probs


def timestamp_stats(probs: jax.Array, tid_consts: TokenIds,
                    default_tid: int = 0):
    """(pt, ptsum, tid): max/sum of timestamp-token probabilities and argmax
    timestamp id (reference whisper_sample_token :6447-6465).

    `default_tid` is the value tid keeps when the timestamp mass is
    all-zero: 0 for greedy/sample (whisper_sample_token's init, :6437 —
    the tid=0 quirk) but token_beg for BEAM (whisper_sample_token_topk
    initializes `tid = vocab.token_beg`, :6524 — r4 review)."""
    V = tid_consts.n_vocab
    ids = jnp.arange(V)
    is_ts = ids >= tid_consts.beg
    ts_probs = jnp.where(is_ts[None, :], probs, 0.0)
    ptsum = jnp.sum(ts_probs, axis=-1)
    max_ts = jnp.max(ts_probs, axis=-1)
    # Bug-for-bug: when the timestamp mass is all-zero (f32 underflow, or a
    # suppress_regex that kills every timestamp token) the reference leaves
    # tid at its 0 initialization (:6437) and segment emission computes
    # t0 = seek + 2*(0 - token_beg) = seek - 100726 centiseconds (:7576).
    # argmax over the all-zero row returns index 0 — exactly that quirk
    # (and on non-zero rows, the first maximal index, matching the
    # strict `<` scan at :6455-6459).
    tid = jnp.argmax(ts_probs, axis=-1).astype(jnp.int32)
    # strictly-positive max required to move off the init value (the
    # reference scan updates only on `max_ts < probs[i]`)
    tid = jnp.where(max_ts > 0, tid, jnp.int32(default_tid))
    pt = max_ts / (ptsum + 1e-10)
    return pt, ptsum, tid
