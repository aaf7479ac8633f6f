"""DTW token-level timestamps from cross-attention alignment heads.

reference whisper_exp_compute_token_level_timestamps_dtw
(src/whisper.cpp:8772-8931), dtw_and_backtrace (:8647-8730), median_filter
(:8737-8769), identical in spirit to OpenAI whisper/timing.py.

Pipeline:
 1. token seq [SOT, (lang), NOT, text..., EOT] re-decoded once with
    cross-attention capture (models/whisper.py collect_cross_qk)
 2. gather the preset's (text_layer, head) alignment heads
 3. crop audio axis to n_frames/2, z-normalize over the token axis,
    median-filter (reflect pad) over the audio axis, mean over heads, negate
 4. DTW dynamic program + backtrace over the (tokens × frames) cost matrix
 5. walk the path: where the token index steps, stamp t_dtw = 2*time + seek

Steps 2-3 run on device (one jit); the DP runs on host numpy — at most
448×1500 cells, microseconds-scale, inherently sequential (SURVEY.md §7
flags a Pallas wavefront kernel as an only-if-profiling-demands option).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import (
    ALIGNMENT_HEADS,
    AlignmentHeadsPreset,
    ContextParams,
    WhisperHParams,
)


def resolve_alignment_heads(cparams: ContextParams, hp: WhisperHParams) -> List[Tuple[int, int]]:
    """(text_layer, head) pairs for the configured preset
    (reference get_alignment_heads_by_layer, src/whisper.cpp:8622-8641)."""
    mode = cparams.dtw.mode
    if mode == AlignmentHeadsPreset.NONE:
        return []
    if mode == AlignmentHeadsPreset.N_TOP_MOST:
        n_top = cparams.dtw.n_top if cparams.dtw.n_top > 0 else hp.n_text_layer
        return [(l, h) for l in range(hp.n_text_layer - n_top, hp.n_text_layer)
                for h in range(hp.n_text_head)]
    if mode == AlignmentHeadsPreset.CUSTOM:
        return list(cparams.dtw.custom_aheads)
    return list(ALIGNMENT_HEADS[mode])


def median_filter_reflect(x: np.ndarray, width: int) -> np.ndarray:
    """Median filter along the last axis with reflect padding
    (reference :8737-8769)."""
    assert width % 2 == 1
    n = x.shape[-1]
    assert width < n
    idx = np.arange(n)[:, None] + np.arange(-(width // 2), width // 2 + 1)[None, :]
    idx = np.where(idx < 0, -idx, idx)
    idx = np.where(idx >= n, 2 * (n - 1) - idx, idx)
    return np.median(x[..., idx], axis=-1)


def dtw_path(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic alignment path through cost matrix x (N tokens × M frames).
    Returns (text_indices, time_indices), matching OpenAI timing.py's dtw
    (reference dtw_and_backtrace :8647-8730).

    The C++ runtime computes the O(N*M) sequential DP when built
    (~1 ms vs seconds for this Python loop at 448x1500); this fallback is
    also the reference implementation for the native parity tests."""
    from whisper_tpu.runtime import native
    nat = native.dtw(np.ascontiguousarray(x, np.float32))
    if nat is not None:
        return nat

    N, M = x.shape
    cost = np.full((N + 1, M + 1), np.inf, dtype=np.float64)
    trace = np.full((N + 1, M + 1), -1, dtype=np.int32)
    cost[0, 0] = 0.0

    for j in range(1, M + 1):
        c_prev_col = cost[:, j - 1]
        # row-sequential DP (cost[i-1, j] dependency prevents full vectorize)
        for i in range(1, N + 1):
            c0 = c_prev_col[i - 1]
            c1 = cost[i - 1, j]
            c2 = c_prev_col[i]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t

    trace[0, :] = 2
    trace[:, 0] = 1

    i, j = N, M
    text_idx, time_idx = [], []
    while i > 0 or j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:  # t == 2
            j -= 1
    return np.array(text_idx[::-1]), np.array(time_idx[::-1])


import functools


@functools.partial(jax.jit, static_argnames=("hp", "dtype"))
def _qk_forward_jit(params, tokens, pos0, kv, cross_k, cross_v, logit_rows,
                    *, hp, dtype):
    """Module-level jit (cached across windows/calls — a per-call
    jit(partial(...)) recompiled the cross-QK decode every window, r3
    review) of the collect_cross_qk decoder forward."""
    from whisper_tpu.models import whisper as model_mod
    return model_mod.decoder_forward(
        params, hp, tokens, pos0, kv, cross_k, cross_v, dtype,
        collect_cross_qk=True, logit_rows=logit_rows)


def _extract_alignment(cross_qk, aheads, n_audio_tokens):
    """(L, 1, H, T, Ta) device array -> (N_heads, T, n_audio_tokens) f32."""
    layers = jnp.asarray([l for l, _ in aheads])
    heads = jnp.asarray([h for _, h in aheads])
    w = cross_qk[layers, 0, heads, :, :n_audio_tokens]  # (N, T, Ta')
    return w.astype(jnp.float32)


def compute_dtw_timestamps(
    state,
    params,
    segments: Sequence,
    seek: int,
    n_frames: int,
    medfilt_width: int = 7,
) -> None:
    """Stamp t_dtw on the text tokens of `segments` (emitted this window).

    reference :8772-8931. Runs one extra batched decode of the window's
    token sequence with a fresh KV cache (the reference clears kv_self)."""
    ctx = state.ctx
    hp = ctx.hparams
    vocab = ctx.vocab

    aheads = resolve_alignment_heads(ctx.cparams, hp)
    if not aheads or not segments:
        return
    assert medfilt_width % 2 == 1

    # token sequence: sot + [lang] + text tokens + eot (:8800-8817)
    tokens = [vocab.token_sot]
    if hp.is_multilingual:
        tokens.append(vocab.token_lang(state.lang_id))
    sot_len = len(tokens)
    tokens.append(vocab.token_not)
    text_token_refs = []
    for seg in segments:
        for td in seg.tokens:
            if td.id < vocab.token_eot:
                tokens.append(td.id)
                text_token_refs.append(td)
    tokens.append(vocab.token_eot)

    from whisper_tpu.models.whisper import KVCache

    n_tok = len(tokens)
    kv = KVCache.zeros(hp, 1, ctx.dtype, size=-(-n_tok // 128) * 128)

    _, _, cross_qk = _qk_forward_jit(
        ctx.params,
        jnp.asarray(np.asarray(tokens, np.int32)[None]),
        jnp.int32(0), kv,
        state.cross_k, state.cross_v,
        jnp.int32(0),  # QKs only — skip the vocab projection
        hp=hp, dtype=ctx.dtype)

    n_audio_tokens = max(1, n_frames // 2)
    n_audio_tokens = min(n_audio_tokens, cross_qk.shape[-1])
    w = np.asarray(_extract_alignment(cross_qk, aheads, n_audio_tokens))

    # z-normalize over the token axis per (head, frame) (:8860-8866)
    mean = w.mean(axis=1, keepdims=True)
    std = w.std(axis=1, keepdims=True)
    w = (w - mean) / np.sqrt(std**2 + 1e-9)

    w = median_filter_reflect(w, medfilt_width)      # over audio frames
    matrix = -w.mean(axis=0)                          # (T, Ta'), negated

    # drop sot sequence and trailing EOT rows (:8880-8884)
    matrix = matrix[sot_len : n_tok - 1]

    text_idx, time_idx = dtw_path(matrix.astype(np.float64))

    # walk the path; the first row of `matrix` is the NOT token, which the
    # reference skips via its "only text tokens" walker (:8901-8916)
    last_v = 0
    ti = 0
    for k in range(len(text_idx)):
        v = int(text_idx[k])
        if v != last_v:
            timestamp = int(time_idx[k]) * 2 + seek
            last_v = v
            if ti < len(text_token_refs):
                text_token_refs[ti].t_dtw = timestamp
                ti += 1
