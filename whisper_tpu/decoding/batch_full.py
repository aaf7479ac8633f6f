"""run_full_batch — transcribe MANY utterances concurrently on one chip
(or data-parallel across a mesh).

This is the TPU-native answer to whisper_full_parallel (reference
src/whisper.cpp:7736-7864): instead of N host threads each walking its own
audio chunk, N utterances advance their 30 s windows in lockstep — one
batched encoder call and one batched on-device token loop per round.
Utterances finish independently; finished rows ride along masked until all
are done (their lanes do no useful work, which is the price of static
shapes — with a data mesh the batch axis shards over chips).

Each utterance owns K decoder rows (beam_size / best_of) with
block-diagonal beam forks, so the north-star beam-5 config batches too;
temperature fallback reruns only the rows that need it, masked.
DFA-compilable grammars ride along as per-row table gathers.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu import languages
from whisper_tpu.api import Segment, TokenData
from whisper_tpu.config import CHUNK_SIZE, FullParams, MAX_DECODERS
from whisper_tpu.decoding import batch_loop, device_loop, filters, scoring
from whisper_tpu.decoding import segments as seg_mod

from whisper_tpu.decoding.state_machine import DELTA_MIN  # single copy


class _RowsView:
    """Per-utterance row-slice of a BatchWindowResult, shaped like a
    WindowResult for scoring.rank_decoders."""

    def __init__(self, tokens, tok_plog, result_len, failed):
        self.tokens = tokens
        self.tok_plog = tok_plog
        self.result_len = result_len
        self.failed = failed


def run_full_batch(
    ctx,
    params: FullParams,
    audios: Sequence[np.ndarray],
    mesh=None,
    timings_sink=None,
    lang_sink: Optional[List[int]] = None,
) -> List[List[Segment]]:
    hp = ctx.hparams
    vocab = ctx.vocab
    B = len(audios)
    if B == 0:
        return []
    if params.n_decoders > MAX_DECODERS:
        # reference errors rather than clamping (src/whisper.cpp:6881-6883)
        raise ValueError(f"too many decoders requested ({params.n_decoders})")

    # DFA-compilable grammars fold into the lockstep loop as per-row table
    # gathers (decoding/grammar_dfa.py). Logits callbacks and over-budget
    # grammars carry host state the batch loop can't fold — those requests
    # run each utterance through the single-state orchestrator (host loop
    # as loop.py decides); merge semantics are unchanged.
    grammar_dfa = None
    g_rej_dev = g_trans_dev = None
    if params.grammar_rules is not None:
        from whisper_tpu.decoding.grammar_dfa import cached_dfa
        grammar_dfa = cached_dfa(params.grammar_rules, vocab)
        if grammar_dfa is not None:
            # one upload, reused across every window round (ADVICE r2)
            g_rej_dev, g_trans_dev = grammar_dfa.device_tables()
    if ((params.grammar_rules is not None and grammar_dfa is None)
            or params.logits_filter_callback is not None):
        from whisper_tpu.decoding.loop import run_full
        out = []
        for audio in audios:
            st = ctx.create_state()
            out.append(run_full(st, params, audio))
            if timings_sink is not None:
                for phase, stat in st.timings.phases.items():
                    timings_sink.add(phase, stat.total_s, stat.calls)
        return out

    prompt_max = hp.n_text_ctx // 2 + 8
    temperatures = params.temperatures()

    no_timestamps = params.no_timestamps
    # distil models force no_timestamps (run_full's is_distil rule,
    # reference src/whisper.cpp:6954-6959)
    if hp.n_text_layer == 2 and hp.n_vocab != 51866 and not no_timestamps:
        no_timestamps = True
    # forced no_timestamps must reach the filters (reference :6956-6959 +
    # :6198-6202; r4 review — see run_full)
    fparams = params
    if no_timestamps != params.no_timestamps:
        import copy
        fparams = copy.copy(params)
        fparams.no_timestamps = True
    consts, tids = filters.build_filter_consts(vocab, hp, fparams)

    # per-utterance host state
    states = [ctx.create_state() for _ in range(B)]
    audios = [np.asarray(a, np.float32) for a in audios]
    results: List[List[Segment]] = [[] for _ in range(B)]

    # --- VAD preprocessing per utterance (matches run_full / the reference
    # whisper_full at :7717-7734; segment times remapped after the loop) ---
    vad_mappings = [None] * B
    if params.vad:
        from whisper_tpu.models.vad import vad_filter_audio
        for b in range(B):
            filtered, vad_mappings[b] = vad_filter_audio(
                states[b], audios[b], params)
            audios[b] = (filtered if filtered is not None and len(filtered)
                         else np.zeros(0, np.float32))

    for st, audio in zip(states, audios):
        if len(audio):
            st.pcm_to_mel(audio)
        if params.token_timestamps and len(audio):
            from whisper_tpu.decoding.timestamps import get_signal_energy
            st.t_beg = st.t_last = st.tid_last = 0
            st.energy = get_signal_energy(audio, 32)

    # --- per-utterance language (auto-detect like run_full :121-126 /
    # reference :6814-6830) ------------------------------------------------
    language = params.language
    need_detect = (language in (None, "", "auto") or params.detect_language)
    lang_ids = np.zeros(B, np.int32)
    if hp.is_multilingual:
        for b in range(B):
            if need_detect:
                if states[b].mel is not None:
                    from whisper_tpu.decoding.language import lang_auto_detect
                    lid, _ = lang_auto_detect(states[b], 0)
                else:
                    lid = 0
            else:
                lid = languages.lang_id(language)
            lang_ids[b] = lid
            states[b].lang_id = int(lid)
    if lang_sink is not None:
        lang_sink.extend(int(l) for l in lang_ids)
    if params.detect_language:
        return results

    def _prompt_init(b: int) -> List[int]:
        pi = [vocab.token_sot]
        if hp.is_multilingual:
            pi.append(vocab.token_lang(int(lang_ids[b])))
            pi.append(vocab.token_translate if params.translate
                      else vocab.token_transcribe)
        if no_timestamps:
            pi.append(vocab.token_not)
        return pi

    prompt_inits = [_prompt_init(b) for b in range(B)]

    seek_start = params.offset_ms // 10
    seek = np.array([seek_start] * B, np.int32)
    seek_end = np.array([
        (0 if st.mel is None                      # VAD removed everything
         else st.n_len_org if params.duration_ms == 0
         else seek_start + params.duration_ms // 10)
        for st in states], np.int32)

    # initial prompt seeds every utterance's past (run_full :150-153,
    # reference :6906-6931)
    prompt_past: List[List[int]] = [[] for _ in range(B)]
    if params.initial_prompt and not params.prompt_tokens:
        params.prompt_tokens = ctx.tokenizer.encode(params.initial_prompt)
    if params.prompt_tokens:
        prompt_past = [list(params.prompt_tokens) for _ in range(B)]

    # '>=' like the loop-bottom check and the reference (:6995); '<' was
    # off by one at exactly DELTA_MIN frames remaining (r4 review)
    done = np.array([seek[b] + DELTA_MIN >= seek_end[b] for b in range(B)])

    data_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_sharding = NamedSharding(mesh, P("data"))

    rng_seed = 0
    while not done.all():
        active = ~done

        # ---- batched encode of each utterance's current window ------------
        windows = [
            (states[b].mel_window(int(seek[b]))[0] if states[b].mel is not None
             else jnp.zeros((hp.n_mels, 2 * hp.n_audio_ctx), jnp.float32))
            for b in range(B)]
        mel_batch = jnp.stack(windows)                     # (B, n_mels, 3000)
        if data_sharding is not None:
            mel_batch = jax.device_put(mel_batch, data_sharding)
        t0 = time.perf_counter()
        from whisper_tpu.api import _encode_jit, _cross_kv_jit
        embed = _encode_jit(ctx.params, hp, mel_batch, ctx.dtype,
                            ctx.cparams.flash_attn and ctx.exec_backend == "tpu")
        ck, cv = _cross_kv_jit(ctx.params, hp, embed, ctx.kv_quant)
        jax.block_until_ready(ck)
        # NOTE: batched phases are ONE device program covering all active
        # rows; per-state "timings" get the wall clock divided evenly. Read
        # them as amortized batch cost, not per-utterance truth — the
        # whole-batch number is the product of total_s and the row count.
        for b in range(B):
            if active[b]:
                states[b].timings.add("encode", (time.perf_counter() - t0) / max(1, active.sum()))

        # drop stale prompt near the end (run_full :214-215, reference
        # :7013-7016)
        for b in range(B):
            if active[b] and seek[b] > seek_start and seek[b] + 500 >= seek_end[b]:
                prompt_past[b] = []

        # ---- decode attempts over the temperature ladder ------------------
        # each utterance owns K decoder rows per attempt: beam_size under
        # BEAM_SEARCH at t=0, best_of when sampling at t>0 (the reference's
        # n_decoders_cur, src/whisper.cpp:7024-7044) — folded into one
        # (B*K)-row batch with block-diagonal beam forks
        needy = active.copy()
        best = [None] * B          # per-utterance (result, winning row, score)
        from whisper_tpu.config import SamplingStrategy
        for it, t_cur in enumerate(temperatures):
            if not needy.any():
                break
            if params.strategy == SamplingStrategy.GREEDY:
                strat = device_loop.SAMPLE if t_cur > 0 else device_loop.GREEDY_BEST
                K = params.greedy.best_of if t_cur > 0 else 1
            else:
                if t_cur > 0:
                    strat = device_loop.SAMPLE
                    K = params.greedy.best_of
                else:
                    strat = device_loop.BEAM
                    K = params.beam_search.beam_size
            K = max(1, K)

            # per-row prompts for THIS attempt: past-text conditioning only
            # below t=0.5 (run_full :234-238, reference :7076) — padded to
            # the smallest shared bucket (loop.py prompt_bucket)
            plens = np.ones(B, np.int32)
            row_prompts: List[List[int]] = []
            for b in range(B):
                pr: List[int] = []
                if (prompt_past[b] and t_cur < 0.5
                        and params.n_max_text_ctx > 0):
                    n_take = min(params.n_max_text_ctx, hp.n_text_ctx // 2,
                                 len(prompt_past[b]))
                    pr = [vocab.token_prev] + prompt_past[b][-n_take:]
                pr = (pr + prompt_inits[b])[:prompt_max]
                row_prompts.append(pr)
                plens[b] = len(pr)
            buckets = sorted({min(8, prompt_max), min(64, prompt_max),
                              prompt_max})
            bucket = next(bb for bb in buckets if plens.max() <= bb)
            prompts = np.zeros((B, bucket), np.int32)
            for b in range(B):
                prompts[b, : len(row_prompts[b])] = row_prompts[b]

            t0 = time.perf_counter()
            res = batch_loop.decode_windows_batch(
                ctx.params, hp, consts, ck, cv,
                jnp.asarray(prompts), jnp.asarray(plens),
                jnp.float32(t_cur), jnp.asarray(seek), jnp.asarray(seek_end),
                jnp.asarray(needy),
                jax.random.PRNGKey(rng_seed + it),
                g_rej_dev,
                g_trans_dev,
                jnp.float32(params.grammar_penalty) if grammar_dfa else None,
                tids=tids, n_utt=B, n_per_utt=K, strategy=strat,
                max_tokens=params.max_tokens,
                single_segment=params.single_segment,
                no_timestamps=no_timestamps, dtype=ctx.dtype,
                kv_quant=ctx.kv_quant)
            res = jax.tree_util.tree_map(np.asarray, res)
            n_steps = int(res.n_tokens)
            for b in range(B):
                if needy[b]:
                    states[b].timings.add("decode",
                                          (time.perf_counter() - t0) / max(1, needy.sum()),
                                          max(1, n_steps))

            for b in range(B):
                if not needy[b]:
                    continue
                rows = slice(b * K, (b + 1) * K)
                view = _RowsView(
                    tokens=res.tokens[rows], tok_plog=res.tok_plog[rows],
                    result_len=res.result_len[rows], failed=res.failed[rows])
                j, row_scores, row_failed = scoring.rank_decoders(view, params)
                sc = row_scores[j]
                all_failed = bool(row_failed[j]) or sc is None
                fallback = scoring.needs_fallback(
                    all_failed,
                    sc.avg_logprobs if sc else float("-inf"),
                    float(res.no_speech_prob[b]),
                    params, it == len(temperatures) - 1)
                best[b] = (res, b * K + j,
                           sc or scoring.score_sequence(
                               np.zeros(0, np.int32), np.zeros(0, np.float32),
                               params.length_penalty),
                           row_prompts[b])
                if not fallback:
                    needy[b] = False
            # rows still needy rerun at the next temperature

        # ---- emit per-row segments ----------------------------------------
        for b in range(B):
            if not active[b]:
                continue
            res, rb, sc, win_prompt = best[b]
            result_len = int(res.result_len[rb])
            sd = int(res.seek_delta[rb])
            nsp = float(res.no_speech_prob[b])   # per-utterance (U,)
            states[b].no_speech_prob = nsp

            tokens_cur = [
                TokenData(id=int(res.tokens[rb, i]), tid=int(res.tok_tid[rb, i]),
                          p=float(res.tok_p[rb, i]), plog=float(res.tok_plog[rb, i]),
                          pt=float(res.tok_pt[rb, i]), ptsum=float(res.tok_ptsum[rb, i]))
                for i in range(result_len)
            ]
            is_no_speech = (nsp > params.no_speech_thold
                            and sc.avg_logprobs < params.logprob_thold)

            # update prompt_past from the WINNING attempt's prompt
            # (reference :7563-7571; no_context only clears the carry-in at
            # call start — cross-window carry within one call is
            # unconditional, matching run_full)
            new_past: List[int] = []
            if win_prompt and win_prompt[0] == vocab.token_prev:
                new_past = win_prompt[1 : len(win_prompt) - len(prompt_inits[b])]
            if not is_no_speech:
                new_past += [td.id for td in tokens_cur]
            prompt_past[b] = new_past

            if tokens_cur and not is_no_speech:
                segs = seg_mod.emit_segments(
                    tokens_cur, int(seek[b]), sd, vocab, ctx.tokenizer, params, nsp)
                if params.token_timestamps and segs:
                    from whisper_tpu.decoding.timestamps import (
                        compute_token_level_timestamps)
                    wrapped = []
                    for s in segs:
                        compute_token_level_timestamps(
                            states[b], s, params.thold_pt, params.thold_ptsum)
                        if params.max_len > 0:
                            wrapped.extend(seg_mod.wrap_segment(
                                s, vocab, params.max_len, params.split_on_word))
                        else:
                            wrapped.append(s)
                    segs = wrapped
                # DTW token timestamps, same as run_full (:7679-7692;
                # the batch path silently dropped them — r4 review). The
                # collect pass reads state.cross_k/v: hand it this
                # utterance's slice of the batched encoder K/V (works for
                # bf16 arrays and int8 (codes, scales) tuples alike).
                if ctx.cparams.dtw_token_timestamps and segs:
                    from whisper_tpu.decoding.dtw import compute_dtw_timestamps
                    states[b].cross_k = jax.tree_util.tree_map(
                        lambda x: x[:, b:b + 1], ck)
                    states[b].cross_v = jax.tree_util.tree_map(
                        lambda x: x[:, b:b + 1], cv)
                    n_frames = min(100 * CHUNK_SIZE, sd,
                                   int(seek_end[b] - seek[b]))
                    compute_dtw_timestamps(states[b], params, segs,
                                           int(seek[b]), n_frames)
                results[b].extend(segs)

            if (result_len > 1
                    and tokens_cur and len(tokens_cur) > 1
                    and tokens_cur[-2].id < vocab.token_beg
                    and tokens_cur[-1].id > vocab.token_beg):
                sd = min(int(seek_end[b] - seek[b]), 100 * CHUNK_SIZE)
            seek[b] += sd
            if seek[b] + DELTA_MIN >= seek_end[b]:
                done[b] = True
        rng_seed += 1000

    # remap segment times through each utterance's VAD mapping
    # (reference :7882-7960, as in run_full)
    if params.vad:
        from whisper_tpu.models.vad import remap_segment_times
        for b in range(B):
            if vad_mappings[b]:
                for s in results[b]:
                    remap_segment_times(s, vad_mappings[b])

    if timings_sink is not None:
        # aggregate per-utterance timings (reference whisper_full_parallel
        # sums its workers' timings, src/whisper.cpp:7849-7858)
        for st in states:
            for phase, stat in st.timings.phases.items():
                timings_sink.add(phase, stat.total_s, stat.calls)
    return results
