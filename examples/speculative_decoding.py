#!/usr/bin/env python
"""Speculative greedy decoding example (no reference analogue).

Loads a main model plus a draft checkpoint sharing its vocabulary (e.g.
ggml-large-v3.bin + ggml-distil-large-v3.bin) and transcribes with the
draft proposing `spec_k` tokens per main-model verify forward
(decoding/speculative.py; PERF.md "Speculative greedy decoding" for the
bandwidth math). The emitted text is the main model's own greedy stream —
the draft only changes speed, never tokens.

Usage: python examples/speculative_decoding.py <main.bin> <draft.bin> <audio.wav> [spec_k]
"""

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    if len(sys.argv) < 4:
        print(f"usage: {sys.argv[0]} <main.bin> <draft.bin> <audio.wav> [spec_k]")
        return 1
    main_path, draft_path, audio_path = sys.argv[1:4]
    spec_k = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    import whisper_tpu as wt
    from whisper_tpu.audio.io import read_wav
    from whisper_tpu.config import ContextParams
    from whisper_tpu.decoding.segments import to_timestamp

    ctx = wt.WhisperContext.new_with_params(
        main_path, ContextParams(draft_model=draft_path, spec_k=spec_k))
    samples, _sr = read_wav(audio_path)

    params = wt.FullParams.default()          # greedy — the speculative path
    state = ctx.create_state()

    t0 = time.perf_counter()
    state.full(params, samples)
    dt = time.perf_counter() - t0

    for i in range(state.full_n_segments()):
        s = state.full_get_segment(i)
        print(f"[{to_timestamp(s.t0)} --> {to_timestamp(s.t1)}] {s.text}")
    n_tok = sum(len(state.full_get_segment(i).tokens)
                for i in range(state.full_n_segments()))
    print(f"\n{n_tok} tokens in {dt:.2f}s (draft spec_k={spec_k})")
    if state.spec_stats:
        r, n = state.spec_stats["rounds"], state.spec_stats["tokens"]
        print(f"speculative: {n} tokens / {r} verify rounds "
              f"= {n / max(1, r):.2f} accepted tokens per main forward")
    state.print_timings()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
