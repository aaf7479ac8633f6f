#!/usr/bin/env python
"""Transcription with DTW token-level timestamps.

Mirrors the reference's examples/audio_transcription.rs: enables the DTW
alignment-heads preset (or custom heads), transcribes, and prints per-token
t_dtw timestamps next to segment times (reference
audio_transcription.rs:70-100, 155-180).

Usage: python examples/audio_transcription.py <model.bin> <audio.wav> [preset]
  preset: tiny | tiny.en | base | base.en | small | ... | n_top | custom
"""

import sys

sys.path.insert(0, ".")


def main() -> int:
    if len(sys.argv) < 3:
        print(f"usage: {sys.argv[0]} <model.bin> <audio.wav> [dtw-preset]")
        return 1
    model_path, audio_path = sys.argv[1], sys.argv[2]
    preset_name = (sys.argv[3] if len(sys.argv) > 3 else "base.en")

    import whisper_tpu as wt
    from whisper_tpu.audio.io import read_wav
    from whisper_tpu.config import AlignmentHeadsPreset, ContextParams, DtwParams
    from whisper_tpu.decoding.segments import to_timestamp

    if preset_name == "custom":
        # reference audio_transcription.rs:85-100 — custom ahead list
        dtw = DtwParams(mode=AlignmentHeadsPreset.CUSTOM,
                        custom_aheads=((0, 0), (1, 0), (1, 1)))
    elif preset_name == "n_top":
        dtw = DtwParams(mode=AlignmentHeadsPreset.N_TOP_MOST, n_top=2)
    else:
        key = preset_name.replace(".", "_").replace("-", "_").upper()
        dtw = DtwParams(mode=AlignmentHeadsPreset[key])

    cparams = ContextParams(dtw_token_timestamps=True, dtw=dtw)
    ctx = wt.WhisperContext.new_with_params(model_path, cparams)
    state = ctx.create_state()

    params = wt.FullParams.default(wt.SamplingStrategy.GREEDY)
    params.print_progress = False
    params.token_timestamps = True

    samples, _ = read_wav(audio_path)
    if state.full(params, samples) != 0:
        print("transcription failed", file=sys.stderr)
        return 2

    for i in range(state.full_n_segments()):
        seg = state.full_get_segment(i)
        print(f"[{to_timestamp(seg.t0)} --> {to_timestamp(seg.t1)}] {seg.text}")
        for td in seg.tokens:
            if td.id < ctx.token_eot():
                txt = ctx.tokenizer.token_str(td.id)
                dtw_s = f"{td.t_dtw / 100.0:6.2f}s" if td.t_dtw >= 0 else "   n/a"
                print(f"    {txt!r:<20} t_dtw={dtw_s}  t0={td.t0} t1={td.t1} p={td.p:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
