#!/usr/bin/env python
"""Chinese transcription example.

Mirrors the reference's examples/chinese_test.rs: multilingual model,
language="zh", temperature 0.0 greedy, UTF-8 segment output (reference
chinese_test.rs:190-202).

Usage: python examples/chinese_test.py <multilingual-model.bin> <audio.wav>
"""

import sys

sys.path.insert(0, ".")


def main() -> int:
    if len(sys.argv) < 3:
        print(f"usage: {sys.argv[0]} <model.bin> <audio.wav>")
        return 1
    model_path, audio_path = sys.argv[1], sys.argv[2]

    import whisper_tpu as wt
    from whisper_tpu.audio.io import read_wav
    from whisper_tpu.decoding.segments import to_timestamp

    ctx = wt.WhisperContext.new_with_params(model_path)
    if not ctx.is_multilingual():
        print("warning: model is English-only; zh will be ignored", file=sys.stderr)

    state = ctx.create_state()
    params = wt.FullParams.default(wt.SamplingStrategy.GREEDY)
    params.language = "zh"
    params.temperature = 0.0           # reference chinese_test.rs:196
    params.print_progress = False

    samples, _ = read_wav(audio_path)
    if state.full(params, samples) != 0:
        print("transcription failed", file=sys.stderr)
        return 2

    print("转录结果 (transcription):")
    for i in range(state.full_n_segments()):
        seg = state.full_get_segment(i)
        print(f"[{to_timestamp(seg.t0)} --> {to_timestamp(seg.t1)}] {seg.text}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
