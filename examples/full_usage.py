#!/usr/bin/env python
"""Strict-input transcription example.

Mirrors the reference's examples/full_usage/ sub-project: refuse anything
that is not a 16 kHz mono 16-bit WAV, convert i16 -> f32, run the default
params, and print "[t0 - t1]: text" lines (full_usage/src/main.rs:7-27,
whisper_sample.rs segment printing).

Usage: python examples/full_usage.py <model.bin> <audio.wav>
"""

import sys
import wave

sys.path.insert(0, ".")


def load_strict_wav(path: str):
    """Reference full_usage/src/main.rs:7-27: panic unless the WAV is
    16 kHz, mono, 16-bit integer PCM."""
    with wave.open(path, "rb") as w:
        if w.getframerate() != 16000:
            raise SystemExit("sample rate must be 16KHz")
        if w.getnchannels() != 1:
            raise SystemExit("expected mono audio file")
        if w.getsampwidth() != 2:
            raise SystemExit("expected 16-bit integer PCM")
        raw = w.readframes(w.getnframes())

    import numpy as np

    from whisper_tpu.audio.io import convert_integer_to_float_audio

    return convert_integer_to_float_audio(np.frombuffer(raw, np.int16))


def main() -> int:
    if len(sys.argv) != 3:
        print(f"usage: {sys.argv[0]} <model.bin> <audio.wav>")
        return 1

    import whisper_tpu as wt
    from whisper_tpu.decoding.segments import to_timestamp

    samples = load_strict_wav(sys.argv[2])

    ctx = wt.WhisperContext.new_with_params(sys.argv[1])
    state = ctx.create_state()
    params = wt.FullParams.default(wt.SamplingStrategy.GREEDY)

    state.full(params, samples)

    for i in range(state.full_n_segments()):
        s = state.full_get_segment(i)
        print(f"[{to_timestamp(s.t0)} - {to_timestamp(s.t1)}]: {s.text}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
