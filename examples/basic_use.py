#!/usr/bin/env python
"""Basic transcription example with timestamped logging.

Mirrors the reference's examples/basic_use.rs: load a model, configure
greedy params, transcribe a 16 kHz mono WAV, print timestamped segments —
with the fork's characteristic [LEVEL] wall-clock logging around each call
(reference basic_use.rs:20-60, 150-305).

Usage: python examples/basic_use.py <model.bin> <audio.wav> [language]
"""

import sys
import time

sys.path.insert(0, ".")


def log_with_timestamp(level: str, msg: str) -> None:
    """reference basic_use.rs:20-33."""
    ts = time.strftime("%Y-%m-%d %H:%M:%S")
    print(f"[{ts}] [{level}] {msg}", flush=True)


def main() -> int:
    if len(sys.argv) < 3:
        print(f"usage: {sys.argv[0]} <model.bin> <audio.wav> [language]")
        return 1
    model_path, audio_path = sys.argv[1], sys.argv[2]
    language = sys.argv[3] if len(sys.argv) > 3 else "en"

    import whisper_tpu as wt
    from whisper_tpu.audio.io import read_wav
    from whisper_tpu.decoding.segments import to_timestamp

    log_with_timestamp("INFO", f"Loading Whisper model: {model_path}")
    try:
        ctx = wt.WhisperContext.new_with_params(model_path)
    except Exception as e:
        log_with_timestamp("ERROR", f"Failed to load model: {e}")
        return 2
    log_with_timestamp("INFO", "Whisper model loaded successfully")

    state = ctx.create_state()
    log_with_timestamp("INFO", "Whisper state created successfully")

    log_with_timestamp("INFO", f"Configuring Whisper parameters for language: {language}")
    params = wt.FullParams.default(wt.SamplingStrategy.GREEDY)
    params.greedy.best_of = 1
    params.language = language
    params.print_special = False
    params.print_progress = False
    params.print_realtime = False
    params.print_timestamps = False

    log_with_timestamp("INFO", f"Reading audio file: {audio_path}")
    samples, sr = read_wav(audio_path)
    log_with_timestamp("INFO", f"Audio loaded: {len(samples)} samples @ {sr} Hz")

    log_with_timestamp("INFO", "Starting transcription...")
    t0 = time.time()
    if state.full(params, samples) != 0:
        log_with_timestamp("ERROR", "Transcription failed")
        return 3
    log_with_timestamp("INFO", f"Transcription finished in {time.time() - t0:.2f}s")

    n = state.full_n_segments()
    log_with_timestamp("INFO", f"Transcription produced {n} segments")
    for i in range(n):
        seg = state.full_get_segment(i)
        print(f"[{to_timestamp(seg.t0)} --> {to_timestamp(seg.t1)}] {seg.text}")

    print(state.print_timings(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
