"""Audio I/O and PCM conversion utilities.

Reproduces the reference's Rust audio utilities (src/utilities.rs:21-151)
and the examples' strict WAV handling (examples/full_usage/src/main.rs:7-27):
16 kHz mono f32 is the pipeline's native format.
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np

from whisper_tpu.config import SAMPLE_RATE


def convert_integer_to_float_audio(samples: np.ndarray) -> np.ndarray:
    """i16 PCM -> f32 in [-1, 1) by /32768 (reference src/utilities.rs:21-45)."""
    return (np.asarray(samples, dtype=np.int16).astype(np.float32)) / 32768.0


def convert_stereo_to_mono_audio(samples: np.ndarray) -> np.ndarray:
    """Interleaved stereo f32 -> mono mean (reference src/utilities.rs:64-82).
    Raises on odd-length input like the reference's error path."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        if samples.size % 2 != 0:
            raise ValueError("stereo sample buffer has odd length")
        samples = samples.reshape(-1, 2)
    return samples.mean(axis=-1).astype(np.float32)


def convert_stereo_i16_to_mono_f32(samples: np.ndarray) -> np.ndarray:
    return convert_stereo_to_mono_audio(convert_integer_to_float_audio(samples))


def normalize_audio(samples: np.ndarray, peak: float = 1.0) -> np.ndarray:
    """Peak-normalize (reference src/utilities.rs:122-151)."""
    samples = np.asarray(samples, dtype=np.float32)
    mx = np.abs(samples).max() if samples.size else 0.0
    if mx == 0.0:
        return samples
    return samples * (peak / mx)


def resample_linear(samples: np.ndarray, sr_in: int, sr_out: int = SAMPLE_RATE) -> np.ndarray:
    """Linear resampler for non-16 kHz input (the reference cli shells out to
    ffmpeg for this — examples/ffmpeg-transcode.cpp; a linear fallback keeps
    the pure-Python path dependency-free)."""
    if sr_in == sr_out:
        return np.asarray(samples, dtype=np.float32)
    n_out = int(round(samples.shape[-1] * sr_out / sr_in))
    x_out = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(x_out, np.arange(samples.shape[-1]), samples).astype(np.float32)


def read_wav(path: str, require_16khz_mono: bool = False) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV file -> (float32 mono samples, sample_rate).

    Handles 8/16/24/32-bit int and 32-bit float PCM; downmixes stereo;
    optionally enforces the reference examples' strict 16 kHz mono check.
    """
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())

    if sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        vals = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16))
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        data = vals.astype(np.float32) / float(1 << 23)
    elif sw == 4:
        # Python's wave gives no format code; heuristically detect float PCM
        as_f32 = np.frombuffer(raw, dtype="<f4")
        if np.all(np.isfinite(as_f32)) and np.abs(as_f32).max(initial=0.0) <= 4.0:
            data = as_f32.astype(np.float32)
        else:
            data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / float(1 << 31)
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")

    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1).astype(np.float32)

    if require_16khz_mono and (sr != SAMPLE_RATE or n_ch != 1):
        raise ValueError(f"expected 16 kHz mono WAV, got {sr} Hz {n_ch}ch")
    if sr != SAMPLE_RATE:
        data = resample_linear(data, sr, SAMPLE_RATE)
        sr = SAMPLE_RATE
    return data, sr


def write_wav(path: str, samples: np.ndarray, sr: int = SAMPLE_RATE) -> None:
    """Write mono float32 [-1,1] samples as 16-bit PCM (test fixtures)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float32), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())
