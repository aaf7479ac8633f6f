"""Log-mel spectrogram frontend.

Reproduces the reference numerics exactly (log_mel_spectrogram,
src/whisper.cpp:3186-3276 + worker at 3119-3183):

  - periodic Hann(400)  (fill_hann_window, src/whisper.cpp:3039-3047)
  - padding: reflect 200 samples at the start, then the signal, then
    30 s of zeros + 200 more (src/whisper.cpp:3205-3217)
  - n_len     = (padded - 400) // 160        (drop last frame)
  - n_len_org = 1 + (n + 200 - 400) // 160   (un-padded frame count)
  - power spectrum re^2+im^2 over 201 bins, mel = filters @ power,
    log10(max(mel, 1e-10)), clamp to global max-8, (x+4)/4
    (src/whisper.cpp:3155-3181 + 3244-3260)

The reference special-cases all-zero frames to log10(1e-10); computing the
FFT on those zero frames yields the same value, so the vectorized version
below computes every frame uniformly — one batched rFFT + one MXU matmul
instead of the reference's multithreaded per-frame radix-2 FFT.

The TPU-first design computes the whole spectrogram as a single jitted
program: framing via gather-free reshape/slice, rFFT via jnp.fft (XLA), and
the 201->n_mel projection as a matmul that XLA fuses with the log/clamp.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import (
    HOP_LENGTH,
    N_FFT,
    N_SAMPLES_PER_CHUNK,
    SAMPLE_RATE,
)

N_FFT_BINS = N_FFT // 2 + 1  # 201


@functools.lru_cache(maxsize=1)
def dft_basis() -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis (cos, -sin), each (N_FFT, 201) float32: the power
    spectrum becomes two MXU matmuls — the Silero-STFT-as-conv trick
    (reference src/whisper.cpp:4500-4520) applied to the whisper frontend.
    jnp.fft lowers poorly on TPU; a 400x201 matmul is ~1 MXU pass."""
    k = np.arange(N_FFT_BINS, dtype=np.float64)[None, :]
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * k * n / N_FFT
    return (np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32))


def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann (reference fill_hann_window with periodic=true)."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def mel_filterbank(
    n_mels: int = 80, n_fft: int = N_FFT, sr: int = SAMPLE_RATE
) -> np.ndarray:
    """Slaney-normalized mel filterbank, (n_mels, n_fft//2+1) float32.

    Matches librosa.filters.mel(htk=False, norm="slaney"), which is what the
    checkpoints' embedded filters were generated with (OpenAI whisper
    audio.py mel_filters). Real checkpoints carry their own filters
    (reference src/whisper.cpp:1594-1604); this standalone version covers
    stub/random models and the VAD STFT path.
    """
    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def pad_audio(samples: np.ndarray) -> np.ndarray:
    """Reference padding (src/whisper.cpp:3205-3217): reflect 200 at the
    start, 30 s zeros + 200 at the end."""
    n = samples.shape[-1]
    stage_2 = N_FFT // 2  # 200
    head = samples[..., 1 : 1 + stage_2][..., ::-1]
    tail_len = N_SAMPLES_PER_CHUNK + stage_2
    tail = np.zeros(samples.shape[:-1] + (tail_len,), dtype=np.float32)
    return np.concatenate([head, samples.astype(np.float32), tail], axis=-1)


def frame_counts(n_samples: int) -> Tuple[int, int]:
    """(n_len, n_len_org) — total padded frames vs original-signal frames
    (reference src/whisper.cpp:3218-3223). C integer division truncates
    TOWARD ZERO; Python's // floors — they differ when the n_len_org
    numerator goes negative (audio < 200 samples), so use int(a/b)
    truncation like the C code (r4 review)."""
    stage_2 = N_FFT // 2
    padded = n_samples + N_SAMPLES_PER_CHUNK + 2 * stage_2
    n_len = (padded - N_FFT) // HOP_LENGTH           # numerator always > 0
    n_len_org = 1 + int((n_samples + stage_2 - N_FFT) / HOP_LENGTH)
    return n_len, n_len_org


@functools.partial(jax.jit, static_argnames=("n_len", "use_dft_matmul"))
def _log_mel_jit(
    padded: jax.Array,       # (n_padded,) float32
    window: jax.Array,       # (400,)
    filters: jax.Array,      # (n_mel, 201)
    n_len: int,
    use_dft_matmul: bool = False,
) -> jax.Array:
    # frame: (n_len, 400) — as_strided-style gather; XLA turns this into
    # efficient dynamic slices
    idx = jnp.arange(n_len)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    frames = padded[idx] * window[None, :]

    if use_dft_matmul:
        # TPU path: DFT as two f32 matmuls on the MXU (dft_basis docstring)
        cos_b, sin_b = dft_basis()
        re = jnp.dot(frames, jnp.asarray(cos_b),
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, jnp.asarray(sin_b),
                     preferred_element_type=jnp.float32)
        power = re * re + im * im                        # (n_len, 201)
    else:
        spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2

    mel = power @ filters.T                              # (n_len, n_mel)
    logmel = jnp.log10(jnp.maximum(mel, 1e-10))

    mmax = jnp.max(logmel) - 8.0
    logmel = jnp.maximum(logmel, mmax)
    return ((logmel + 4.0) / 4.0).T                      # (n_mel, n_len)


def log_mel_spectrogram(
    samples: np.ndarray,
    filters: np.ndarray,
    device=None,
) -> Tuple[jax.Array, int, int]:
    """Full-precision log-mel. Returns (mel[n_mel, n_len], n_len, n_len_org).

    Matches whisper.cpp numerics; the whole computation is one XLA program.
    """
    samples = np.asarray(samples, dtype=np.float32)
    n_len, n_len_org = frame_counts(samples.shape[-1])
    padded = pad_audio(samples)
    # bucket the STATIC frame count to 30 s granularity so arbitrary-length
    # inputs don't each compile a fresh XLA program (r4 review: a server
    # recompiled the whole mel pipeline per unique upload length). The
    # extra frames read trailing zeros and produce the clamp floor (-10
    # before normalization), which cannot raise the spectrogram max, so
    # slicing back to n_len is value-exact.
    n_len_b = -(-n_len // 3000) * 3000
    need = (n_len_b - 1) * HOP_LENGTH + N_FFT
    if need > padded.shape[-1]:
        padded = np.concatenate(
            [padded, np.zeros(padded.shape[:-1] + (need - padded.shape[-1],),
                              np.float32)], axis=-1)
    mel = _log_mel_jit(
        jnp.asarray(padded), jnp.asarray(hann_window()), jnp.asarray(filters),
        n_len_b,
        # TPU: matmul-DFT rides the MXU; elsewhere the rFFT is faster
        use_dft_matmul=jax.default_backend() == "tpu",
    )
    return mel[:, :n_len], n_len, n_len_org


def log_mel_reference(samples: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """Slow float64 host implementation used as the golden model in tests
    (mirrors the C algorithm step-for-step, incl. the all-zero-frame
    shortcut). Independent of the JAX path above."""
    samples = np.asarray(samples, dtype=np.float32)
    n = samples.shape[0]
    stage_2 = N_FFT // 2
    padded = pad_audio(samples)
    n_len, _ = frame_counts(n)
    window = hann_window().astype(np.float64)
    n_samples_eff = n + stage_2

    out = np.full((filters.shape[0], n_len), np.log10(1e-10), dtype=np.float64)
    n_compute = min(n_samples_eff // HOP_LENGTH + 1, n_len)
    for i in range(n_compute):
        off = i * HOP_LENGTH
        fr = padded[off : off + N_FFT].astype(np.float64) * window
        spec = np.fft.rfft(fr, n=N_FFT)
        power = spec.real**2 + spec.imag**2
        melrow = filters.astype(np.float64) @ power
        out[:, i] = np.log10(np.maximum(melrow, 1e-10))

    mmax = out.max() - 8.0
    out = np.maximum(out, mmax)
    return ((out + 4.0) / 4.0).astype(np.float32)
