"""Log-mel frontend numerics tests (reference log_mel_spectrogram,
src/whisper.cpp:3186-3276)."""

import numpy as np
import pytest

from whisper_tpu.audio import mel as mel_mod
from whisper_tpu.config import HOP_LENGTH, N_FFT, N_SAMPLES_PER_CHUNK


def test_hann_periodic():
    w = mel_mod.hann_window()
    assert w.shape == (400,)
    assert w[0] == 0.0
    # periodic window: w[k] = 0.5*(1-cos(2*pi*k/400)) — w[200] is the peak
    np.testing.assert_allclose(w[200], 1.0, atol=1e-7)
    np.testing.assert_allclose(w[100], 0.5, atol=1e-7)


def test_filterbank_shape_and_rowsums():
    fb = mel_mod.mel_filterbank(80)
    assert fb.shape == (80, 201)
    assert (fb >= 0).all()
    # each filter has nonzero support
    assert (fb.sum(axis=1) > 0).all()


def test_frame_counts():
    n = 11 * 16000
    n_len, n_len_org = mel_mod.frame_counts(n)
    stage2 = N_FFT // 2
    assert n_len == (n + N_SAMPLES_PER_CHUNK + 2 * stage2 - N_FFT) // HOP_LENGTH
    assert n_len_org == 1 + (n + stage2 - N_FFT) // HOP_LENGTH


def test_padding_layout():
    x = np.arange(1, 1001, dtype=np.float32)
    p = mel_mod.pad_audio(x)
    # reflect: first 200 samples are x[200..1] reversed (i.e. x[1:201][::-1])
    np.testing.assert_array_equal(p[:200], x[1:201][::-1])
    np.testing.assert_array_equal(p[200:1200], x)
    assert p.shape[0] == 1000 + 200 + N_SAMPLES_PER_CHUNK + 200
    assert (p[1200:] == 0).all()


def test_jax_matches_reference_impl(jfk_like_audio):
    fb = mel_mod.mel_filterbank(80)
    got, n_len, n_len_org = mel_mod.log_mel_spectrogram(jfk_like_audio, fb)
    want = mel_mod.log_mel_reference(jfk_like_audio, fb)
    got = np.asarray(got)
    assert got.shape == want.shape == (80, n_len)
    # f32 FFT vs f64 reference: tight but not bitwise (the C path is f32 too)
    assert np.abs(got - want).max() < 2e-3


def test_output_range():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    fb = mel_mod.mel_filterbank(80)
    m, _, _ = mel_mod.log_mel_spectrogram(x, fb)
    m = np.asarray(m)
    # (x+4)/4 normalization after clamp to [max-8, max]
    assert m.max() - m.min() <= 2.0 + 1e-5


def test_zero_audio_gives_constant():
    x = np.zeros(16000, np.float32)
    fb = mel_mod.mel_filterbank(80)
    m, _, _ = mel_mod.log_mel_spectrogram(x, fb)
    m = np.asarray(m)
    # log10(1e-10) everywhere -> clamp makes all equal
    assert np.allclose(m, m[0, 0])


def test_dft_matmul_matches_rfft(jfk_like_audio):
    """The TPU matmul-DFT path and the rFFT path are numerically
    interchangeable (same program, different spectral kernel)."""
    import jax.numpy as jnp

    fb = mel_mod.mel_filterbank(80)
    x = jfk_like_audio[: 16000 * 2]
    n_len, _ = mel_mod.frame_counts(x.shape[0])
    padded = jnp.asarray(mel_mod.pad_audio(x))
    w = jnp.asarray(mel_mod.hann_window())
    f = jnp.asarray(fb)
    a = np.asarray(mel_mod._log_mel_jit(padded, w, f, n_len, use_dft_matmul=False))
    b = np.asarray(mel_mod._log_mel_jit(padded, w, f, n_len, use_dft_matmul=True))
    assert np.abs(a - b).max() < 2e-4


def test_dft_basis_exact():
    """Basis matmul reproduces np.fft.rfft on a random frame."""
    rng = np.random.default_rng(0)
    fr = rng.standard_normal(400)
    cos_b, sin_b = mel_mod.dft_basis()
    spec = np.fft.rfft(fr)
    np.testing.assert_allclose(fr @ cos_b.astype(np.float64), spec.real, atol=2e-6)
    np.testing.assert_allclose(fr @ sin_b.astype(np.float64), spec.imag, atol=2e-6)


def test_frame_counts_c_truncation():
    """C int division truncates toward zero; sub-200-sample audio exposed
    the floor-division divergence (r4 review; reference :3223)."""
    from whisper_tpu.audio.mel import frame_counts
    assert frame_counts(100)[1] == 1      # C: 1 + trunc(-100/160) = 1
    assert frame_counts(1)[1] == 0        # C: 1 + trunc(-199/160) = 1 - 1
    assert frame_counts(199)[1] == 1
    assert frame_counts(400)[1] == 2


def test_bucketed_mel_is_value_exact():
    """The 30 s compile-shape bucketing must not change a single value vs
    computing at the exact frame count (r4 review)."""
    import jax.numpy as jnp

    from whisper_tpu.audio import mel as mel_mod

    rng = np.random.default_rng(3)
    audio = (0.3 * rng.standard_normal(16000 * 2 + 57)).astype(np.float32)
    filters = mel_mod.mel_filterbank(80)
    mel, n_len, _ = mel_mod.log_mel_spectrogram(audio, filters)
    assert mel.shape[1] == n_len

    exact = mel_mod._log_mel_jit(
        jnp.asarray(mel_mod.pad_audio(audio)),
        jnp.asarray(mel_mod.hann_window()), jnp.asarray(filters), n_len,
        use_dft_matmul=False)
    np.testing.assert_array_equal(np.asarray(mel), np.asarray(exact))
