"""Live-capture front-end tests (VERDICT r3 missing #3).

No audio hardware exists here, so the pluggable backend is driven by
FakeCaptureDevice — exactly how the reference exercises its SDL capture
with the dummy audio driver (examples/common-sdl.cpp audio_async)."""

import numpy as np
import pytest

from whisper_tpu.config import SAMPLE_RATE
from whisper_tpu.serving.capture import (
    AudioCapture,
    FakeCaptureDevice,
    run_capture_loop,
)


def _cap(len_ms=1000):
    return AudioCapture(len_ms=len_ms, backend=FakeCaptureDevice())


def test_ring_get_returns_tail():
    cap = _cap(len_ms=1000)          # ring = 16000 samples
    cap.resume()
    a = np.arange(8000, dtype=np.float32)
    cap.backend.push(a)
    got = cap.get(250)               # last 4000 samples
    np.testing.assert_array_equal(got, a[-4000:])
    cap.pause()


def test_ring_wraps_and_keeps_last_len_ms():
    cap = _cap(len_ms=1000)
    cap.resume()
    total = np.arange(40000, dtype=np.float32)    # 2.5x the ring
    for i in range(0, len(total), 3000):
        cap.backend.push(total[i:i + 3000])
    got = cap.get(1000)
    np.testing.assert_array_equal(got, total[-16000:])


def test_drain_returns_increments_once():
    cap = _cap(len_ms=1000)
    cap.resume()
    cap.backend.push(np.ones(3000, np.float32))
    cap.backend.push(2 * np.ones(2000, np.float32))
    d1 = cap.drain()
    assert len(d1) == 5000 and d1[0] == 1.0 and d1[-1] == 2.0
    assert len(cap.drain()) == 0                  # nothing new
    cap.backend.push(3 * np.ones(100, np.float32))
    d2 = cap.drain()
    np.testing.assert_array_equal(d2, 3 * np.ones(100, np.float32))


def test_drain_clamps_to_ring_on_stall():
    cap = _cap(len_ms=250)                        # 4000-sample ring
    cap.resume()
    big = np.arange(20000, dtype=np.float32)
    cap.backend.push(big)
    d = cap.drain()
    np.testing.assert_array_equal(d, big[-4000:])  # prefix lost, as designed


def test_paused_capture_drops_audio():
    cap = _cap()
    cap.resume()
    cap.backend.push(np.ones(100, np.float32))
    cap.pause()
    with pytest.raises(AssertionError):
        cap.backend.push(np.ones(100, np.float32))  # backend stopped
    assert len(cap.drain()) == 100


def test_capture_loop_equals_direct_feed(tiny_ctx):
    """End-to-end: StreamTranscriber fed from the capture loop produces the
    same committed lines as direct feed() of the same audio."""
    from whisper_tpu.serving.stream import StreamParams, StreamTranscriber

    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal(SAMPLE_RATE * 4)).astype(np.float32)
    sp = StreamParams(step_ms=1000, length_ms=2000, keep_ms=200)

    st_direct = StreamTranscriber(tiny_ctx, sp)
    for i in range(0, len(audio), SAMPLE_RATE // 2):
        st_direct.feed(audio[i:i + SAMPLE_RATE // 2])

    st_live = StreamTranscriber(tiny_ctx, sp)
    cap = AudioCapture(len_ms=4000, backend=FakeCaptureDevice())
    chunks = [audio[i:i + SAMPLE_RATE // 2]
              for i in range(0, len(audio), SAMPLE_RATE // 2)]

    def fake_sleep(_dt):
        if not chunks:
            raise KeyboardInterrupt
        cap.backend.push(chunks.pop(0))

    run_capture_loop(st_live.feed, cap, step_ms=500, sleep=fake_sleep)
    assert st_live.committed == st_direct.committed
    assert len(st_live.committed) >= 1


def test_stream_cli_capture_requires_backend(tmp_path):
    """--capture without sounddevice exits 1 with a clear message."""
    from whisper_tpu.serving import stream as stream_mod

    try:
        import sounddevice  # noqa: F401
        pytest.skip("sounddevice present; error path not reachable")
    except ImportError:
        pass

    import sys

    sys.path.insert(0, "tests")
    from test_ggml_io import _make_test_tensors
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io
    from whisper_tpu.checkpoint.init import tiny_test_hparams
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = tiny_test_hparams()
    model = str(tmp_path / "model.bin")
    ggml_io.write_ggml(model, hp, mel_filterbank(80),
                       synthetic_vocab(hp.n_vocab).id_to_token[:50256],
                       _make_test_tensors(hp))
    rc = stream_mod.main(["-m", model, "--capture", "--capture-seconds", "1"])
    assert rc == 1


def test_clear_resets_valid_window():
    """get() after clear() returns only post-clear audio — no fabricated
    zero-padding from the pre-clear ring history (audio_async::clear)."""
    cap = _cap(len_ms=1000)
    cap.resume()
    cap.backend.push(np.ones(20000, np.float32))   # wraps the 16000 ring
    cap.clear()
    fresh = np.arange(1000, dtype=np.float32)
    cap.backend.push(fresh)
    got = cap.get(1000)
    np.testing.assert_array_equal(got, fresh)      # exactly the new audio
