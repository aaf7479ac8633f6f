"""Example programs + voice-command detector tests (reference
examples/basic_use.rs, audio_transcription.rs, chinese_test.rs,
whisper.cpp examples/command)."""

import subprocess
import sys

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams
from whisper_tpu.serving.command import CommandDetector, CommandParams


@pytest.fixture(scope="module")
def model_file(tmp_path_factory):
    sys.path.insert(0, "tests")
    from test_ggml_io import _make_test_tensors
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = tiny_test_hparams()
    path = str(tmp_path_factory.mktemp("ex") / "model.bin")
    ggml_io.write_ggml(path, hp, mel_filterbank(80),
                       synthetic_vocab(hp.n_vocab).id_to_token[:50256],
                       _make_test_tensors(hp))
    return path


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory, ):
    from whisper_tpu.audio.io import write_wav
    rng = np.random.default_rng(0)
    p = tmp_path_factory.mktemp("exw") / "a.wav"
    write_wav(str(p), (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32))
    return str(p)


def _run_example(name, *args):
    root = __import__("pathlib").Path(__file__).resolve().parents[1]
    return subprocess.run(
        [sys.executable, str(root / "examples" / name), *args],
        capture_output=True, text=True, timeout=400, cwd=str(root),
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"})


def test_basic_use_example(model_file, wav_file):
    r = _run_example("basic_use.py", model_file, wav_file)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[INFO] Whisper model loaded successfully" in r.stdout
    assert "-->" in r.stdout


def test_basic_use_bad_model(wav_file):
    r = _run_example("basic_use.py", "/missing.bin", wav_file)
    assert r.returncode == 2
    assert "[ERROR] Failed to load model" in r.stdout


def test_chinese_example_warns_on_english_model(model_file, wav_file):
    r = _run_example("chinese_test.py", model_file, wav_file)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "English-only" in r.stderr
    assert "转录结果" in r.stdout


def test_audio_transcription_dtw_example(model_file, wav_file):
    r = _run_example("audio_transcription.py", model_file, wav_file, "custom")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "t_dtw=" in r.stdout


def test_full_usage_example(model_file, wav_file):
    r = _run_example("full_usage.py", model_file, wav_file)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "]: " in r.stdout and " - " in r.stdout


def test_full_usage_rejects_wrong_rate(model_file, tmp_path):
    # reference full_usage/src/main.rs:7-27 panics on non-16 kHz input
    import wave
    p = str(tmp_path / "bad.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 800)
    r = _run_example("full_usage.py", model_file, p)
    assert r.returncode != 0
    assert "sample rate must be 16KHz" in (r.stdout + r.stderr)


# ------------------------------------------------------------------ command

def test_command_matching_logic():
    ctx = wt.WhisperContext.random(hp=tiny_test_hparams(),
                                   params=ContextParams(dtype="float32"))
    det = CommandDetector(ctx, ["turn on the light", "turn off the light",
                                "stop"], CommandParams())
    cmd, score = det.best_command("turn on the light")
    assert cmd == "turn on the light" and score == 0.0
    cmd, _ = det.best_command("turn off light")     # close match
    assert cmd == "turn off the light"
    cmd, score = det.best_command("completely unrelated words here")
    assert cmd is None


def test_command_feed_detects_utterance():
    ctx = wt.WhisperContext.random(hp=tiny_test_hparams(),
                                   params=ContextParams(dtype="float32"))
    det = CommandDetector(ctx, ["go"], CommandParams())
    rng = np.random.default_rng(1)
    loud = (0.4 * rng.standard_normal(16000 * 2)).astype(np.float32)
    silence = np.zeros(16000 * 2, np.float32)
    events = det.feed(np.concatenate([loud, silence]))
    # utterance detected (random weights: text won't match "go" — that's ok)
    assert len(events) == 1
    cmd, text = events[0]
    assert isinstance(text, str)
