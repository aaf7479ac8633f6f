"""WER/normalizer + download-tool tests (reference tests/librispeech/eval.py,
models/download-ggml-model.sh)."""

import os

import numpy as np
import pytest

from whisper_tpu.eval.wer import EnglishTextNormalizer, wer, wer_details
from whisper_tpu.tools.download import MODELS, main as dl_main, model_url


def test_wer_identical():
    assert wer(["hello world"], ["hello world"]) == 0.0


def test_wer_counts():
    d = wer_details("the quick brown fox", "the quik brown", normalize=False)
    assert d["sub"] == 1 and d["del"] == 1 and d["ins"] == 0
    assert d["wer"] == pytest.approx(2 / 4)


def test_wer_insertions():
    d = wer_details("a b", "a x b y", normalize=False)
    assert d["ins"] == 2
    assert d["wer"] == pytest.approx(1.0)


def test_corpus_wer_weighted():
    refs = ["one two three four", "five"]
    hyps = ["one two three four", "six"]
    assert wer(refs, hyps) == pytest.approx(1 / 5)


def test_normalizer_basics():
    n = EnglishTextNormalizer()
    assert n("Hello, World!") == "hello world"
    assert n("I'm won't we're") == "i am will not we are"
    assert n("Mr. Smith") == "mister smith"
    # full protocol normalizer: currency word binds behind the amount
    assert n("1,000 dollars.") == "$1000"
    assert n("[noise] (laughs) ok") == "ok"


def test_normalized_wer_forgiving():
    assert wer(["Hello, World!"], ["hello world"], normalize=True) == 0.0


def test_model_url_table():
    assert len(MODELS) >= 25
    assert model_url("tiny").endswith("/ggml-tiny.bin")
    assert model_url("large-v3-q5_0").endswith("/ggml-large-v3-q5_0.bin")
    assert "whisper-vad" in model_url("silero-v5.1.2")
    with pytest.raises(ValueError):
        model_url("bogus")


def test_download_cli_list_and_errors(capsys):
    assert dl_main(["--list"]) == 0
    assert "large-v3" in capsys.readouterr().out
    assert dl_main(["bogus"]) == 1
    assert dl_main(["tiny", "--url-only"]) == 0
    assert "ggml-tiny.bin" in capsys.readouterr().out


def test_librispeech_runner_layout(tmp_path, jfk_like_audio, capsys):
    """End-to-end on a fabricated mini LibriSpeech split: the pipeline must
    produce a finite corpus WER number (VERDICT r1 item 9 — the harness
    must not be write-only code)."""
    import sys
    sys.path.insert(0, "tests")
    from test_ggml_io import _make_test_tensors
    from whisper_tpu.audio.io import write_wav
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io
    from whisper_tpu.checkpoint.init import tiny_test_hparams
    from whisper_tpu.eval.librispeech import main as eval_main
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = tiny_test_hparams()
    model_path = str(tmp_path / "model.bin")
    ggml_io.write_ggml(model_path, hp, mel_filterbank(80),
                       synthetic_vocab(hp.n_vocab).id_to_token[:50256],
                       _make_test_tensors(hp))
    d = tmp_path / "LibriSpeech" / "test-clean" / "1" / "2"
    d.mkdir(parents=True)
    write_wav(str(d / "1-2-0001.wav"), jfk_like_audio[: 16000 * 2])
    write_wav(str(d / "1-2-0002.wav"), jfk_like_audio[16000 : 16000 * 4])
    (d / "1-2.trans.txt").write_text(
        "1-2-0001 HELLO WORLD\n1-2-0002 ASK NOT WHAT YOUR COUNTRY CAN DO\n")
    hyp_dir = tmp_path / "hyps"
    hyp_dir.mkdir()

    rc = eval_main(["-m", model_path, "-d", str(tmp_path / "LibriSpeech"),
                    "--hyp-dir", str(hyp_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    # a real corpus WER line with a finite value (random weights -> high
    # WER, but the number must exist and be a float)
    import re
    m = re.search(r"WER: ([0-9.]+)%\s+\((\d+) utterances\)", out)
    assert m, f"no WER line in output: {out!r}"
    score, n_utt = float(m.group(1)), int(m.group(2))
    assert np.isfinite(score) and score >= 0.0
    assert n_utt == 2
    # per-utterance hypothesis files were written
    assert sorted(p.name for p in hyp_dir.iterdir()) == [
        "1-2-0001.txt", "1-2-0002.txt"]


def test_micro_bench_cpu(capsys):
    """Roofline micro-bench tool (reference whisper_bench_memcpy /
    whisper_bench_ggml_mul_mat, include/whisper.h:722-725)."""
    import json

    from whisper_tpu.tools.micro_bench import main

    assert main(["--mib", "8", "--sizes", "256"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["membw_gbps"] > 0
    # fusion/folding guard: a slope-timed roll chain can't exceed any
    # plausible memory system by orders of magnitude
    assert out["membw_gbps"] < 100000.0
    assert out["mul_mat"]["256"]["bf16_tflops"] > 0
    assert "q8_tflops" in out["mul_mat"]["256"] or "q8_error" in out["mul_mat"]["256"]


def test_earnings21_runner(tmp_path, jfk_like_audio, capsys):
    """Earnings-21 layout: media/*.wav + transcripts/nlp_references/*.nlp
    (reference tests/earnings21/eval.py)."""
    from test_ggml_io import _make_test_tensors

    from whisper_tpu.audio.io import write_wav
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io
    from whisper_tpu.checkpoint.init import tiny_test_hparams
    from whisper_tpu.eval import earnings21
    from whisper_tpu.tokenizer import synthetic_vocab

    root = tmp_path / "earnings21"
    (root / "media").mkdir(parents=True)
    (root / "transcripts" / "nlp_references").mkdir(parents=True)
    write_wav(str(root / "media" / "call1.wav"), jfk_like_audio[:32000])
    (root / "transcripts" / "nlp_references" / "call1.nlp").write_text(
        "token|speaker|ts\nhello|a|0\nworld|a|1\n")

    assert earnings21.load_nlp_reference(
        str(root / "transcripts" / "nlp_references" / "call1.nlp")) == "hello world"

    hp = tiny_test_hparams()
    path = str(tmp_path / "m.bin")
    ggml_io.write_ggml(path, hp, mel_filterbank(80),
                       synthetic_vocab(hp.n_vocab).id_to_token[:50256],
                       _make_test_tensors(hp))
    rc = earnings21.main(["-m", path, "-d", str(root)])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("WER:") and "(1 files)" in out


def test_edit_distance_matches_backtrace_dp():
    """The vectorized two-row distance must equal S+D+I from the full
    backtracing DP on random word sequences (r4: wer() switched to it)."""
    import random

    from whisper_tpu.eval.wer import _edit_distance, _edit_ops

    rng = random.Random(7)
    vocab = list("abcdefg")
    for _ in range(200):
        r = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        h = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        S, D, I = _edit_ops(r, h)
        assert _edit_distance(r, h) == S + D + I, (r, h)
