"""Output writers + CLI tests (reference examples/cli/cli.cpp:433-921)."""

import io
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.api import Segment, TokenData
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams
from whisper_tpu.serving import writers


@pytest.fixture()
def segs():
    td = TokenData(id=300, tid=50363, p=0.9, plog=-0.1, pt=0.5, ptsum=0.6)
    return [
        Segment(t0=0, t1=150, text=" Hello world.", tokens=[td]),
        Segment(t0=150, t1=420, text=' He said "hi\\there".', tokens=[td]),
    ]


def test_txt(segs):
    out = writers.render("txt", segs)
    assert out == " Hello world.\n He said \"hi\\there\".\n"


def test_vtt(segs):
    out = writers.render("vtt", segs)
    lines = out.splitlines()
    assert lines[0] == "WEBVTT"
    assert lines[2] == "00:00:00.000 --> 00:00:01.500"
    assert lines[3] == " Hello world."


def test_srt(segs):
    out = writers.render("srt", segs)
    lines = out.splitlines()
    assert lines[0] == "1"
    assert lines[1] == "00:00:00,000 --> 00:00:01,500"
    assert "2" in lines[3:5]


def test_lrc(segs):
    out = writers.render("lrc", segs)
    lines = out.splitlines()
    assert lines[0] == "[by:whisper_tpu]"
    assert lines[1].startswith("[00:00.00]")
    assert lines[2].startswith("[00:01.50]")


def test_csv_escaping(segs):
    out = writers.render("csv", segs)
    lines = out.splitlines()
    assert lines[0] == "start,end,text"
    assert lines[1] == '0,1500," Hello world."'
    # rfc4180: double quotes doubled
    assert '""hi\\there""' in lines[2]


def test_json(segs):
    ctx = wt.WhisperContext.random(hp=tiny_test_hparams(),
                                   params=ContextParams(dtype="float32"))
    out = writers.render("json", segs, ctx=ctx, model_path="m.bin")
    doc = json.loads(out)
    assert doc["model"]["vocab"] == 51864
    assert doc["model"]["audio"]["layer"] == 2
    assert len(doc["transcription"]) == 2
    t = doc["transcription"][0]
    assert t["offsets"] == {"from": 0, "to": 1500}
    assert t["text"] == " Hello world."
    # full adds tokens
    out_full = writers.render("json_full", segs, ctx=ctx)
    doc2 = json.loads(out_full)
    assert "tokens" in doc2["transcription"][0]
    assert doc2["transcription"][0]["tokens"][0]["id"] == 300


def test_diarization_speaker():
    left = np.zeros(16000, np.float32)
    right = np.zeros(16000, np.float32)
    left[:8000] = 0.5
    right[8000:] = 0.5
    assert writers.estimate_diarization_speaker([left, right], 0, 50) == "(speaker 0)"
    assert writers.estimate_diarization_speaker([left, right], 50, 100, True) == "1"
    both = [np.ones(16000, np.float32)] * 2
    assert writers.estimate_diarization_speaker(both, 0, 100, True) == "?"


def test_cli_parser_defaults():
    from whisper_tpu.serving.cli import build_parser, params_from_args
    args = build_parser().parse_args(["-m", "x.bin", "-f", "a.wav"])
    p = params_from_args(args)
    assert p.greedy.best_of == 5
    assert p.temperature == 0.0
    assert p.language == "en"
    args2 = build_parser().parse_args(
        ["-m", "x.bin", "-f", "a.wav", "-bs", "5", "-tr", "-l", "de",
         "--vad", "-vt", "0.3", "-nt"])
    p2 = params_from_args(args2)
    from whisper_tpu.config import SamplingStrategy
    assert p2.strategy == SamplingStrategy.BEAM_SEARCH
    assert p2.beam_search.beam_size == 5
    assert p2.translate and p2.language == "de"
    assert p2.vad and p2.vad_params.threshold == 0.3
    assert p2.no_timestamps


def test_cli_end_to_end(tmp_path, jfk_like_audio):
    """Run the real CLI entry on a fabricated checkpoint + wav file."""
    import sys
    sys.path.insert(0, "tests")
    from test_ggml_io import _make_test_tensors
    from whisper_tpu.audio.io import write_wav
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io
    from whisper_tpu.serving.cli import main
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = tiny_test_hparams()
    model_path = str(tmp_path / "model.bin")
    vocab = synthetic_vocab(hp.n_vocab)
    ggml_io.write_ggml(model_path, hp, mel_filterbank(80),
                       vocab.id_to_token[:50256], _make_test_tensors(hp))
    wav_path = str(tmp_path / "audio.wav")
    write_wav(wav_path, jfk_like_audio[: 16000 * 2])

    out_base = str(tmp_path / "out")
    rc = main(["-m", model_path, "-f", wav_path, "-otxt", "-osrt", "-ocsv",
               "-oj", "-of", out_base, "-np", "-bo", "1"])
    assert rc == 0
    assert os.path.exists(out_base + ".txt")
    assert os.path.exists(out_base + ".srt")
    assert os.path.exists(out_base + ".csv")
    doc = json.load(open(out_base + ".json"))
    assert "transcription" in doc


def test_cli_missing_file_errors(capsys):
    from whisper_tpu.serving.cli import main
    assert main([]) == 1
    assert main(["-m", "/nonexistent.bin", "-f", "x.wav"]) == 3


def test_wts_writer(segs):
    import io as _io
    ctx = wt.WhisperContext.random(hp=tiny_test_hparams(),
                                   params=ContextParams(dtype="float32"))
    buf = _io.StringIO()
    writers.write_wts(segs, ctx, buf, "in.wav", 3.0)
    out = buf.getvalue()
    assert out.startswith("#!/bin/bash")
    assert "ffmpeg -i in.wav" in out
    assert "drawtext" in out
    assert out.rstrip().endswith("out.mp4")


def test_read_audio_data_wav_stereo(tmp_path):
    """Multi-format reader (reference examples/common-whisper.cpp:42):
    mono downmix + per-channel streams for --diarize."""
    import wave

    import numpy as np

    from whisper_tpu.audio.io import read_audio_data

    sr = 16000
    left = (np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 0.5)
    right = (np.sin(2 * np.pi * 220 * np.arange(sr) / sr) * 0.25)
    inter = np.stack([left, right], axis=1).ravel()
    pcm16 = (np.clip(inter, -1, 1) * 32767).astype("<i2")
    path = str(tmp_path / "st.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())

    mono, chans = read_audio_data(path, stereo=True)
    assert mono.shape == (sr,) and mono.dtype == np.float32
    assert chans is not None and len(chans) == 2
    np.testing.assert_allclose(chans[0], left, atol=2e-4)
    np.testing.assert_allclose(mono, (left + right) / 2, atol=2e-4)

    mono2, chans2 = read_audio_data(path)          # stereo not requested
    assert chans2 is None
    np.testing.assert_allclose(mono2, mono)


def test_multipart_binary_payload_preserved():
    """Trailing CR/LF bytes inside a binary part must survive parsing —
    a blanket strip(b'\\r\\n') corrupted WAV payloads whose final PCM
    bytes happen to be 0x0D/0x0A (r3 review)."""
    from whisper_tpu.serving.server import _parse_multipart

    payload = b"RIFFxxxx" + bytes([0, 10, 13, 10])   # ends with \n\r\n
    body = (b"--BND\r\n"
            b'Content-Disposition: form-data; name="file"; filename="a.wav"\r\n'
            b"Content-Type: audio/wav\r\n\r\n"
            + payload + b"\r\n"
            b"--BND\r\n"
            b'Content-Disposition: form-data; name="temperature"\r\n\r\n'
            b"0.0\r\n"
            b"--BND--\r\n")
    fields = _parse_multipart(body, 'multipart/form-data; boundary="BND"')
    assert fields["file"] == payload
    assert fields["temperature"].strip() == b"0.0"


def test_server_word_thold_sets_thold_pt():
    """word_thold only sets thold_pt; token_timestamps comes from
    response_format=verbose_json in the handler, and max_len defaults to
    60 like reference server.cpp:899/:919 (r4)."""
    from whisper_tpu.serving.server import _params_from_fields
    p = _params_from_fields({"word_thold": b"0.5"})
    assert p.thold_pt == 0.5
    assert p.max_len == 60                  # reference default when absent
    assert not p.no_context                 # reference default (:106)


def test_srt_offset_n(segs):
    """-on offsets SRT numbering (reference cli.cpp output_srt)."""
    import io
    from whisper_tpu.serving.writers import write_srt
    buf = io.StringIO()
    write_srt(segs, buf, offset_n=5)
    assert buf.getvalue().splitlines()[0] == "6"


def test_server_full_field_surface():
    """The /inference form fields mirror the reference server
    (server.cpp:470-598)."""
    from whisper_tpu.serving.server import _params_from_fields
    p = _params_from_fields({
        "best_of": b"3", "max_context": b"64", "audio_ctx": b"512",
        "entropy_thold": b"2.0", "logprob_thold": b"-0.5",
        "split_on_word": b"true", "tinydiarize": b"true",
        "suppress_non_speech": b"true", "no_context": b"false",
        "vad": b"true", "vad_threshold": b"0.7",
        "vad_min_speech_duration_ms": b"100",
    })
    assert p.greedy.best_of == 3 and p.n_max_text_ctx == 64
    assert p.audio_ctx == 512
    assert p.entropy_thold == 2.0 and p.logprob_thold == -0.5
    assert p.split_on_word and p.tdrz_enable and p.suppress_nst
    assert p.no_context is False
    assert p.vad and p.vad_params.threshold == 0.7
    assert p.vad_params.min_speech_duration_ms == 100


def test_read_wav_int32_and_24bit_stereo(tmp_path):
    """r4 review: int32 WAVs below half scale decoded as denormal garbage
    (a float-PCM heuristic that could only misfire — Python's wave module
    rejects real float WAVs), and 24/32-bit stereo lost its channel split."""
    import wave as _wave

    from whisper_tpu.audio.io import _read_wav_channels, read_wav

    t = np.arange(1600, dtype=np.float32) / 16000.0
    left = 0.25 * np.sin(2 * np.pi * 440 * t)     # peak well under half scale
    right = 0.10 * np.sin(2 * np.pi * 220 * t)

    # int32 mono
    p32 = str(tmp_path / "i32.wav")
    with _wave.open(p32, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(16000)
        w.writeframes((left * (1 << 31)).astype("<i4").tobytes())
    got, sr = read_wav(p32)
    assert sr == 16000
    np.testing.assert_allclose(got, left, atol=2e-9)

    # 24-bit stereo keeps channels
    inter = np.empty(2 * len(t), np.float32)
    inter[0::2], inter[1::2] = left, right
    vals = (inter * (1 << 23)).astype(np.int32) & 0xFFFFFF
    b = np.empty((len(inter), 3), np.uint8)
    b[:, 0] = vals & 0xFF
    b[:, 1] = (vals >> 8) & 0xFF
    b[:, 2] = (vals >> 16) & 0xFF
    p24 = str(tmp_path / "s24.wav")
    with _wave.open(p24, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(3)
        w.setframerate(16000)
        w.writeframes(b.tobytes())
    chans, sr, n_ch = _read_wav_channels(p24)
    assert n_ch == 2 and chans.shape == (len(t), 2)
    np.testing.assert_allclose(chans[:, 0], left, atol=2e-7)
    np.testing.assert_allclose(chans[:, 1], right, atol=2e-7)


def test_multipart_filename_before_name():
    """RFC 7578 does not order the Content-Disposition parameters: a part
    with filename before name must still be keyed by its NAME (r4 review:
    the unanchored regex grabbed the filename)."""
    from whisper_tpu.serving.server import _parse_multipart
    body = (b"--B\r\n"
            b'Content-Disposition: form-data; filename="a.wav"; name="file"\r\n'
            b"\r\npayload\r\n"
            b"--B--\r\n")
    fields = _parse_multipart(body, 'multipart/form-data; boundary="B"')
    assert fields == {"file": b"payload"}
