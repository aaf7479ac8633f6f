"""Silero-VAD tests (reference tests/test-vad.cpp character: prob count and
segment structure on known audio; plus format round-trip and remap math)."""

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams, FullParams, VadParams
from whisper_tpu.models import vad as vad_mod


@pytest.fixture(scope="module")
def vad_model():
    return vad_mod.random_vad_model()


def test_model_file_roundtrip(tmp_path, vad_model):
    path = str(tmp_path / "vad.bin")
    vad_mod.write_vad_ggml(path, vad_model)
    loaded = vad_mod.read_vad_ggml(path)
    assert loaded.hparams == vad_model.hparams
    assert loaded.model_type == vad_model.model_type
    assert set(loaded.params) == set(vad_model.params)
    for k in vad_model.params:
        np.testing.assert_array_equal(loaded.params[k], vad_model.params[k])


def test_detect_speech_prob_count(vad_model):
    # reference test-vad.cpp expects n_probs == ceil(n_samples / 512)
    samples = np.zeros(16000 * 2 + 100, np.float32)
    probs = vad_mod.detect_speech(vad_model, samples)
    assert len(probs) == -(-len(samples) // 512)
    assert ((0 <= probs) & (probs <= 1)).all()


def test_stft_magnitude_matches_numpy_dft(vad_model):
    """The random model's DFT basis must produce |DFT| of the windowed
    chunk — checks the conv-as-STFT wiring."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    chunk = rng.standard_normal(512).astype(np.float32) * 0.1
    hp = vad_model.hparams
    # replicate the internal padding + first conv
    left = chunk[1:65][::-1]
    right = chunk[-65:-1][::-1]
    padded = np.concatenate([left, chunk, right])
    # frame 0 = padded[0:256]
    want = np.abs(np.fft.rfft(padded[:256], n=256)[:129])
    stft = vad_mod._conv1d_nwc(
        jnp.asarray(padded)[None, :, None],
        vad_model.params["_model.stft.forward_basis_buffer"],
        np.zeros(258, np.float32), stride=128, padding=0)
    got = np.asarray(stft)[0, 0]
    mag = np.sqrt(got[:129] ** 2 + got[129:258] ** 2)
    np.testing.assert_allclose(mag, want, rtol=1e-3, atol=1e-3)


def test_segments_from_probs_basic():
    p = VadParams()
    # 100 windows of 512 samples = 3.2 s; speech in windows 20..60
    probs = np.zeros(100, np.float32)
    probs[20:60] = 0.9
    segs = vad_mod.segments_from_probs(probs, p)
    assert len(segs) == 1
    s = segs[0]
    # ~20*512 samples = 0.64 s = 64 cs, minus 30 ms pad
    assert abs(s.start - (64 - 3)) <= 1
    assert s.end > s.start


def test_segments_hysteresis_short_silence_ignored():
    p = VadParams()  # min_silence 100 ms = ~3 windows
    probs = np.zeros(200, np.float32)
    probs[10:50] = 0.9
    probs[51:90] = 0.9   # 1-window dip -> should NOT split
    segs = vad_mod.segments_from_probs(probs, p)
    assert len(segs) == 1


def test_segments_min_speech_filtered():
    p = VadParams()  # min speech 250 ms = ~8 windows
    probs = np.zeros(100, np.float32)
    probs[10:14] = 0.9   # only 4 windows ≈ 128 ms
    segs = vad_mod.segments_from_probs(probs, p)
    assert segs == []


def test_time_mapping_interpolation():
    mapping = [(0, 100), (100, 300), (200, 1000)]
    f = vad_mod.map_processed_to_original_time
    assert f(-5, mapping) == 100
    assert f(0, mapping) == 100
    assert f(50, mapping) == 200       # midpoint of (0,100)->(100,300)
    assert f(100, mapping) == 300
    assert f(150, mapping) == 650
    assert f(250, mapping) == 1000     # beyond end clamps


def test_full_with_vad(tmp_path, vad_model, jfk_like_audio):
    """End-to-end: full() with VAD enabled filters audio then transcribes."""
    path = str(tmp_path / "vad.bin")
    vad_mod.write_vad_ggml(path, vad_model)
    ctx = wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"))
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    p.vad = True
    p.vad_model_path = path
    # random VAD weights: probs hover near sigmoid(~0) = 0.5; set threshold
    # low so the test exercises the splice+remap path deterministically
    p.vad_params.threshold = 0.01
    assert st.full(p, jfk_like_audio[: 16000 * 3]) == 0
    # whatever was transcribed must carry remapped (valid) times
    for i in range(st.full_n_segments()):
        s = st.full_get_segment(i)
        assert s.t1 >= s.t0 >= 0


def test_full_with_vad_no_speech(tmp_path, vad_model):
    path = str(tmp_path / "vad.bin")
    vad_mod.write_vad_ggml(path, vad_model)
    ctx = wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"))
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    p.vad = True
    p.vad_model_path = path
    p.vad_params.threshold = 0.999  # nothing passes
    assert st.full(p, np.zeros(16000, np.float32)) == 0
    assert st.full_n_segments() == 0


def test_vad_segments_tool(tmp_path, vad_model, jfk_like_audio, capsys):
    """Standalone printer (reference examples/vad-speech-segments/speech.cpp)."""
    from whisper_tpu.audio.io import write_wav
    from whisper_tpu.serving import vad_segments

    mpath = str(tmp_path / "vad.bin")
    vad_mod.write_vad_ggml(mpath, vad_model)
    wpath = str(tmp_path / "a.wav")
    write_wav(wpath, jfk_like_audio)

    rc = vad_segments.main(["-f", wpath, "-vm", mpath, "-vt", "0.3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "speech segments:" in out
    first = out.splitlines()[1]
    assert first.startswith("Detected ")

    # missing file -> error code 2 (speech.cpp returns 2 on read failure)
    rc = vad_segments.main(["-f", str(tmp_path / "nope.wav"), "-vm", mpath])
    assert rc == 2


def test_convert_silero_torch_roundtrip(tmp_path):
    """torch state dict -> ggml -> read_vad_ggml -> detect_speech
    (reference models/convert-silero-vad-to-ggml.py)."""
    torch = pytest.importorskip("torch")

    from whisper_tpu.checkpoint import convert_silero

    ref = vad_mod.random_vad_model(seed=7)
    # fabricate a silero-style state dict: same tensors, torch-shaped,
    # WITHOUT the _model. prefix on some keys + an _8k branch to drop
    sd = {}
    for k, v in ref.params.items():
        t = torch.from_numpy(np.asarray(v))
        if k == "_model.decoder.decoder.2.weight":
            t = t.reshape(1, 128, 1)
        sd[k[len("_model."):]] = t          # exercise prefix normalization
    sd["_model_8k.encoder.0.reparam_conv.weight"] = torch.zeros(1)

    model = convert_silero.convert_silero_state_dict(sd, version="5.1.2")
    assert model.version == "5.1.2"
    for k in ref.params:
        np.testing.assert_allclose(model.params[k].reshape(ref.params[k].shape),
                                   ref.params[k], rtol=1e-6)

    out = str(tmp_path / "vad-ggml.bin")
    sd_path = str(tmp_path / "sd.pt")
    torch.save(sd, sd_path)
    rc = convert_silero.main(["--output", out, "--state-dict", sd_path])
    assert rc == 0

    loaded = vad_mod.read_vad_ggml(out)
    probs = vad_mod.detect_speech(loaded, np.zeros(4096, np.float32))
    ref_probs = vad_mod.detect_speech(ref, np.zeros(4096, np.float32))
    np.testing.assert_allclose(probs, ref_probs, atol=1e-5)


def test_vad_context_object_api(tmp_path, vad_model, jfk_like_audio):
    """whisper.h:675-716 object surface: init_from_file_with_params,
    detect_speech -> n_probs/probs, segments_from_probs/samples."""
    import whisper_tpu as wt
    from whisper_tpu.config import VadParams

    path = str(tmp_path / "vad.bin")
    vad_mod.write_vad_ggml(path, vad_model)
    vctx = wt.VadContext.init_from_file_with_params(path)

    audio = jfk_like_audio[: 16000 * 2]
    assert vctx.detect_speech(audio)
    n_win = vad_model.hparams.n_window
    assert vctx.n_probs == -(-len(audio) // n_win)
    assert vctx.probs.shape == (vctx.n_probs,)
    assert np.all((vctx.probs >= 0) & (vctx.probs <= 1))

    p = VadParams(threshold=0.0)   # everything is speech
    segs = vctx.segments_from_probs(p)
    assert segs and segs[0].start == 0
    # one-call variant must agree with the two-step path
    segs2 = vctx.segments_from_samples(p, audio)
    assert [(s.start, s.end) for s in segs] == [(s.start, s.end) for s in segs2]
    # and with the functional API
    segs3 = vad_mod.vad_segments_from_samples(vad_model, audio, p)
    assert [(s.start, s.end) for s in segs] == [(s.start, s.end) for s in segs3]
