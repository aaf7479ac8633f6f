"""End-to-end full() pipeline tests (reference whisper_full_with_state,
src/whisper.cpp:6795-7711; test character mirrors the reference's
stub-model ctest suite, tests/CMakeLists.txt:18-91)."""

import os

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams, FullParams, SamplingStrategy


@pytest.fixture(scope="module")
def ctx():
    return wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"), seed=0)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(1)
    return (0.1 * rng.standard_normal(16000 * 4)).astype(np.float32)


def test_greedy_full(ctx, audio):
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    assert st.full(p, audio) == 0
    assert st.full_n_segments() >= 1
    for i in range(st.full_n_segments()):
        s = st.full_get_segment(i)
        assert s.t1 > s.t0 >= 0
        assert isinstance(s.text, str)
        assert len(s.tokens) > 0
    # all-text getter concatenates segments
    assert st.full_get_all_text() == "".join(
        st.full_get_segment_text(i) for i in range(st.full_n_segments()))


def test_greedy_deterministic(ctx, audio):
    p = FullParams.default()
    p.print_progress = False
    st1, st2 = ctx.create_state(), ctx.create_state()
    st1.full(p, audio)
    st2.full(p, audio)
    assert st1.full_get_all_text() == st2.full_get_all_text()


def test_token_data_fields(ctx, audio):
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    st.full(p, audio)
    td = st.full_get_token_data(0, 0)
    assert 0 <= td.p <= 1.0
    assert td.plog <= 0.0
    assert 0 <= td.pt <= 1.0 + 1e-6
    # tid == 0 is the reference's :6437 init when the timestamp mass
    # underflows to exactly 0 (bug-for-bug, see filters.timestamp_stats)
    assert td.tid >= ctx.token_beg() or td.tid == 0


def test_beam_search_full(ctx, audio):
    st = ctx.create_state()
    p = FullParams.default(SamplingStrategy.BEAM_SEARCH)
    p.beam_search.beam_size = 3
    p.print_progress = False
    assert st.full(p, audio) == 0
    assert st.full_n_segments() >= 1


def test_short_input_returns_no_segments(ctx):
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    st.full(p, np.zeros(800, np.float32))  # 50 ms < 100 ms minimum
    assert st.full_n_segments() == 0


def test_stub_model_skips_decode(audio):
    """Zero-tensor checkpoint exercises the full pipeline without weights
    (reference n_loaded == 0 short-circuit)."""
    import io
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io
    hp = tiny_test_hparams()
    buf = io.BytesIO()
    ggml_io.write_ggml(buf, hp, mel_filterbank(80), [b"t"] * 300, {})
    buf.seek(0)
    ctx = wt.WhisperContext.from_buffer(buf.getvalue(),
                                        ContextParams(dtype="float32"))
    assert ctx.is_stub
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    assert st.full(p, audio) == 0
    assert st.full_n_segments() == 0


def test_offset_and_duration(ctx, audio):
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    p.offset_ms = 1000
    p.duration_ms = 2000
    st.full(p, audio)
    for i in range(st.full_n_segments()):
        assert st.full_get_segment_t0(i) >= 100  # >= offset in centiseconds


def test_callbacks_and_abort(ctx, audio):
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    events = []
    p.progress_callback = lambda c, s, pct: events.append(("progress", pct))
    p.new_segment_callback = lambda c, s, seg: events.append(("segment", seg.text))
    p.encoder_begin_callback = lambda c, s: True
    st.full(p, audio)
    assert any(e[0] == "progress" for e in events)
    assert any(e[0] == "segment" for e in events)
    # encoder_begin returning False aborts before decoding
    st2 = ctx.create_state()
    p2 = FullParams.default()
    p2.print_progress = False
    p2.encoder_begin_callback = lambda c, s: False
    st2.full(p2, audio)
    assert st2.full_n_segments() == 0


def test_single_segment_mode(ctx, audio):
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    p.single_segment = True
    st.full(p, audio)
    assert st.full_n_segments() <= 1


def test_no_timestamps_mode(ctx, audio):
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    p.no_timestamps = True
    st.full(p, audio)
    # segments may exist; none of their tokens may be timestamp tokens
    for i in range(st.full_n_segments()):
        for td in st.full_get_segment(i).tokens:
            assert td.id < ctx.token_beg()


def test_initial_prompt(ctx, audio):
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    p.initial_prompt = "hello"
    assert st.full(p, audio) == 0


def test_lang_detect_multilingual(audio):
    hp = tiny_test_hparams(n_vocab=51865)
    mctx = wt.WhisperContext.random(hp=hp, params=ContextParams(dtype="float32"))
    st = mctx.create_state()
    st.pcm_to_mel(audio)
    lang_id, probs = st.lang_detect()
    assert 0 <= lang_id <= 99
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-4)


def test_api_accessor_parity(tiny_ctx):
    """whisper.h getters added for API-surface parity: token_solm,
    token_to_str, get_logits, get/reset_timings."""
    import numpy as np

    ctx = tiny_ctx
    assert ctx.token_solm() == ctx.vocab.token_solm
    s = ctx.token_to_str(ctx.token_eot())
    assert isinstance(s, str)

    st = ctx.create_state()
    assert st.get_logits() is None
    audio = np.zeros(16000, np.float32)
    st.pcm_to_mel(audio)
    st.encode(0)
    kv = st.new_kv_cache(1)
    logits, kv = st.decode([ctx.token_sot()], 0, kv)
    gl = st.get_logits()
    assert gl is not None and gl.shape == (1, ctx.n_vocab())
    np.testing.assert_array_equal(gl[0], np.asarray(logits)[0, -1])

    assert st.get_timings()["decode"]["calls"] >= 1
    st.reset_timings()
    assert st.get_timings() == {}


def test_context_warmup(tiny_ctx):
    """ctx.warmup pre-populates the jit caches (reference
    whisper_init_state worst-case graph prealloc, src/whisper.cpp:3488-3558)
    without touching caller-visible state."""
    from whisper_tpu.config import FullParams

    tiny_ctx.warmup(FullParams.default())
    st = tiny_ctx.create_state()
    assert st.segments == []  # warmup used a throwaway state


def test_profiling_trace_noop_and_dir(tmp_path):
    from whisper_tpu.utils.profiling import annotate, trace

    with trace(None):        # no-op path
        pass
    d = str(tmp_path / "prof")
    with trace(d):
        import jax.numpy as jnp
        with annotate("warm"):
            (jnp.ones(8) + 1).block_until_ready()
    assert os.path.isdir(d) and os.listdir(d)


def test_no_host_weight_copy_pinned(tmp_path):
    """Contexts built via the public constructors must NOT pin a host copy
    of the weights (VERDICT r2: ~2 GB at large-v3 per context whether or
    not the CPU twin is used); the twin rebuilds from the checkpoint."""
    import sys
    sys.path.insert(0, "tests")
    from test_ggml_io import _make_test_tensors
    import whisper_tpu as wt
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io, quant
    from whisper_tpu.checkpoint.init import tiny_test_hparams
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = tiny_test_hparams()
    path = str(tmp_path / "m.bin")
    ggml_io.write_ggml(path, hp, mel_filterbank(80),
                       synthetic_vocab(hp.n_vocab).id_to_token[:50256],
                       _make_test_tensors(hp, ttype=quant.GGML_TYPE_F16))
    ctx = wt.WhisperContext.new_with_params(path)
    assert ctx._host_params is None          # dropped after device upload
    assert ctx._rebuild_host is not None
    # the rebuild closure reproduces the weight tree (twin path on relays)
    rebuilt = ctx._rebuild_host()
    assert set(rebuilt) == set(ctx.params)
    # on the CPU backend the twin IS the context (no duplicate copy)
    import jax
    if jax.default_backend() == "cpu":
        assert ctx.cpu_twin() is ctx


def test_distil_forced_no_timestamps_reaches_filters(audio):
    """Distil detection (n_text_layer==2 && n_vocab!=51866) forces
    no_timestamps — and that forcing must reach the LOGIT FILTERS, not just
    the prompt/state machine (reference mutates its by-value params before
    whisper_process_logits, src/whisper.cpp:6956-6959 + 6198-6202; r4
    review): with an embedding rigged so the argmax would be a timestamp
    token, the decoded stream must contain none, and must equal the
    explicit no_timestamps=True stream."""
    import jax.numpy as jnp

    import dataclasses
    hp = dataclasses.replace(tiny_test_hparams(), n_text_layer=2)
    assert hp.n_text_layer == 2 and hp.n_vocab != 51866

    ctx = wt.WhisperContext.random(
        hp=hp, params=ContextParams(dtype="float32"), seed=2)
    beg = ctx.vocab.token_beg
    emb = np.asarray(ctx.params["decoder"]["token_embed"]).copy()
    emb[beg + 5] *= 50.0                  # timestamp token would win argmax
    ctx.params = {**ctx.params,
                  "decoder": {**ctx.params["decoder"],
                              "token_embed": jnp.asarray(emb)}}

    def run(no_ts):
        p = FullParams.default()
        p.print_progress = False
        p.no_timestamps = no_ts
        p.max_tokens = 8
        p.temperature_inc = 0.0
        st = ctx.create_state()
        st.full(p, audio)
        return [[t.id for t in s.tokens] for s in st.segments]

    implicit = run(False)                 # distil rule forces it
    assert implicit and all(t < beg for seg in implicit for t in seg), implicit
    assert implicit == run(True)


def test_single_segment_advances_all_windows(ctx):
    """single_segment merges each WINDOW into one segment but must not end
    the seek loop (the reference has no such break — :7354/:7594 are its
    only uses; r4 review): >30 s audio yields one segment per window, same
    as the batch orchestrator."""
    rng = np.random.default_rng(9)
    audio = (0.1 * rng.standard_normal(16000 * 65)).astype(np.float32)
    p = FullParams.default()
    p.print_progress = False
    p.single_segment = True
    p.no_timestamps = True
    p.max_tokens = 8
    p.temperature_inc = 0.0
    p.suppress_regex = r"<syn\d\d\d+>"

    st = ctx.create_state()
    st.full(p, audio)
    texts = [s.text for s in st.segments]
    assert len(texts) >= 2, texts          # 65 s = 3 windows, not 1 segment
    batch = ctx.full_batch(p, [audio])[0]
    assert texts == [s.text for s in batch]


def test_use_gpu_false_pins_weights_to_cpu():
    """ContextParams.use_gpu was accepted but ignored (r4 review): with
    use_gpu=False the weights (and so every jit consuming them) must sit
    on the CPU backend and exec_backend must say so."""
    import jax

    ctx2 = wt.WhisperContext.random(
        hp=tiny_test_hparams(),
        params=ContextParams(dtype="float32", use_gpu=False), seed=1)
    assert ctx2.exec_backend == "cpu"
    leaf = jax.tree_util.tree_leaves(ctx2.params)[0]
    assert list(leaf.devices())[0].platform == "cpu"
