"""Speculative greedy decoding (decoding/speculative.py): the draft-
accelerated window decode must emit EXACTLY the main model's own greedy
stream — tokens, stats, and decoder-state semantics identical to
device_loop.decode_window (greedy, n_dec=1).

Comparisons sharpen the decoder token embedding (x8) so argmaxes are
decisive across the T=1 vs T=k program shapes (CLAUDE.md: never compare
argmax over 51k near-uniform random logits across program structures).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams, FullParams
from whisper_tpu.decoding import device_loop, filters
from whisper_tpu.decoding.speculative import decode_window_speculative


def _sharp_ctx(seed=0, scale=8.0):
    ctx = wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"),
        seed=seed)
    dec = dict(ctx.params["decoder"])
    dec["token_embed"] = dec["token_embed"] * scale
    ctx.params = {**ctx.params, "decoder": dec}
    return ctx


@pytest.fixture(scope="module")
def main_ctx():
    return _sharp_ctx(seed=0)


@pytest.fixture(scope="module")
def draft_ctx():
    # a DIFFERENT model (weights disagree with the main model) — the
    # worst case for acceptance, which must not affect correctness
    return _sharp_ctx(seed=123)


def _window_results(ctx, draft, audio, params, k_spec):
    """(vanilla, speculative) WindowResults for one window from identical
    state."""
    hp = ctx.hparams
    vocab = ctx.vocab
    consts, tids = filters.build_filter_consts(vocab, hp, params)

    st = ctx.create_state()
    st.pcm_to_mel(audio)
    st.encode(0)
    ctx.attach_draft(draft)
    try:
        from whisper_tpu.audio import mel as mel_mod
        st.draft_mel, _, _ = mel_mod.log_mel_spectrogram(
            audio, draft.mel_filters)
        st.encode_draft(0)
    finally:
        ctx.draft = None

    prompt = [vocab.token_sot]
    if params.no_timestamps:
        prompt.append(vocab.token_not)
    seek, seek_end = 0, st.n_len_org
    prompt_max = hp.n_text_ctx // 2 + 8
    pp = np.zeros(prompt_max, np.int32)
    pp[: len(prompt)] = prompt

    van = device_loop.decode_window(
        ctx.params, hp, consts, st.cross_k, st.cross_v,
        jnp.asarray(pp), jnp.int32(len(prompt)),
        jnp.float32(0.0), jnp.int32(seek), jnp.int32(seek_end),
        jax.random.PRNGKey(0),
        tids=tids, n_dec=1, strategy=device_loop.GREEDY_BEST,
        max_tokens=params.max_tokens, no_timestamps=params.no_timestamps,
        dtype=ctx.dtype)
    spec = decode_window_speculative(
        ctx.params, draft.params, hp, draft.hparams, consts,
        st.cross_k, st.cross_v, st.draft_cross_k, st.draft_cross_v,
        jnp.asarray(pp), jnp.int32(len(prompt)),
        jnp.int32(seek), jnp.int32(seek_end),
        tids=tids, k_spec=k_spec,
        max_tokens=params.max_tokens, no_timestamps=params.no_timestamps,
        dtype=ctx.dtype)
    return (jax.tree_util.tree_map(np.asarray, van),
            jax.tree_util.tree_map(np.asarray, spec))


def _assert_same(van, spec):
    n = int(van.n_tokens)
    assert int(spec.n_tokens) == n
    np.testing.assert_array_equal(spec.tokens[0, :n], van.tokens[0, :n])
    np.testing.assert_array_equal(spec.tok_tid[0, :n], van.tok_tid[0, :n])
    assert int(spec.result_len[0]) == int(van.result_len[0])
    assert int(spec.seek_delta[0]) == int(van.seek_delta[0])
    assert bool(spec.completed[0]) == bool(van.completed[0])
    assert bool(spec.failed[0]) == bool(van.failed[0])
    np.testing.assert_allclose(spec.tok_plog[0, :n], van.tok_plog[0, :n],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(spec.tok_p[0, :n], van.tok_p[0, :n],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(spec.tok_ptsum[0, :n], van.tok_ptsum[0, :n],
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(float(spec.sum_logprobs_all[0]),
                               float(van.sum_logprobs_all[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(spec.no_speech_prob),
                               float(van.no_speech_prob), rtol=1e-4)


@pytest.mark.parametrize("k_spec", [1, 4, 8])
def test_spec_matches_vanilla_timestamps(main_ctx, draft_ctx, jfk_like_audio,
                                         k_spec):
    params = FullParams.default()
    van, spec = _window_results(
        main_ctx, draft_ctx, jfk_like_audio[: 16000 * 3], params, k_spec)
    assert int(van.n_tokens) > 0
    _assert_same(van, spec)


def test_spec_matches_vanilla_no_timestamps(main_ctx, draft_ctx,
                                            jfk_like_audio):
    params = FullParams.default()
    params.no_timestamps = True
    params.max_tokens = 24
    van, spec = _window_results(
        main_ctx, draft_ctx, jfk_like_audio[: 16000 * 3], params, 4)
    _assert_same(van, spec)


def test_spec_self_draft_full_acceptance(main_ctx, jfk_like_audio):
    """Draft == main model: every proposal verifies (modulo T=1-vs-T=k ulp),
    and the stream still matches vanilla exactly."""
    params = FullParams.default()
    van, spec = _window_results(
        main_ctx, main_ctx, jfk_like_audio[: 16000 * 3], params, 8)
    _assert_same(van, spec)
    # acceptance observability: a self-draft accepts nearly everything, so
    # verify rounds must be well below one-per-token
    n, r = int(spec.n_tokens), int(spec.n_rounds)
    assert r >= 1
    if n >= 8:
        assert r < n


def test_spec_max_tokens_mid_chunk(main_ctx, draft_ctx, jfk_like_audio):
    """max_tokens lands inside a speculation chunk: the emit cap must cut
    at exactly the same step as the vanilla loop."""
    params = FullParams.default()
    params.no_timestamps = True
    params.max_tokens = 3                    # << k_spec = 8
    van, spec = _window_results(
        main_ctx, draft_ctx, jfk_like_audio[: 16000 * 3], params, 8)
    _assert_same(van, spec)
    assert int(spec.n_tokens) <= 4


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
def test_spec_seed_sweep(seed, jfk_like_audio):
    """Randomized equivalence sweep: different (main, draft) weight pairs
    exercise different timestamp/terminal paths through the chunk replay."""
    main = _sharp_ctx(seed=seed)
    draft = _sharp_ctx(seed=seed + 1000)
    params = FullParams.default()
    van, spec = _window_results(
        main, draft, jfk_like_audio[: 16000 * 2], params, 5)
    _assert_same(van, spec)


def test_spec_short_window(main_ctx, draft_ctx, jfk_like_audio):
    """1.2 s of audio: end-of-audio / rl0 terminal rules fire within the
    first chunks and must match vanilla exactly."""
    params = FullParams.default()
    van, spec = _window_results(
        main_ctx, draft_ctx, jfk_like_audio[: int(16000 * 1.2)], params, 8)
    _assert_same(van, spec)


def test_run_full_with_draft_matches(main_ctx, draft_ctx, jfk_like_audio):
    """Public API: run_full with an attached draft produces the same
    segments as without (multi-window, timestamps on)."""
    audio = jfk_like_audio[: 16000 * 8]
    params = FullParams.default()
    params.temperature_inc = 0.0     # decisive: no sampling fallback
    params.no_timestamps = True      # random weights rarely sample a valid
    params.max_tokens = 24           # timestamp pair -> guarantee emission

    st_plain = main_ctx.create_state()
    st_plain.full(params, audio)
    base = [(s.t0, s.t1, [t.id for t in s.tokens]) for s in st_plain.segments]

    main_ctx.attach_draft(draft_ctx)
    try:
        st_spec = main_ctx.create_state()
        st_spec.full(params, audio)
        got = [(s.t0, s.t1, [t.id for t in s.tokens]) for s in st_spec.segments]
    finally:
        main_ctx.draft = None

    assert got == base
    assert len(base) > 0


def test_spec_with_keep_quantized_main(tmp_path, jfk_like_audio):
    """Speculative decoding composes with the int8 quantized serving path:
    a keep_quantized main model + draft produces the same stream as the
    same quantized model without a draft."""
    import sys
    sys.path.insert(0, "tests")
    from test_ggml_io import _make_test_tensors
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io, quant
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = tiny_test_hparams()
    tensors = _make_test_tensors(hp, ttype=quant.GGML_TYPE_Q8_0)
    # sharpen the (tied) token embedding so argmaxes are decisive across
    # the T=1 vs T=k program shapes
    arr, tt = tensors["decoder.token_embedding.weight"]
    tensors["decoder.token_embedding.weight"] = (arr * 8.0, tt)
    path = str(tmp_path / "q8.bin")
    ggml_io.write_ggml(path, hp, mel_filterbank(80),
                       synthetic_vocab(hp.n_vocab).id_to_token[:50256],
                       tensors)

    audio = jfk_like_audio[: 16000 * 3]
    p = FullParams.default()
    p.no_timestamps = True
    p.max_tokens = 16
    p.temperature_inc = 0.0

    ctx_q = wt.WhisperContext.new_with_params(
        path, ContextParams(dtype="float32", keep_quantized=True))
    assert "q" in ctx_q.params["decoder"]["blocks"]["mlp_0"]
    st = ctx_q.create_state()
    st.full(p, audio)
    base = [[t.id for t in s.tokens] for s in st.segments]

    ctx_s = wt.WhisperContext.new_with_params(
        path, ContextParams(dtype="float32", keep_quantized=True,
                            draft_model=path, spec_k=4))
    assert ctx_s.draft is not None
    # keep_quantized is inherited: the draft serves int8-resident too
    assert "q" in ctx_s.draft.params["decoder"]["blocks"]["mlp_0"]
    st2 = ctx_s.create_state()
    st2.full(p, audio)
    got = [[t.id for t in s.tokens] for s in st2.segments]

    assert got == base and len(base) > 0
    assert st2.spec_stats is not None and st2.spec_stats["rounds"] >= 1


def test_spec_draft_shares_encoder(main_ctx, jfk_like_audio):
    """draft_shares_encoder: the draft encoder pass is skipped and the main
    model's encoder output feeds the draft's cross-KV projections — for a
    draft whose encoder weights equal the main's (distil training freezes
    the teacher encoder), the stream is identical to the non-shared path."""
    import copy
    audio = jfk_like_audio[: 16000 * 3]
    params = FullParams.default()
    params.no_timestamps = True
    params.max_tokens = 16
    params.temperature_inc = 0.0

    # hybrid draft: main's encoder, different decoder
    draft = _sharp_ctx(seed=321)
    draft.params = {**draft.params, "encoder": main_ctx.params["encoder"]}

    def run(shares: bool):
        ctx = _sharp_ctx(seed=0)
        ctx.cparams = dataclasses.replace(ctx.cparams,
                                          draft_shares_encoder=shares)
        ctx.attach_draft(draft)
        st = ctx.create_state()
        st.full(params, audio)
        if shares:
            assert st.draft_mel is None     # encoder pass really skipped
        assert st.spec_stats is not None
        return [[t.id for t in s.tokens] for s in st.segments]

    assert run(True) == run(False)


def test_spec_distil_draft_via_hf_converter(tmp_path, jfk_like_audio):
    """Real-world draft path: a distil-style HF model (full encoder,
    2 decoder layers) through convert_hf -> ggml -> new_with_params ->
    attach_draft of a converted full model, speculative run matches
    vanilla. Proves the converter handles asymmetric layer counts and
    that drafts arrive via the real checkpoint pipeline."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    from whisper_tpu.checkpoint import convert_hf

    def make(decoder_layers, seed):
        torch.manual_seed(seed)
        cfg = WhisperConfig(
            vocab_size=51865, num_mel_bins=80, d_model=64,
            encoder_layers=2, encoder_attention_heads=2,
            decoder_layers=decoder_layers, decoder_attention_heads=2,
            encoder_ffn_dim=256, decoder_ffn_dim=256,
            max_source_positions=1500, max_target_positions=448,
        )
        hf = WhisperForConditionalGeneration(cfg).eval()
        with torch.no_grad():
            # sharpen the (tied) token embedding: decisive argmaxes across
            # the T=1 vs T=k program shapes (CLAUDE.md)
            hf.model.decoder.embed_tokens.weight.mul_(8.0)
        return hf

    main_path = str(tmp_path / "main.bin")
    draft_path = str(tmp_path / "draft.bin")
    convert_hf.convert_hf_to_ggml(make(4, 0), main_path, ftype=0)
    convert_hf.convert_hf_to_ggml(make(2, 7), draft_path, ftype=0)

    audio = jfk_like_audio[: 16000 * 2]
    p = FullParams.default()
    p.no_timestamps = True     # 2-layer draft is distil anyway; decisive
    p.max_tokens = 12
    p.temperature_inc = 0.0

    ctx = wt.WhisperContext.new_with_params(
        main_path, ContextParams(dtype="float32"))
    st = ctx.create_state()
    st.full(p, audio)
    base = [[t.id for t in s.tokens] for s in st.segments]

    ctx_s = wt.WhisperContext.new_with_params(
        main_path, ContextParams(dtype="float32", draft_model=draft_path,
                                 spec_k=4))
    assert ctx_s.draft is not None
    assert ctx_s.draft.hparams.n_text_layer == 2
    st2 = ctx_s.create_state()
    st2.full(p, audio)
    got = [[t.id for t in s.tokens] for s in st2.segments]
    assert got == base
    assert st2.spec_stats is not None


def test_spec_multiwindow_with_context_carry(main_ctx, draft_ctx):
    """35 s of audio = two 30 s windows: the speculative path must carry
    prompt_past across windows ([PREV]+past prompts) identically to the
    vanilla loop."""
    rng = np.random.default_rng(9)
    audio = (0.1 * rng.standard_normal(16000 * 35)).astype(np.float32)
    p = FullParams.default()
    p.no_timestamps = True
    p.max_tokens = 10
    p.temperature_inc = 0.0
    p.no_context = False

    st = main_ctx.create_state()
    st.full(p, audio)
    base = [(s.t0, s.t1, [t.id for t in s.tokens]) for s in st.segments]
    assert len(base) >= 2                      # really multi-window

    main_ctx.attach_draft(draft_ctx)
    try:
        st2 = main_ctx.create_state()
        st2.full(p, audio)
        got = [(s.t0, s.t1, [t.id for t in s.tokens]) for s in st2.segments]
    finally:
        main_ctx.draft = None
    assert got == base


def test_spec_stats_reset_per_run(main_ctx, draft_ctx, jfk_like_audio):
    """spec_stats must reflect ONE run_full, not accumulate across calls
    on a reused state (r3 review finding)."""
    audio = jfk_like_audio[: 16000 * 3]
    p = FullParams.default()
    p.no_timestamps = True
    p.max_tokens = 12
    p.temperature_inc = 0.0
    main_ctx.attach_draft(draft_ctx)
    try:
        st = main_ctx.create_state()
        st.full(p, audio)
        first = dict(st.spec_stats)
        st.full(p, audio)
        assert st.spec_stats == first      # identical run, identical counts
    finally:
        main_ctx.draft = None


def test_spec_not_used_under_beam(main_ctx, draft_ctx, jfk_like_audio):
    """A BEAM request with a draft attached must never take the speculative
    path (and so never pay the draft encoder pass)."""
    from whisper_tpu.config import SamplingStrategy
    p = FullParams.default(SamplingStrategy.BEAM_SEARCH)
    p.beam_search.beam_size = 2
    main_ctx.attach_draft(draft_ctx)
    try:
        st = main_ctx.create_state()
        st.full(p, jfk_like_audio[: 16000 * 2])
        assert st.spec_stats is None
        assert st.draft_cross_k is None    # encode_draft never ran
    finally:
        main_ctx.draft = None


def test_attach_draft_vocab_mismatch(main_ctx):
    hp = dataclasses.replace(tiny_test_hparams(), n_vocab=51865 + 1)
    other = wt.WhisperContext.random(
        hp=hp, params=ContextParams(dtype="float32"))
    from whisper_tpu.errors import InitError
    with pytest.raises(InitError):
        main_ctx.attach_draft(other)
