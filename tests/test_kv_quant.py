"""Int8 self-KV cache tests (ContextParams.kv_dtype="int8").

TPU-native capacity feature beyond the reference: the cache dominates
per-chip HBM at serving batch (PERF.md "batch capacity"), so int8 codes +
per-row scales nearly double utterances/chip. Correctness bar: per-step
logits within int8 rounding noise of the bf16 cache, and the full decisive
pipeline produces the same tokens device==host and quant==bf16 on a
sharpened model."""

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams, FullParams, SamplingStrategy


def _ctx(kv_dtype, sharp=False, seed=11):
    import jax.numpy as jnp

    ctx = wt.WhisperContext.random(
        hp=tiny_test_hparams(),
        params=ContextParams(dtype="float32", kv_dtype=kv_dtype), seed=seed)
    if sharp:
        emb = np.asarray(ctx.params["decoder"]["token_embed"])
        ctx.params = dict(ctx.params)
        ctx.params["decoder"] = dict(ctx.params["decoder"])
        ctx.params["decoder"]["token_embed"] = jnp.asarray(emb * 8.0)
    return ctx


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(4)
    return (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)


def test_cache_layout_and_memory():
    from whisper_tpu.models.whisper import KVCache

    hp = tiny_test_hparams()
    kv = KVCache.zeros(hp, 3, quant=True)
    assert kv.quantized and kv.k.dtype == np.int8
    assert kv.ks.shape == kv.k.shape[:-1] and kv.ks.dtype == np.float32
    dh = hp.n_text_state // hp.n_text_head
    bf16 = KVCache.zeros(hp, 3)
    bytes_q = kv.k.size + kv.v.size + 4 * (kv.ks.size + kv.vs.size)
    bytes_b = 2 * (bf16.k.size + bf16.v.size)
    assert bytes_q < 0.6 * bytes_b            # 1 + 4/Dh bytes vs 2 per elem
    assert kv.reorder(np.array([2, 0, 1])).ks.shape == kv.ks.shape


def test_quantize_roundtrip_error_bounded():
    import jax.numpy as jnp

    from whisper_tpu.models.whisper import quantize_kv_rows

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 64)), jnp.float32)
    q, s = quantize_kv_rows(x)
    back = q.astype(np.float32) * np.asarray(s)[..., None]
    err = np.abs(back - np.asarray(x)).max(axis=-1)
    amp = np.abs(np.asarray(x)).max(axis=-1)
    assert (err <= amp / 127.0 * 0.5 + 1e-6).all()   # round-to-nearest bound


def test_decode_logits_close_to_bf16_cache(audio):
    """Per-step logits with the int8 cache stay within quantization noise
    of the f32-cache logits over a multi-token prompt + sampled steps."""
    ctx_q = _ctx("int8")
    ctx_f = _ctx("")
    st_q, st_f = ctx_q.create_state(), ctx_f.create_state()
    for st in (st_q, st_f):
        st.pcm_to_mel(audio)
        st.encode(0)

    prompt = [ctx_q.vocab.token_sot, 100, 200, 300]
    kv_q = st_q.new_kv_cache(1)
    kv_f = st_f.new_kv_cache(1)
    assert kv_q.quantized and not kv_f.quantized
    lq, kv_q = st_q.decode(prompt, 0, kv_q)
    lf, kv_f = st_f.decode(prompt, 0, kv_f)
    for step in range(4):
        tq = int(np.argmax(np.asarray(lq)[0, -1]))
        lq, kv_q = st_q.decode([tq], len(prompt) + step, kv_q)
        lf, kv_f = st_f.decode([tq], len(prompt) + step, kv_f)
        a, b = np.asarray(lq)[0, -1], np.asarray(lf)[0, -1]
        denom = max(1.0, float(np.abs(b).max()))
        assert np.abs(a - b).max() / denom < 0.05, f"step {step}"


@pytest.mark.parametrize("beam", [0, 5], ids=["greedy", "beam5"])
def test_full_pipeline_quant_matches_bf16_tokens(audio, beam):
    """Decisive config + sharpened embeddings: the int8-cache token stream
    equals the full-precision stream, greedy and beam-5 (quantization noise
    ~1% vs decisive logit gaps)."""
    p = FullParams.default(
        SamplingStrategy.BEAM_SEARCH if beam else SamplingStrategy.GREEDY)
    p.no_timestamps = True
    p.max_tokens = 12
    p.suppress_regex = r"<syn\d\d\d+>"
    p.temperature_inc = 0.0
    if beam:
        p.beam_search.beam_size = beam

    streams = []
    for kv_dtype in ("", "int8"):
        ctx = _ctx(kv_dtype, sharp=True)
        st = ctx.create_state()
        st.full(p, audio)
        streams.append([[td.id for td in s.tokens] for s in st.segments])
    assert streams[0] == streams[1]


def test_device_host_parity_with_quant_cache(audio):
    """The host-stepped oracle (decoding/host_loop.py) quantizes through
    the same KVCache (state.new_kv_cache honors kv_dtype), so device==host
    stays EXACT with kv_dtype=int8 — same values, same rounding."""
    import jax
    import jax.numpy as jnp

    from whisper_tpu.decoding import device_loop, filters, host_loop

    ctx = _ctx("int8", sharp=True)
    hp, vocab = ctx.hparams, ctx.vocab
    params = FullParams.default()
    consts, tids = filters.build_filter_consts(vocab, hp, params)

    st = ctx.create_state()
    st.pcm_to_mel(audio)
    st.encode(0)
    prompt = [vocab.token_sot]
    seek, seek_end = 0, st.n_len_org

    host = host_loop.decode_window_host(
        st, params, consts, tids, prompt, 0.0, seek, seek_end,
        n_dec=1, strategy=device_loop.GREEDY_BEST)

    prompt_max = hp.n_text_ctx // 2 + 8
    pp = np.zeros(prompt_max, np.int32)
    pp[: len(prompt)] = prompt
    dev = device_loop.decode_window(
        ctx.params, hp, consts, st.cross_k, st.cross_v,
        jnp.asarray(pp), jnp.int32(len(prompt)),
        jnp.float32(0.0), jnp.int32(seek), jnp.int32(seek_end),
        jax.random.PRNGKey(0),
        tids=tids, n_dec=1, strategy=device_loop.GREEDY_BEST,
        dtype=ctx.dtype, kv_quant=True)
    dev = jax.tree_util.tree_map(np.asarray, dev)

    n_h, n_d = int(host.n_tokens), int(dev.n_tokens)
    assert n_d == n_h and n_d > 0
    np.testing.assert_array_equal(dev.tokens[0, :n_d], host.tokens[0, :n_h])


def test_dtw_timestamps_with_quant_cache(audio):
    """DTW token timestamps traverse the quantized CROSS-KV path
    (decoder_forward collect_cross_qk over (codes, scales) tuples)."""
    from whisper_tpu.config import AlignmentHeadsPreset, DtwParams

    cp = ContextParams(
        dtype="float32", kv_dtype="int8",
        dtw_token_timestamps=True,
        dtw=DtwParams(mode=AlignmentHeadsPreset.CUSTOM,
                      custom_aheads=((0, 0), (1, 1))),
    )
    ctx = wt.WhisperContext.random(hp=tiny_test_hparams(), params=cp, seed=11)
    assert ctx.kv_quant
    st = ctx.create_state()
    assert isinstance(st, object)
    p = FullParams.default()
    p.print_progress = False
    st.full(p, audio)
    assert st.full_n_segments() >= 1
    stamped = [td.t_dtw for i in range(st.full_n_segments())
               for td in st.full_get_segment(i).tokens
               if td.id < ctx.token_eot() and td.t_dtw >= 0]
    assert stamped and all(b >= a for a, b in zip(stamped, stamped[1:]))


def test_cross_kv_is_quantized_tuples(audio):
    ctx = _ctx("int8")
    st = ctx.create_state()
    st.pcm_to_mel(audio)
    st.encode(0)
    assert isinstance(st.cross_k, tuple) and isinstance(st.cross_v, tuple)
    codes, scales = st.cross_k
    assert codes.dtype == np.int8 and scales.dtype == np.float32
    assert codes.shape[:-1] == scales.shape


def test_batch_beam_with_quant_cache(audio):
    """full_batch beam with int8 caches: equals the single-utterance quant
    path and the bf16 batch stream (decisive sharpened model) — covers the
    block-diagonal fork + fold paths over quantized self- and cross-KV."""
    p = FullParams.default(SamplingStrategy.BEAM_SEARCH)
    p.print_progress = False
    p.beam_search.beam_size = 3
    p.greedy.best_of = 3
    p.temperature_inc = 0.0
    p.no_timestamps = True
    p.max_tokens = 10
    p.suppress_regex = r"<syn\d\d\d+>"

    audios = [audio, (0.5 * audio).astype(np.float32)]

    def toks(segss):
        return [[[t.id for t in s.tokens] for s in segs] for segs in segss]

    ctx_q = _ctx("int8", sharp=True)
    batch_q = ctx_q.full_batch(p, audios)
    st = ctx_q.create_state()
    st.full(p, audios[0])
    assert toks([batch_q[0]]) == toks([st.segments])

    ctx_f = _ctx("", sharp=True)
    assert toks(batch_q) == toks(ctx_f.full_batch(p, audios))


def test_speculative_with_quant_cache(audio):
    """Speculative greedy composes with int8 caches: identical stream with
    and without the draft (acceptance moves speed, never tokens)."""
    main = _ctx("int8", sharp=True, seed=0)
    draft = _ctx("int8", sharp=True, seed=123)

    p = FullParams.default()
    p.temperature_inc = 0.0
    p.no_timestamps = True
    p.max_tokens = 16

    st_plain = main.create_state()
    st_plain.full(p, audio)
    base = [(s.t0, s.t1, [t.id for t in s.tokens]) for s in st_plain.segments]

    main.attach_draft(draft)
    try:
        st_spec = main.create_state()
        st_spec.full(p, audio)
        got = [(s.t0, s.t1, [t.id for t in s.tokens])
               for s in st_spec.segments]
    finally:
        main.draft = None

    assert got == base and len(base) > 0
