"""ggml .bin container round-trip tests (reference format:
src/whisper.cpp:1503-1974 reader, models/convert-pt-to-ggml.py writer)."""

import io

import numpy as np

from whisper_tpu.checkpoint import ggml_io, init, loader, quant
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.tokenizer import synthetic_vocab


def _make_test_tensors(hp, ttype=quant.GGML_TYPE_F32, seed=0):
    """Fabricate a full tensor dict with correct reference names/shapes."""
    rng = np.random.default_rng(seed)
    d, dm = hp.n_audio_state, hp.n_mels
    t = {}

    def add(name, *shape, qt=None):
        arr = rng.standard_normal(shape).astype(np.float32) * 0.05
        t[name] = (arr, qt if qt is not None else ttype)

    # conv/pos/ln are never quantized by the reference quantizer
    add("encoder.positional_embedding", hp.n_audio_ctx, d, qt=quant.GGML_TYPE_F32)
    # conv weights are f16 unless the whole model is f32 (the reference
    # allocates them with vtype = wtype==F32 ? F32 : F16, src/whisper.cpp:1696)
    conv_t = quant.GGML_TYPE_F32 if ttype == quant.GGML_TYPE_F32 else quant.GGML_TYPE_F16
    add("encoder.conv1.weight", d, dm, 3, qt=conv_t)
    add("encoder.conv1.bias", d, 1, qt=quant.GGML_TYPE_F32)   # [n,1] like the
    add("encoder.conv2.weight", d, d, 3, qt=conv_t)
    add("encoder.conv2.bias", d, 1, qt=quant.GGML_TYPE_F32)   # reference format
    add("encoder.ln_post.weight", d, qt=quant.GGML_TYPE_F32)
    add("encoder.ln_post.bias", d, qt=quant.GGML_TYPE_F32)
    for i in range(hp.n_audio_layer):
        p = f"encoder.blocks.{i}"
        add(f"{p}.attn_ln.weight", d, qt=quant.GGML_TYPE_F32)
        add(f"{p}.attn_ln.bias", d, qt=quant.GGML_TYPE_F32)
        add(f"{p}.attn.query.weight", d, d)
        add(f"{p}.attn.query.bias", d, qt=quant.GGML_TYPE_F32)
        add(f"{p}.attn.key.weight", d, d)
        add(f"{p}.attn.value.weight", d, d)
        add(f"{p}.attn.value.bias", d, qt=quant.GGML_TYPE_F32)
        add(f"{p}.attn.out.weight", d, d)
        add(f"{p}.attn.out.bias", d, qt=quant.GGML_TYPE_F32)
        add(f"{p}.mlp_ln.weight", d, qt=quant.GGML_TYPE_F32)
        add(f"{p}.mlp_ln.bias", d, qt=quant.GGML_TYPE_F32)
        add(f"{p}.mlp.0.weight", 4 * d, d)
        add(f"{p}.mlp.0.bias", 4 * d, qt=quant.GGML_TYPE_F32)
        add(f"{p}.mlp.2.weight", d, 4 * d)
        add(f"{p}.mlp.2.bias", d, qt=quant.GGML_TYPE_F32)
    dt = hp.n_text_state
    add("decoder.positional_embedding", hp.n_text_ctx, dt, qt=quant.GGML_TYPE_F32)
    add("decoder.token_embedding.weight", hp.n_vocab, dt)
    add("decoder.ln.weight", dt, qt=quant.GGML_TYPE_F32)
    add("decoder.ln.bias", dt, qt=quant.GGML_TYPE_F32)
    for i in range(hp.n_text_layer):
        p = f"decoder.blocks.{i}"
        for prefix in ("attn", "cross_attn"):
            add(f"{p}.{prefix}_ln.weight", dt, qt=quant.GGML_TYPE_F32)
            add(f"{p}.{prefix}_ln.bias", dt, qt=quant.GGML_TYPE_F32)
            add(f"{p}.{prefix}.query.weight", dt, dt)
            add(f"{p}.{prefix}.query.bias", dt, qt=quant.GGML_TYPE_F32)
            add(f"{p}.{prefix}.key.weight", dt, dt)
            add(f"{p}.{prefix}.value.weight", dt, dt)
            add(f"{p}.{prefix}.value.bias", dt, qt=quant.GGML_TYPE_F32)
            add(f"{p}.{prefix}.out.weight", dt, dt)
            add(f"{p}.{prefix}.out.bias", dt, qt=quant.GGML_TYPE_F32)
        add(f"{p}.mlp_ln.weight", dt, qt=quant.GGML_TYPE_F32)
        add(f"{p}.mlp_ln.bias", dt, qt=quant.GGML_TYPE_F32)
        add(f"{p}.mlp.0.weight", 4 * dt, dt)
        add(f"{p}.mlp.0.bias", 4 * dt, qt=quant.GGML_TYPE_F32)
        add(f"{p}.mlp.2.weight", dt, 4 * dt)
        add(f"{p}.mlp.2.bias", dt, qt=quant.GGML_TYPE_F32)
    return t


def _write_checkpoint(hp, tensors):
    from whisper_tpu.audio.mel import mel_filterbank
    vocab = synthetic_vocab(hp.n_vocab)
    buf = io.BytesIO()
    ggml_io.write_ggml(buf, hp, mel_filterbank(hp.n_mels)[:, :],
                       vocab.id_to_token[:50256], tensors)
    buf.seek(0)
    return buf


def test_header_and_vocab_roundtrip():
    hp = tiny_test_hparams()
    buf = _write_checkpoint(hp, {})
    ckpt = ggml_io.read_ggml(buf)
    assert ckpt.hparams == hp
    assert ckpt.qnt_version == ggml_io.QNT_VERSION
    assert len(ckpt.vocab_tokens) == 50256
    assert ckpt.mel_filters.shape == (hp.n_mels, 201)
    assert len(ckpt.tensors) == 0  # stub model


def test_full_tensor_roundtrip_f32():
    hp = tiny_test_hparams(n_vocab=51864)
    tensors = _make_test_tensors(hp)
    ckpt = ggml_io.read_ggml(_write_checkpoint(hp, tensors))
    assert len(ckpt.tensors) == len(tensors)
    for name, (arr, ttype) in tensors.items():
        rt = ckpt.tensors[name]
        assert rt.shape == arr.shape
        if ttype == quant.GGML_TYPE_F32:
            np.testing.assert_array_equal(rt.to_float32(), arr)


def test_loader_builds_pytree():
    hp = tiny_test_hparams()
    tensors = _make_test_tensors(hp)
    model = loader.params_from_checkpoint(
        ggml_io.read_ggml(_write_checkpoint(hp, tensors)), compute_dtype="float32")
    assert model.hparams == hp
    enc = model.params["encoder"]
    d = hp.n_audio_state
    assert enc["conv1"]["w"].shape == (3, hp.n_mels, d)
    assert enc["blocks"]["attn_q"]["w"].shape == (hp.n_audio_layer, d, d)
    # W transposed to [in, out]: mlp_0 checkpoint is [4d, d] -> [d, 4d]
    assert enc["blocks"]["mlp_0"]["w"].shape == (hp.n_audio_layer, d, 4 * d)
    dec = model.params["decoder"]
    assert dec["token_embed"].shape == (hp.n_vocab, hp.n_text_state)
    assert dec["blocks"]["cross_k"]["w"].shape == (
        hp.n_text_layer, hp.n_text_state, hp.n_text_state)
    # weight values survive the name->pytree mapping (transposed)
    w_ref = tensors["decoder.blocks.0.mlp.0.weight"][0]
    np.testing.assert_allclose(dec["blocks"]["mlp_0"]["w"][0], w_ref.T, rtol=1e-6)


def test_loader_quantized_q5():
    hp = tiny_test_hparams()
    tensors = _make_test_tensors(hp, ttype=quant.GGML_TYPE_Q5_0)
    model = loader.params_from_checkpoint(
        ggml_io.read_ggml(_write_checkpoint(hp, tensors)), compute_dtype="float32")
    w_ref = tensors["encoder.blocks.0.attn.query.weight"][0]
    w_got = np.asarray(model.params["encoder"]["blocks"]["attn_q"]["w"][0]).T
    # dequantized weights close to original values within q5 step
    step = np.abs(w_ref).max() / 15
    assert np.abs(w_got - w_ref).max() <= step * 1.5


def test_random_model_matches_loader_layout():
    hp = tiny_test_hparams()
    rnd = init.random_model(hp=hp, compute_dtype="float32")
    tensors = _make_test_tensors(hp)
    loaded = loader.params_from_checkpoint(
        ggml_io.read_ggml(_write_checkpoint(hp, tensors)), compute_dtype="float32")
    import jax
    s1 = jax.tree_util.tree_structure(rnd.params)
    s2 = jax.tree_util.tree_structure(loaded.params)
    assert s1 == s2
    shapes1 = jax.tree_util.tree_map(lambda x: x.shape, rnd.params)
    shapes2 = jax.tree_util.tree_map(lambda x: x.shape, loaded.params)
    assert shapes1 == shapes2


def test_native_cache_roundtrip(tmp_path):
    """orbax-backed fast-load cache (SURVEY.md §5.4)."""
    import os
    from whisper_tpu.checkpoint import native_cache
    hp = tiny_test_hparams()
    tensors = _make_test_tensors(hp)
    path = str(tmp_path / "model.bin")
    with open(path, "wb") as f:
        f.write(_write_checkpoint(hp, tensors).getvalue())
    cache = str(tmp_path / "cache")
    m1 = native_cache.load_model_cached(path, "float32", cache_dir=cache)
    assert os.path.exists(cache + "/meta.json")
    m2 = native_cache.load_model_cached(path, "float32", cache_dir=cache)
    assert m2.hparams == m1.hparams
    assert m2.vocab.token_beg == m1.vocab.token_beg
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gguf_roundtrip(tmp_path):
    """GGUF container (reference ggml/src/gguf.cpp) round trip + shared
    loader path."""
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import gguf
    hp = tiny_test_hparams()
    tensors = _make_test_tensors(hp)
    path = str(tmp_path / "model.gguf")
    vocab = synthetic_vocab(hp.n_vocab)
    gguf.write_gguf(path, hp, mel_filterbank(hp.n_mels),
                    vocab.id_to_token[:50256], tensors)
    ckpt = gguf.read_gguf(path)
    assert ckpt.hparams == hp
    assert len(ckpt.vocab_tokens) == 50256
    assert ckpt.mel_filters.shape == (hp.n_mels, 201)
    for name, (arr, ttype) in list(tensors.items())[:5]:
        rt = ckpt.tensors[name]
        assert rt.shape == arr.shape
        if ttype == quant.GGML_TYPE_F32:
            np.testing.assert_array_equal(rt.to_float32(), arr)
    model = gguf.load_model_gguf(path, "float32")
    assert model.params and model.hparams == hp


def test_gguf_bad_magic(tmp_path):
    from whisper_tpu.checkpoint import gguf
    from whisper_tpu.errors import InvalidModelFormat
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"\x00" * 64)
    import pytest as _pytest
    with _pytest.raises(InvalidModelFormat):
        gguf.read_gguf(str(p))


def test_native_cache_invalidated_on_source_change(tmp_path):
    """A replaced .bin at the same path must not serve stale cached weights
    (r4 review: no source stamp -> silent stale loads)."""
    import os
    import time

    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io, native_cache
    from whisper_tpu.checkpoint.init import tiny_test_hparams
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = tiny_test_hparams()
    vocab = synthetic_vocab(hp.n_vocab).id_to_token[:50256]
    path = str(tmp_path / "m.bin")
    cache = str(tmp_path / "cache")

    ggml_io.write_ggml(path, hp, mel_filterbank(80), vocab,
                       _make_test_tensors(hp, seed=1))
    m1 = native_cache.load_model_cached(path, "float32", cache_dir=cache)

    # overwrite with different weights; force a distinct mtime_ns
    time.sleep(0.01)
    ggml_io.write_ggml(path, hp, mel_filterbank(80), vocab,
                       _make_test_tensors(hp, seed=2))
    m2 = native_cache.load_model_cached(path, "float32", cache_dir=cache)
    a = np.asarray(m1.params["decoder"]["token_embed"])
    b = np.asarray(m2.params["decoder"]["token_embed"])
    assert not np.array_equal(a, b), "stale cache served after source change"
