"""Encoder/decoder model tests (reference graph builders,
src/whisper.cpp:1994-2851)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.models import whisper as m


def test_encoder_shapes(tiny_ctx):
    hp = tiny_ctx.hparams
    mel = jnp.zeros((1, hp.n_mels, 2 * hp.n_audio_ctx))
    out = m.encoder_forward(tiny_ctx.params, hp, mel, jnp.float32)
    assert out.shape == (1, hp.n_audio_ctx, hp.n_audio_state)
    assert jnp.isfinite(out).all()


def test_conv_stem_downsamples_2x(tiny_ctx):
    hp = tiny_ctx.hparams
    mel = jnp.zeros((2, hp.n_mels, 3000))
    x = m.conv_stem(tiny_ctx.params["encoder"], mel, jnp.float32)
    assert x.shape == (2, 1500, hp.n_audio_state)


def test_cross_kv_shapes(tiny_ctx):
    hp = tiny_ctx.hparams
    embed = jnp.zeros((1, hp.n_audio_ctx, hp.n_audio_state))
    ck, cv = m.cross_attention_kv(tiny_ctx.params, hp, embed)
    dh = hp.n_text_state // hp.n_text_head
    assert ck.shape == (hp.n_text_layer, 1, hp.n_text_head, hp.n_audio_ctx, dh)
    assert cv.shape == ck.shape


def test_decoder_step_and_cache(tiny_ctx):
    hp = tiny_ctx.hparams
    B = 2
    embed = jnp.ones((B, hp.n_audio_ctx, hp.n_audio_state)) * 0.01
    ck, cv = m.cross_attention_kv(tiny_ctx.params, hp, embed)
    kv = m.KVCache.zeros(hp, B, jnp.float32)
    toks = jnp.array([[hp.n_vocab - 10], [5]], dtype=jnp.int32)
    logits, kv = m.decode_logits_only(
        tiny_ctx.params, hp, toks, jnp.int32(0), kv, ck, cv, jnp.float32)
    assert logits.shape == (B, 1, hp.n_vocab)
    assert jnp.isfinite(logits).all()
    # cache position 0 written, position 1 untouched
    assert not jnp.all(kv.k[:, :, :, 0] == 0)
    assert jnp.all(kv.k[:, :, :, 1] == 0)


def test_incremental_equals_full_context(tiny_ctx):
    """Token-by-token decode with KV cache must equal one full forward."""
    hp = tiny_ctx.hparams
    toks = np.array([[1, 7, 42, 300, 9]], dtype=np.int32)
    embed = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, hp.n_audio_ctx, hp.n_audio_state)).astype(np.float32) * 0.1)
    ck, cv = m.cross_attention_kv(tiny_ctx.params, hp, embed)

    # full pass
    kv = m.KVCache.zeros(hp, 1, jnp.float32)
    logits_full, _ = m.decode_logits_only(
        tiny_ctx.params, hp, jnp.asarray(toks), jnp.int32(0), kv, ck, cv, jnp.float32)

    # incremental
    kv = m.KVCache.zeros(hp, 1, jnp.float32)
    outs = []
    for i in range(toks.shape[1]):
        lg, kv = m.decode_logits_only(
            tiny_ctx.params, hp, jnp.asarray(toks[:, i : i + 1]), jnp.int32(i),
            kv, ck, cv, jnp.float32)
        outs.append(np.asarray(lg[:, 0]))
    logits_inc = np.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(logits_full), logits_inc, rtol=2e-4, atol=2e-4)


def test_causality(tiny_ctx):
    """Changing a future token must not affect earlier logits."""
    hp = tiny_ctx.hparams
    embed = jnp.zeros((1, hp.n_audio_ctx, hp.n_audio_state))
    ck, cv = m.cross_attention_kv(tiny_ctx.params, hp, embed)
    kv = m.KVCache.zeros(hp, 1, jnp.float32)
    a = np.array([[1, 2, 3, 4]], np.int32)
    b = np.array([[1, 2, 3, 999]], np.int32)
    la, _ = m.decode_logits_only(tiny_ctx.params, hp, jnp.asarray(a), jnp.int32(0),
                                 kv, ck, cv, jnp.float32)
    lb, _ = m.decode_logits_only(tiny_ctx.params, hp, jnp.asarray(b), jnp.int32(0),
                                 kv, ck, cv, jnp.float32)
    np.testing.assert_allclose(np.asarray(la[:, :3]), np.asarray(lb[:, :3]),
                               rtol=1e-5, atol=1e-5)


def test_kv_reorder_beam_fork(tiny_ctx):
    hp = tiny_ctx.hparams
    kv = m.KVCache.zeros(hp, 3, jnp.float32)
    kv = m.KVCache(kv.k.at[:, 0].set(1.0).at[:, 1].set(2.0).at[:, 2].set(3.0), kv.v)
    re = kv.reorder(jnp.array([2, 2, 0]))
    assert float(re.k[0, 0, 0, 0, 0]) == 3.0
    assert float(re.k[0, 1, 0, 0, 0]) == 3.0
    assert float(re.k[0, 2, 0, 0, 0]) == 1.0


def test_state_encode_decode_api(tiny_ctx, jfk_like_audio):
    st = tiny_ctx.create_state()
    st.pcm_to_mel(jfk_like_audio)
    assert st.mel.shape[0] == tiny_ctx.hparams.n_mels
    st.encode(0)
    assert st.audio_embed.shape == (
        1, tiny_ctx.hparams.n_audio_ctx, tiny_ctx.hparams.n_audio_state)
    kv = st.new_kv_cache(batch=2)
    logits, kv = st.decode([tiny_ctx.token_sot()], pos0=0, kv=kv, batch=2)
    assert logits.shape == (2, 1, tiny_ctx.hparams.n_vocab)
