"""Cross-check: the fully on-device window decoder must produce the same
greedy tokens/state as the readable host implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams, FullParams
from whisper_tpu.decoding import device_loop, filters, host_loop


def test_device_matches_host_greedy(jfk_like_audio):
    ctx = wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"))
    # sharpen the (tied) token embedding: decisive argmaxes across the
    # per-token host program vs the fused while_loop program (CLAUDE.md —
    # never compare raw near-uniform random argmax across program shapes)
    dec = dict(ctx.params["decoder"])
    dec["token_embed"] = dec["token_embed"] * 8.0
    ctx.params = {**ctx.params, "decoder": dec}
    hp = ctx.hparams
    vocab = ctx.vocab
    params = FullParams.default()
    consts, tids = filters.build_filter_consts(vocab, hp, params)

    st = ctx.create_state()
    st.pcm_to_mel(jfk_like_audio[: 16000 * 3])
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
        dtype=ctx.dtype)
    dev = jax.tree_util.tree_map(np.asarray, dev)

    n_h = int(host.n_tokens)
    n_d = int(dev.n_tokens)
    assert n_d == n_h
    np.testing.assert_array_equal(dev.tokens[0, :n_d], host.tokens[0, :n_h])
    assert int(dev.result_len[0]) == int(host.result_len[0])
    assert int(dev.seek_delta[0]) == int(host.seek_delta[0])
    assert bool(dev.completed[0]) == bool(host.completed[0])
    assert bool(dev.failed[0]) == bool(host.failed[0])
    np.testing.assert_allclose(dev.tok_plog[0, :n_d], host.tok_plog[0, :n_h],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(dev.no_speech_prob),
                               float(host.no_speech_prob), rtol=1e-4)
