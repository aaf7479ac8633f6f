"""On-device beam search vs the host beam implementation.

Uses the decisive-logits config (small candidate set) so argmax/top-k are
robust to ulp noise; both loops must pick the same sequences, fork the same
beams, and produce the same scores."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams, FullParams, SamplingStrategy
from whisper_tpu.decoding import device_loop, filters, host_loop


@pytest.fixture(scope="module")
def setup(jfk_like_audio_mod):
    ctx = wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"), seed=7)
    p = FullParams.default(SamplingStrategy.BEAM_SEARCH)
    p.beam_search.beam_size = 3
    p.print_progress = False
    p.no_timestamps = True
    p.max_tokens = 10
    p.suppress_regex = r"<syn\d\d\d+>"
    consts, tids = filters.build_filter_consts(ctx.vocab, ctx.hparams, p)
    st = ctx.create_state()
    st.pcm_to_mel(jfk_like_audio_mod[: 16000 * 2])
    st.encode(0)
    return ctx, p, consts, tids, st


@pytest.fixture(scope="module")
def jfk_like_audio_mod():
    rng = np.random.default_rng(42)
    sr = 16000
    t = np.arange(3 * sr) / sr
    sig = np.sin(2 * np.pi * 150 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))
    return (0.3 * sig + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)


def test_device_beam_matches_host_beam(setup):
    ctx, p, consts, tids, st = setup
    hp = ctx.hparams
    vocab = ctx.vocab
    B = 3
    prompt = [vocab.token_sot, vocab.token_not]
    seek, seek_end = 0, st.n_len_org

    host = host_loop.decode_window_host(
        st, p, consts, tids, prompt, 0.0, seek, seek_end,
        n_dec=B, strategy=device_loop.BEAM, beam_size=3)

    prompt_max = hp.n_text_ctx // 2 + 8
    pp = np.zeros(prompt_max, np.int32)
    pp[: len(prompt)] = prompt
    dev = device_loop.decode_window(
        ctx.params, hp, consts, st.cross_k, st.cross_v,
        jnp.asarray(pp), jnp.int32(len(prompt)),
        jnp.float32(0.0), jnp.int32(seek), jnp.int32(seek_end),
        jax.random.PRNGKey(0),
        tids=tids, n_dec=B, strategy=device_loop.BEAM, beam_size=3,
        max_tokens=p.max_tokens, no_timestamps=True, dtype=ctx.dtype)
    dev = jax.tree_util.tree_map(np.asarray, dev)

    n_h, n_d = int(host.n_tokens), int(dev.n_tokens)
    assert n_d == n_h
    # same beam sequences in the same slots
    np.testing.assert_array_equal(dev.tokens[:, :n_d], host.tokens[:, :n_h])
    np.testing.assert_allclose(dev.sum_logprobs_all, host.sum_logprobs_all,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(dev.completed, host.completed)
    np.testing.assert_array_equal(dev.result_len, host.result_len)


def test_beam_rows_are_distinct_or_better(setup):
    """Beam slots hold distinct sequences (dedup) ordered by score."""
    ctx, p, consts, tids, st = setup
    hp = ctx.hparams
    vocab = ctx.vocab
    B = 3
    prompt = [vocab.token_sot, vocab.token_not]
    host = host_loop.decode_window_host(
        st, p, consts, tids, prompt, 0.0, 0, st.n_len_org,
        n_dec=B, strategy=device_loop.BEAM, beam_size=3)
    n = int(host.n_tokens)
    seqs = [host.tokens[j, :n].tolist() for j in range(B)]
    assert len({tuple(s) for s in seqs}) == B, seqs
    # slot 0 carries the best cumulative score
    assert host.sum_logprobs_all[0] == max(host.sum_logprobs_all)
