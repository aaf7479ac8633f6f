"""Strict-parity beam candidate sampling (VERDICT r4 item 7).

The reference's whisper_sample_token_topk draws its beam_size candidates
from std::discrete_distribution(probs) at EVERY temperature
(src/whisper.cpp:6548-6558); the default here is deterministic top-k
(PARITY.md). `FullParams.beam_search.multinomial_candidates` restores the
reference's law: these tests prove the device draw matches a direct
simulation of the reference machine distributionally (TVD), that the flag
plumbs through the single-utterance, batched, and host loops, and that on
peaked distributions strict mode coincides with top-k exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams, FullParams, SamplingStrategy
from whisper_tpu.decoding.device_loop import beam_select

V = 50
K = 3


@pytest.fixture(scope="module")
def dist():
    rng = np.random.default_rng(7)
    logits = rng.standard_normal(V) * 2.0
    p = np.exp(logits - logits.max())
    return (p / p.sum()).astype(np.float64)


def _device_draws(probs, n, k=K, seed=0):
    """Sample the strict-mode beam candidate winner n times on device:
    B=1 group, k multinomial candidates, cursor takes the best-scoring."""
    lp = jnp.asarray(np.log(probs), jnp.float32)[None, :]

    @jax.jit
    def draw(key):
        noise = jax.random.gumbel(key, (1, k, V))
        src, tok = beam_select(
            lp, jnp.ones(1, bool), jnp.zeros(1, jnp.float32),
            jnp.zeros(1, jnp.uint32), jnp.zeros(1, jnp.int32),
            jnp.int32(1), beam_size=k, cand_noise=noise)
        return tok[0]

    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return np.asarray([int(draw(kk)) for kk in keys])


def _ref_sim_draws(probs, n, k=K, seed=0):
    """Direct simulation of the reference machine: k draws from
    discrete_distribution(probs) (:6548-6558), then the beam cursor gives
    the slot the best-scoring candidate (equal sum_logprobs -> max
    logprob of the drawn set, :7239-7260)."""
    rng = np.random.default_rng(seed)
    out = np.empty(n, np.int64)
    for t in range(n):
        ids = rng.choice(V, size=k, p=probs)
        out[t] = ids[np.argmax(np.log(probs[ids]))]
    return out


def _tvd(a, b):
    ca = np.bincount(a, minlength=V) / len(a)
    cb = np.bincount(b, minlength=V) / len(b)
    return 0.5 * np.abs(ca - cb).sum()


def test_candidate_draw_matches_reference_law(dist):
    """Device Gumbel-max draws and the simulated reference sampler must
    agree distributionally; the single-draw law (k=1, = probs itself) and
    the deterministic top-k law must both be measurably different, so the
    assertion discriminates."""
    n = 4000
    dev = _device_draws(dist, n, seed=1)
    ref = _ref_sim_draws(dist, n, seed=2)
    tvd = _tvd(dev, ref)
    assert tvd < 0.05, tvd

    # discriminative vs the plain single-draw law
    single = _ref_sim_draws(dist, n, k=1, seed=3)
    assert _tvd(dev, single) > 2 * tvd, (_tvd(dev, single), tvd)
    # discriminative vs deterministic top-k (a delta at argmax)
    topk = np.full(n, int(np.argmax(dist)))
    assert _tvd(dev, topk) > 2 * tvd


def test_candidate_draw_temperature_discrimination(dist):
    """Draws from a temperature-sharpened distribution must not match the
    base distribution's sampler: the law actually depends on probs."""
    sharp = dist ** 2.0
    sharp = sharp / sharp.sum()
    n = 4000
    dev_sharp = _device_draws(sharp, n, seed=4)
    ref_sharp = _ref_sim_draws(sharp, n, seed=5)
    ref_base = _ref_sim_draws(dist, n, seed=6)
    assert _tvd(dev_sharp, ref_sharp) < 0.05
    assert _tvd(dev_sharp, ref_base) > 2 * _tvd(dev_sharp, ref_sharp)


# --------------------------------------------------- end-to-end plumbing


@pytest.fixture(scope="module")
def ctx():
    return wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"), seed=3)


def _decisive_beam_p(multinomial: bool) -> FullParams:
    p = FullParams.default(SamplingStrategy.BEAM_SEARCH)
    p.beam_search.beam_size = 3
    p.beam_search.multinomial_candidates = multinomial
    p.no_timestamps = True
    p.max_tokens = 10
    p.temperature_inc = 0.0
    p.suppress_regex = r"<syn\d\d\d+>"
    return p


def test_flag_runs_single_and_batch(ctx):
    """Strict mode runs end-to-end through st.full and full_batch, and
    both paths still emit valid segments (draws are random, so only
    structure is asserted; the law is proven above)."""
    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    p = _decisive_beam_p(True)
    st = ctx.create_state()
    st.full(p, audio)
    for s in st.segments:
        assert all(0 <= td.id < ctx.hparams.n_vocab for td in s.tokens)
    got = ctx.full_batch(p, [audio, audio])
    assert len(got) == 2
    for u in got:
        for s in u:
            assert all(0 <= td.id < ctx.hparams.n_vocab for td in s.tokens)


def test_flag_coincides_with_topk_on_peaked_model(ctx):
    """On a sharpened distribution (x8 embeddings make softmax one-hot),
    every multinomial draw is the top token, so strict mode must produce
    the identical token stream to top-k mode — the equality that keeps
    the beam parity rows valid for both schemes."""
    import jax.tree_util as jtu

    sharp = wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"),
        seed=3)
    # sharpen the vocab projection so probs are effectively one-hot
    sharp.params["decoder"]["token_embed"] = (
        sharp.params["decoder"]["token_embed"] * 8.0)
    rng = np.random.default_rng(9)
    audio = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)

    outs = []
    for flag in (False, True):
        st = sharp.create_state()
        st.full(_decisive_beam_p(flag), audio)
        outs.append([[td.id for td in s.tokens] for s in st.segments])
    assert outs[0] == outs[1]


def test_host_twin_multinomial(ctx):
    """The host-stepped twin honors the flag (its per-decoder rngs mirror
    the reference's per-decoder mt19937) and still produces valid rows."""
    from whisper_tpu.decoding import filters
    from whisper_tpu.decoding.host_loop import decode_window_host

    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    p = _decisive_beam_p(True)
    st = ctx.create_state()
    st.pcm_to_mel(audio)
    consts, tids = filters.build_filter_consts(ctx.vocab, ctx.hparams, p)
    st.encode(0)
    from whisper_tpu.decoding.device_loop import BEAM
    res = decode_window_host(
        st, p, consts, tids, [ctx.vocab.token_sot], 0.0, 0, st.n_len_org,
        n_dec=3, strategy=BEAM)
    assert int(res.n_tokens) > 0
    assert (np.asarray(res.tokens)[:, 0] >= 0).all()
