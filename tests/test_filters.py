"""Table-driven logit-filter tests (reference whisper_process_logits,
src/whisper.cpp:6183-6358)."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import FullParams
from whisper_tpu.decoding import filters
from whisper_tpu.tokenizer import synthetic_vocab


@pytest.fixture(scope="module")
def setup():
    vocab = synthetic_vocab(51864)
    hp = tiny_test_hparams()
    params = FullParams.default()
    consts, tids = filters.build_filter_consts(vocab, hp, params)
    return vocab, hp, params, consts, tids


def _text_heavy_logits(tids, B=1):
    """Zeros + one dominant text token: keeps rule 14 (timestamp-mass
    dominance) from zeroing all text, so other rules can be tested in
    isolation."""
    x = np.zeros((B, tids.n_vocab), np.float32)
    x[:, 500] = 10.0
    return x


def _run(consts, tids, logits, *, is_initial=False, last_was_ts=False,
         penult_was_ts=True, has_ts=False, seek_delta=3000, temperature=0.0):
    B = logits.shape[0]
    return filters.apply_filters(
        jnp.asarray(logits), consts, tids,
        is_initial=jnp.full(B, is_initial),
        last_was_ts=jnp.full(B, last_was_ts),
        penult_was_ts=jnp.full(B, penult_was_ts),
        has_ts=jnp.full(B, has_ts),
        seek_delta=jnp.full(B, seek_delta, jnp.int32),
        temperature=jnp.float32(temperature),
    )


def test_always_suppressed_tokens(setup):
    vocab, hp, params, consts, tids = setup
    logits = _text_heavy_logits(tids)
    lg, lp, pr = _run(consts, tids, logits)
    lg = np.asarray(lg)[0]
    for t in [vocab.token_not, vocab.token_sot, vocab.token_nosp,
              vocab.token_solm, vocab.token_translate, vocab.token_transcribe,
              vocab.token_prev, vocab.token_lang(0), vocab.token_lang(42)]:
        assert lg[t] == -np.inf, f"token {t} not suppressed"


def test_initial_blank_suppression(setup):
    vocab, hp, params, consts, tids = setup
    logits = _text_heavy_logits(tids)
    space = vocab.token_to_id[b" "]
    lg, _, _ = _run(consts, tids, logits, is_initial=True)
    lg = np.asarray(lg)[0]
    assert lg[vocab.token_eot] == -np.inf
    assert lg[space] == -np.inf
    # not suppressed when not initial
    lg2, _, _ = _run(consts, tids, logits, is_initial=False)
    lg2 = np.asarray(lg2)[0]
    assert lg2[space] != -np.inf


def test_max_initial_ts(setup):
    vocab, hp, params, consts, tids = setup
    # precision = 30/1500 = 0.02 s; max_initial_ts=1.0 -> tid0 = 50
    logits = np.zeros((1, tids.n_vocab), np.float32)
    lg, _, _ = _run(consts, tids, logits, is_initial=True)
    lg = np.asarray(lg)[0]
    assert lg[vocab.token_beg + 50] != -np.inf
    assert lg[vocab.token_beg + 51] == -np.inf


def test_timestamp_pairing_rules(setup):
    vocab, hp, params, consts, tids = setup
    logits = _text_heavy_logits(tids)
    # last + penultimate both timestamps -> no more timestamps
    lg, _, _ = _run(consts, tids, logits, last_was_ts=True, penult_was_ts=True)
    lg = np.asarray(lg)[0]
    assert (lg[vocab.token_beg:] == -np.inf).all()
    assert lg[500] != -np.inf
    # last ts, penultimate text -> only ts or EOT
    # (EOT gets a dominant logit so rule 14's text-vs-ts comparison — which
    # counts EOT as text — doesn't also erase it)
    logits2 = _text_heavy_logits(tids)
    logits2[0, vocab.token_eot] = 12.0
    lg, _, _ = _run(consts, tids, logits2, last_was_ts=True, penult_was_ts=False)
    lg = np.asarray(lg)[0]
    assert lg[100] == -np.inf
    assert lg[500] == -np.inf
    assert lg[vocab.token_eot] != -np.inf
    assert lg[vocab.token_beg + 10] != -np.inf


def test_monotonic_timestamps(setup):
    vocab, hp, params, consts, tids = setup
    logits = np.zeros((1, tids.n_vocab), np.float32)
    lg, _, _ = _run(consts, tids, logits, has_ts=True, seek_delta=100)
    lg = np.asarray(lg)[0]
    # tid0 = 50 -> timestamps below beg+50 are suppressed
    assert lg[vocab.token_beg + 49] == -np.inf
    assert lg[vocab.token_beg + 50] != -np.inf


def test_timestamp_logsumexp_rule(setup):
    vocab, hp, params, consts, tids = setup
    # make total timestamp mass dominate any single text token
    logits = np.zeros((1, tids.n_vocab), np.float32)
    logits[0, vocab.token_beg:] = 5.0
    lg, lp, pr = _run(consts, tids, logits)
    lg = np.asarray(lg)[0]
    assert (lg[:vocab.token_beg] == -np.inf).all()
    # and when text dominates, text survives
    logits2 = np.zeros((1, tids.n_vocab), np.float32)
    logits2[0, 100] = 20.0
    lg2, _, _ = _run(consts, tids, logits2)
    lg2 = np.asarray(lg2)[0]
    assert lg2[100] != -np.inf


def test_no_timestamps_mode():
    vocab = synthetic_vocab(51864)
    hp = tiny_test_hparams()
    params = FullParams.default()
    params.no_timestamps = True
    consts, tids = filters.build_filter_consts(vocab, hp, params)
    logits = np.zeros((1, tids.n_vocab), np.float32)
    lg, _, _ = _run(consts, tids, logits)
    lg = np.asarray(lg)[0]
    assert (lg[vocab.token_beg:] == -np.inf).all()


def test_suppress_nst():
    vocab = synthetic_vocab(51864)
    hp = tiny_test_hparams()
    params = FullParams.default()
    params.suppress_nst = True
    consts, tids = filters.build_filter_consts(vocab, hp, params)
    logits = _text_heavy_logits(tids)
    lg, _, _ = _run(consts, tids, logits)
    lg = np.asarray(lg)[0]
    # '"' and '#' are single-byte tokens in the synthetic vocab
    assert lg[ord('"')] == -np.inf
    assert lg[ord('#')] == -np.inf
    assert lg[ord('a')] != -np.inf


def test_suppress_regex():
    vocab = synthetic_vocab(51864)
    hp = tiny_test_hparams()
    params = FullParams.default()
    params.suppress_regex = "[0-9]"
    consts, tids = filters.build_filter_consts(vocab, hp, params)
    logits = _text_heavy_logits(tids)
    lg, _, _ = _run(consts, tids, logits)
    lg = np.asarray(lg)[0]
    assert lg[ord("7")] == -np.inf
    assert lg[ord("a")] != -np.inf


def test_probs_normalized_when_text_dominates(setup):
    """probs sum to 1 unless rule 14 fires (the reference does NOT
    renormalize after the timestamp-dominance rule — :6344-6352)."""
    vocab, hp, params, consts, tids = setup
    logits = _text_heavy_logits(tids, B=2)
    _, lp, pr = _run(consts, tids, logits)
    pr = np.asarray(pr)
    np.testing.assert_allclose(pr.sum(axis=-1), 1.0, rtol=1e-4)


def test_probs_not_renormalized_after_rule14(setup):
    vocab, hp, params, consts, tids = setup
    logits = np.zeros((1, tids.n_vocab), np.float32)
    logits[0, vocab.token_beg:] = 5.0   # timestamp mass dominates
    _, lp, pr = _run(consts, tids, logits)
    pr = np.asarray(pr)
    assert pr.sum() <= 1.0 + 1e-4
    assert (pr[0, :vocab.token_beg] == 0).all()


def test_timestamp_stats(setup):
    vocab, hp, params, consts, tids = setup
    logits = np.full((1, tids.n_vocab), -2.0, np.float32)
    logits[0, vocab.token_beg + 5] = 15.0
    _, _, pr = _run(consts, tids, logits)
    pt, ptsum, tid = filters.timestamp_stats(pr, tids)
    assert int(tid[0]) == vocab.token_beg + 5
    assert 0.9 < float(pt[0]) <= 1.0
    assert float(ptsum[0]) > 0.5
