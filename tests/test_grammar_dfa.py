"""Token-level grammar DFA (decoding/grammar_dfa.py): the on-device grammar
path. The compiled reject/transition tables must reproduce the host pushdown
machine (decoding/grammar.py — itself differentially validated against the
reference binary in test_reference_parity.py::test_grammar_parity), and the
device decode under the DFA must equal the host-stepped decode token for
token."""

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.config import FullParams, SamplingStrategy
from whisper_tpu.decoding.grammar import PartialUtf8, parse_gbnf
from whisper_tpu.decoding.grammar_dfa import cached_dfa, compile_token_dfa

GBNF = """\
root ::= item (ws item)*
ws   ::= " "
item ::= word | num
word ::= "the" | "and" | "ask" | "é"
num  ::= [0-9] [0-9]?
"""


def test_dfa_matches_host_machine(tiny_ctx):
    """Every reachable DFA state's reject row and transitions must agree
    with Grammar.rejected_tokens / accept_token run live."""
    vocab = tiny_ctx.vocab
    parsed = parse_gbnf(GBNF, "root")
    dfa = compile_token_dfa(parsed, vocab)
    assert dfa is not None and dfa.n_states >= 3

    # replay 200 random walks through the machine, comparing live vs table
    rng = np.random.default_rng(0)
    for _ in range(20):
        g = parsed.instance()
        sid = dfa.start
        for _step in range(10):
            live_rej = np.zeros(vocab.n_vocab, bool)
            live_rej[g.rejected_tokens(vocab)] = True
            np.testing.assert_array_equal(dfa.reject[sid], live_rej)
            allowed = np.nonzero(~live_rej[: vocab.token_eot])[0]
            if len(allowed) == 0:
                break
            # bias towards allowed tokens but sometimes take a rejected one
            # (soft-penalty sampling can do that; the dead-state transition
            # must match too)
            pool = allowed if rng.random() < 0.8 else np.arange(vocab.token_eot)
            tok = int(rng.choice(pool))
            g.accept_token(vocab, tok)
            sid = int(dfa.trans[sid, tok])


def test_dfa_canonicalization_partial_utf8(tiny_ctx):
    """Mid-codepoint states (after a lone UTF-8 lead byte) are real states:
    taking byte 0xC3 of "é" must land in a state that only accepts the
    continuation byte 0xA9."""
    vocab = tiny_ctx.vocab
    parsed = parse_gbnf('root ::= "é"\n', "root")
    dfa = compile_token_dfa(parsed, vocab)
    assert dfa is not None
    s1 = int(dfa.trans[dfa.start, 0xC3])          # byte token 0xC3
    assert s1 != dfa.start
    g = parsed.instance()
    g.accept_token(vocab, 0xC3)
    assert g.partial_utf8.n_remain == 1
    live_rej = np.zeros(vocab.n_vocab, bool)
    live_rej[g.rejected_tokens(vocab)] = True
    np.testing.assert_array_equal(dfa.reject[s1], live_rej)
    # continuation byte is allowed, any ASCII byte is rejected
    assert not dfa.reject[s1, 0xA9]
    assert dfa.reject[s1, ord("a")]


def test_recursive_grammar_falls_back(tiny_ctx):
    """Center recursion has unbounded stack depth: the compiler must give
    up within budget (-> host loop) instead of looping forever."""
    parsed = parse_gbnf('root ::= "(" root ")" | "x"\n', "root")
    assert compile_token_dfa(parsed, tiny_ctx.vocab, max_states=64) is None


@pytest.mark.parametrize("strategy,penalty", [
    (SamplingStrategy.GREEDY, 10000.0),
    (SamplingStrategy.BEAM_SEARCH, 10000.0),
    (SamplingStrategy.GREEDY, 0.5),
], ids=["greedy", "beam", "soft-penalty"])
def test_device_grammar_equals_host(tiny_ctx, jfk_like_audio, strategy,
                                    penalty):
    """Full pipeline: the DFA device path must produce the same segments as
    the host-stepped loop (forced via a no-op logits_filter_callback). The
    soft-penalty case routinely samples rejected tokens, exercising the
    dead-state rows."""
    audio = jfk_like_audio[: 16000 * 2]

    def run(force_host):
        p = FullParams.default(strategy)
        p.language = "en"
        p.no_timestamps = True
        p.max_tokens = 10
        p.temperature = 0.0
        p.temperature_inc = 0.0
        p.entropy_thold = -1e9
        p.logprob_thold = -1e9
        p.no_speech_thold = 1e9
        p.print_progress = False
        p.grammar_rules = parse_gbnf(GBNF, "root")
        p.grammar_penalty = penalty
        if strategy == SamplingStrategy.BEAM_SEARCH:
            p.beam_search.beam_size = 3
            p.greedy.best_of = 3
        if force_host:
            p.logits_filter_callback = lambda *a, **k: None
        st = tiny_ctx.create_state()
        st.full(p, audio)
        return [(s.t0, s.t1, [td.id for td in s.tokens]) for s in st.segments]

    # the grammar must actually compile — otherwise both runs would fall
    # back to the host loop and the comparison proves nothing
    from whisper_tpu.tokenizer import synthetic_vocab
    assert cached_dfa(parse_gbnf(GBNF, "root"), tiny_ctx.vocab) is not None

    device = run(force_host=False)
    host = run(force_host=True)
    assert device == host
    assert device, "grammar decode produced no segments"


def test_cached_dfa_memoizes(tiny_ctx):
    parsed = parse_gbnf(GBNF, "root")
    d1 = cached_dfa(parsed, tiny_ctx.vocab)
    d2 = cached_dfa(parsed, tiny_ctx.vocab)
    assert d1 is d2


def test_dfa_fuzz_random_grammars(tiny_ctx):
    """Property test: for randomly generated GBNF grammars, every reachable
    (state, token) pair's reject bit and successor must match the live
    pushdown machine; grammars that don't compile must simply return None."""
    rng = np.random.default_rng(7)
    vocab = tiny_ctx.vocab
    WORDS = ['"the"', '"a b"', '"é"', '"日"', '"x0"', '"zz"']
    CLASSES = ['[a-c]', '[0-9]', '[^a-z]', '[xé0-2]']

    def gen_item(depth):
        r = rng.random()
        if r < 0.45:
            return WORDS[rng.integers(len(WORDS))]
        if r < 0.8:
            return CLASSES[rng.integers(len(CLASSES))]
        inner = " ".join(gen_item(depth + 1)
                         for _ in range(rng.integers(1, 3)))
        return "(" + inner + ")" + ["*", "?", "+"][rng.integers(3)]

    compiled = 0
    for trial in range(12):
        alts = [" ".join(gen_item(0) for _ in range(rng.integers(1, 4)))
                for _ in range(rng.integers(1, 4))]
        gbnf = "root ::= " + " | ".join(alts) + "\n"
        parsed = parse_gbnf(gbnf, "root")
        dfa = compile_token_dfa(parsed, vocab, max_states=256)
        if dfa is None:
            continue
        compiled += 1
        g = parsed.instance()
        sid = dfa.start
        for _step in range(8):
            live_rej = np.zeros(vocab.n_vocab, bool)
            live_rej[g.rejected_tokens(vocab)] = True
            np.testing.assert_array_equal(
                dfa.reject[sid], live_rej,
                err_msg=f"grammar={gbnf!r} step={_step} state={sid}")
            # mostly allowed tokens, sometimes any (dead-state coverage)
            allowed = np.nonzero(~live_rej[: vocab.token_eot])[0]
            pool = (allowed if len(allowed) and rng.random() < 0.7
                    else np.arange(vocab.token_eot))
            tok = int(rng.choice(pool))
            g.accept_token(vocab, tok)
            sid = int(dfa.trans[sid, tok])
    assert compiled >= 6, f"only {compiled}/12 fuzz grammars compiled"
