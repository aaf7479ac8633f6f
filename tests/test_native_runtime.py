"""Native C++ runtime parity tests: the .so must match the numpy reference
implementations bit-for-bit-ish. Skipped when no toolchain is available."""

import numpy as np
import pytest

from whisper_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built (no g++?)")


def _numpy_dequant(raw, ttype, nelems):
    """Call the pure-numpy codepath directly (bypass native dispatch)."""
    from whisper_tpu.checkpoint import quant
    buf = np.frombuffer(raw, np.uint8)
    if ttype == quant.GGML_TYPE_F16:
        return buf.view(np.float16)[:nelems].astype(np.float32)
    nb = nelems // 32
    bs = quant.type_size(ttype)
    blocks = buf[: nb * bs].reshape(nb, bs)
    # reuse quant's private helpers via dequantize on a small copy with the
    # native path disabled by size (< 1<<16 threshold)
    assert nelems < 1 << 16
    return quant.dequantize(raw, ttype, nelems)


@pytest.mark.parametrize("ttype", [2, 3, 6, 7, 8])
def test_dequant_matches_numpy(ttype):
    from whisper_tpu.checkpoint import quant
    rng = np.random.default_rng(ttype)
    x = rng.standard_normal(32 * 512).astype(np.float32)
    raw = quant.quantize(x, ttype)
    want = _numpy_dequant(raw, ttype, x.size)            # numpy (small size)
    got = native.dequantize(ttype, raw, x.size)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("ttype", [10, 11, 12, 13, 14],
                         ids=["q2_K", "q3_K", "q4_K", "q5_K", "q6_K"])
def test_kquant_dequant_matches_numpy(ttype):
    """K-quant super-block decoders (runtime.cpp dequant_block_q*_K vs the
    vectorized numpy in quant.py) must agree bit-for-bit."""
    from whisper_tpu.checkpoint import quant
    rng = np.random.default_rng(ttype)
    x = (rng.standard_normal(64 * 256) * 0.3).astype(np.float32)
    raw = quant.quantize(x, ttype)
    want = quant._K_DEQUANT[ttype](
        np.frombuffer(raw, np.uint8).reshape(-1, quant.type_size(ttype)))
    got = native.dequantize(ttype, raw, x.size)
    np.testing.assert_array_equal(got, want)


def test_dequant_f16():
    x = np.linspace(-3, 3, 1024, dtype=np.float32).astype(np.float16)
    got = native.dequantize(1, x.tobytes(), x.size)
    np.testing.assert_array_equal(got, x.astype(np.float32))


def test_dequant_threaded_large():
    from whisper_tpu.checkpoint import quant
    rng = np.random.default_rng(0)
    x = rng.standard_normal(32 * 40000).astype(np.float32)  # > threshold
    raw = quant.quantize(x, quant.GGML_TYPE_Q5_0)
    got = quant.dequantize(raw, quant.GGML_TYPE_Q5_0, x.size)  # native path
    step = np.abs(x.reshape(-1, 32)).max(axis=1) / 15 + 1e-6
    assert np.all(np.abs(x.reshape(-1, 32) - got.reshape(-1, 32)).max(axis=1)
                  <= step * 1.6)


def test_dtw_matches_python():
    from whisper_tpu.decoding import dtw as dtw_mod
    rng = np.random.default_rng(1)
    x = rng.standard_normal((40, 90)).astype(np.float32)
    # python reference: temporarily disable native
    import whisper_tpu.runtime.native as nat
    got_t, got_f = nat.dtw(x)
    old = nat.dtw
    try:
        nat.dtw = lambda _: None
        want_t, want_f = dtw_mod.dtw_path(x.astype(np.float64))
    finally:
        nat.dtw = old
    np.testing.assert_array_equal(got_t, want_t)
    np.testing.assert_array_equal(got_f, want_f)


def test_signal_energy_matches_numpy():
    from whisper_tpu.decoding import timestamps as ts
    rng = np.random.default_rng(2)
    x = rng.standard_normal(5000).astype(np.float32)
    got = native.signal_energy(x, 32)
    kernel = np.ones(65, np.float32)
    want = (np.convolve(np.abs(x), kernel, mode="same") / 65).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dequant_speed_advantage():
    """Native threaded dequant should beat numpy on a large tensor."""
    import time
    from whisper_tpu.checkpoint import quant
    rng = np.random.default_rng(0)
    x = rng.standard_normal(32 * 100_000).astype(np.float32)
    raw = quant.quantize(x, quant.GGML_TYPE_Q5_0)
    t0 = time.perf_counter()
    native.dequantize(quant.GGML_TYPE_Q5_0, raw, x.size)
    t_nat = time.perf_counter() - t0
    # numpy path: force via internal helpers on the same data
    buf = np.frombuffer(raw, np.uint8)
    t0 = time.perf_counter()
    nb = x.size // 32
    blocks = buf[: nb * 22].reshape(nb, 22)
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
    qh = blocks[:, 2:6].copy().view(np.uint32).reshape(-1)
    q = quant._split_nibbles(blocks[:, 6:22]) | (quant._qh_bits(qh) << 4)
    _ = ((q - 16) * d).astype(np.float32)
    t_np = time.perf_counter() - t0
    # don't be flaky: just require native isn't drastically slower
    # loaded CI boxes make wall-clock ratios unreliable; require only
    # that the native path is not catastrophically slower
    assert t_nat < t_np * 10.0 + 0.05, (t_nat, t_np)


def test_grammar_native_matches_python(monkeypatch):
    """Native GBNF engine (runtime.cpp wtpu_grammar_rejects/_accept) must
    agree with the Python machine on rejects and post-accept stacks."""
    import numpy as np
    import pytest

    from whisper_tpu.decoding import grammar as gmod
    from whisper_tpu.runtime import native
    from whisper_tpu.tokenizer import synthetic_vocab

    if not native.available():
        pytest.skip("native runtime unavailable")

    g_text = r'''
root ::= item (", " item)*
item ::= "yes" | "no" | num | uni
num ::= [0-9]+
uni ::= "é" [a-z]*
'''
    vocab = synthetic_vocab(51865)
    parsed = gmod.parse_gbnf(g_text)

    g_native = parsed.instance()
    g_py = parsed.instance()

    # force the Python fallback on the oracle instance
    monkeypatch.setattr(native, "grammar_rejects", lambda *a, **k: None)
    monkeypatch.setattr(native, "grammar_accept", lambda *a, **k: None)
    rej_py = set(g_py.rejected_tokens(vocab))
    monkeypatch.undo()
    rej_nat = set(g_native.rejected_tokens(vocab))
    assert rej_nat == rej_py
    assert len(rej_nat) > 0

    # accept a few grammar-legal tokens and re-compare after each
    for _ in range(4):
        legal = [t for t in range(vocab.token_eot)
                 if t not in rej_nat and vocab.id_to_token[t]]
        if not legal:
            break
        tid = legal[0]
        g_native.accept_token(vocab, tid)
        monkeypatch.setattr(native, "grammar_accept", lambda *a, **k: None)
        g_py.accept_token(vocab, tid)
        monkeypatch.undo()
        assert sorted(tuple(s) for s in g_native.stacks) == \
            sorted(tuple(s) for s in g_py.stacks), tid
        assert (g_native.partial_utf8.value, g_native.partial_utf8.n_remain) == \
            (g_py.partial_utf8.value, g_py.partial_utf8.n_remain)

        monkeypatch.setattr(native, "grammar_rejects", lambda *a, **k: None)
        rej_py = set(g_py.rejected_tokens(vocab))
        monkeypatch.undo()
        rej_nat = set(g_native.rejected_tokens(vocab))
        assert rej_nat == rej_py
