"""Token-timestamp tests: heuristic (src/whisper.cpp:8390-8615) and DTW
(:8617-8931)."""

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import (
    AlignmentHeadsPreset,
    ContextParams,
    DtwParams,
    FullParams,
)
from whisper_tpu.decoding import dtw as dtw_mod
from whisper_tpu.decoding import timestamps as ts_mod


def test_voice_length():
    assert ts_mod.voice_length(" ") == pytest.approx(0.01)
    assert ts_mod.voice_length(",") == pytest.approx(2.0)
    assert ts_mod.voice_length(".!?") == pytest.approx(9.0)
    assert ts_mod.voice_length("42") == pytest.approx(6.0)
    assert ts_mod.voice_length("ab") == pytest.approx(2.0)


def test_signal_energy_window():
    x = np.zeros(100, np.float32)
    x[50] = 1.0
    e = ts_mod.get_signal_energy(x, 2)
    assert e[50] == pytest.approx(1 / 5)
    assert e[48] == pytest.approx(1 / 5)
    assert e[47] == pytest.approx(0.0)
    # edge: constant divisor even with truncated window
    x2 = np.ones(10, np.float32)
    e2 = ts_mod.get_signal_energy(x2, 2)
    assert e2[0] == pytest.approx(3 / 5)


def test_median_filter_reflect():
    x = np.array([[1.0, 5.0, 2.0, 8.0, 3.0]])
    out = dtw_mod.median_filter_reflect(x, 3)
    # position 0: window (reflect) [5,1,5] -> 5;  position 2: [5,2,8] -> 5
    assert out[0, 0] == 5.0
    assert out[0, 2] == 5.0


def test_dtw_path_identity():
    # strong diagonal -> path stays on diagonal
    N = 6
    x = np.ones((N, N)) * 10.0
    np.fill_diagonal(x, 0.0)
    ti, fi = dtw_mod.dtw_path(x)
    # endpoints hit all tokens and all frames
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == N - 1 and fi[-1] == N - 1
    # monotonic
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    # the diagonal cells are all on the path
    cells = set(zip(ti.tolist(), fi.tolist()))
    for i in range(N):
        assert (i, i) in cells


def test_dtw_path_rect():
    x = np.zeros((3, 10))
    ti, fi = dtw_mod.dtw_path(x)
    assert ti[-1] == 2 and fi[-1] == 9
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()


def test_resolve_alignment_heads():
    hp = tiny_test_hparams()
    cp = ContextParams(dtw=DtwParams(mode=AlignmentHeadsPreset.TINY))
    heads = dtw_mod.resolve_alignment_heads(cp, hp)
    assert heads == [(2, 2), (3, 0), (3, 2), (3, 3), (3, 4), (3, 5)]
    cp2 = ContextParams(dtw=DtwParams(mode=AlignmentHeadsPreset.N_TOP_MOST, n_top=1))
    heads2 = dtw_mod.resolve_alignment_heads(cp2, hp)
    assert heads2 == [(hp.n_text_layer - 1, h) for h in range(hp.n_text_head)]
    cp3 = ContextParams()
    assert dtw_mod.resolve_alignment_heads(cp3, hp) == []


def test_heuristic_timestamps_full(jfk_like_audio):
    ctx = wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"))
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    p.token_timestamps = True
    st.full(p, jfk_like_audio[: 16000 * 3])
    assert st.full_n_segments() >= 1
    for i in range(st.full_n_segments()):
        seg = st.full_get_segment(i)
        for td in seg.tokens:
            assert td.t0 >= 0 and td.t1 >= td.t0
        # token spans are ordered
        for a, b in zip(seg.tokens, seg.tokens[1:]):
            if a.id < ctx.token_eot() and b.id < ctx.token_eot():
                assert b.t0 >= a.t0 - 1


def test_dtw_timestamps_full(jfk_like_audio):
    """DTW path end-to-end with custom alignment heads on the micro model."""
    cp = ContextParams(
        dtype="float32",
        dtw_token_timestamps=True,
        dtw=DtwParams(mode=AlignmentHeadsPreset.CUSTOM,
                      custom_aheads=((0, 0), (1, 1))),
    )
    ctx = wt.WhisperContext.random(hp=tiny_test_hparams(), params=cp)
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    st.full(p, jfk_like_audio[: 16000 * 3])
    assert st.full_n_segments() >= 1
    stamped = [td.t_dtw for i in range(st.full_n_segments())
               for td in st.full_get_segment(i).tokens
               if td.id < ctx.token_eot() and td.t_dtw >= 0]
    assert stamped, "no DTW timestamps assigned"
    # monotonic non-decreasing
    assert all(b >= a for a, b in zip(stamped, stamped[1:]))


def test_wrap_segment():
    from whisper_tpu.api import Segment, TokenData
    from whisper_tpu.decoding.segments import wrap_segment
    from whisper_tpu.tokenizer import synthetic_vocab
    vocab = synthetic_vocab()
    toks = [TokenData(id=ord("a"), tid=0, p=1, plog=0, pt=0, ptsum=0, t0=i * 10, t1=i * 10 + 9)
            for i in range(10)]
    seg = Segment(t0=0, t1=100, text="a" * 10, tokens=toks)
    parts = wrap_segment(seg, vocab, max_len=3, split_on_word=False)
    assert len(parts) >= 3
    assert "".join(s.text for s in parts) == "a" * 10
    assert parts[0].t1 == parts[1].t0
