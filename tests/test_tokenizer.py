"""Tokenizer/vocab tests (reference src/whisper.cpp:462-492, 1643-1692,
3288-3336 and the Rust-layer vocab tests in src/whisper_ctx.rs)."""

import numpy as np
import pytest

from whisper_tpu import languages
from whisper_tpu.tokenizer import Tokenizer, WhisperVocab, synthetic_vocab


def test_english_special_tokens():
    v = WhisperVocab(51864, [b"a"] * 50256)
    assert v.token_eot == 50256
    assert v.token_sot == 50257
    assert v.token_beg == 50363
    assert not v.is_multilingual
    assert v.num_languages == 99


def test_multilingual_shift_99_langs():
    v = WhisperVocab(51865, [b"a"] * 50256)
    assert v.is_multilingual
    assert v.num_languages == 99
    assert v.token_eot == 50257
    assert v.token_sot == 50258
    # dt = 99 - 98 = 1
    assert v.token_translate == 50358
    assert v.token_transcribe == 50359
    assert v.token_beg == 50364


def test_large_v3_shift_100_langs():
    v = WhisperVocab(51866, [b"a"] * 50256)
    assert v.num_languages == 100
    assert v.token_beg == 50365
    assert v.token_lang(99) == v.token_sot + 100  # yue


def test_extra_token_synthesis():
    v = WhisperVocab(51864, [b"x"] * 50256)
    assert v.id_to_token[v.token_eot] == b"[_EOT_]"
    assert v.id_to_token[v.token_sot] == b"[_SOT_]"
    assert v.id_to_token[v.token_beg] == b"[_BEG_]"
    assert v.id_to_token[v.token_beg + 7] == b"[_TT_7]"
    assert v.id_to_token[v.token_lang(0)] == b"[_LANG_en]"


def test_language_table():
    assert languages.lang_id("en") == 0
    assert languages.lang_id("english") == 0
    assert languages.lang_id("yue") == 99
    assert languages.lang_id("cantonese") == 99
    assert languages.lang_id("nope") == -1
    assert languages.lang_str(1) == "zh"
    assert languages.lang_str_full(2) == "german"
    assert languages.lang_max_id() == 99
    assert len(languages.LANGUAGES) == 100


def test_greedy_longest_match():
    v = synthetic_vocab()
    tk = Tokenizer(v)
    toks = tk.encode(" the country")
    # " the" and " country" exist as merged tokens -> greedy should use them
    assert v.id_to_token[toks[0]] == b" the"
    assert v.id_to_token[toks[1]] == b" country"
    assert tk.decode(toks) == " the country"


def test_byte_fallback_roundtrip():
    v = synthetic_vocab()
    tk = Tokenizer(v)
    text = "Zq9@#!"
    assert tk.decode(tk.encode(text)) == text


def test_utf8_multibyte_roundtrip():
    v = synthetic_vocab()
    tk = Tokenizer(v)
    text = "héllo wörld 中文"
    assert tk.decode(tk.encode(text)) == text


def test_decode_skips_special():
    v = synthetic_vocab()
    tk = Tokenizer(v)
    toks = tk.encode("hi") + [v.token_eot, v.token_beg]
    assert tk.decode(toks) == "hi"
    assert "[_EOT_]" in tk.decode(toks, skip_special=False)


def test_timestamp_helpers():
    v = synthetic_vocab()
    assert v.is_timestamp(v.token_beg)
    assert not v.is_timestamp(v.token_beg - 1)
    assert v.timestamp_to_time(v.token_beg) == 0
    assert v.timestamp_to_time(v.token_beg + 50) == 100  # 50*20ms = 1.0s = 100 cs
