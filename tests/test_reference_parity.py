"""Differential parity against the ACTUAL reference binary.

Builds whisper.cpp CPU-only from /root/reference (tests/ref_harness/build.py,
cached in /tmp), fabricates one random-weight ggml checkpoint that BOTH
systems load, and asserts:

  1. mel spectrograms agree to < 1e-4 max-abs (reference debug dump,
     src/whisper.cpp:3264-3273, vs audio/mel.py);
  2. the tokenizer produces identical ids on a multilingual corpus
     (reference whisper_tokenize, src/whisper.cpp:3288-3336);
  3. whisper_full's segment token streams are identical under the decisive
     config — suppress_regex shrinking the candidate set + no_timestamps +
     max_tokens + fallback disabled (per CLAUDE.md: never compare argmax
     over 51k near-uniform random-weight logits across different program
     structures) — greedy AND beam-5.

This mirrors the reference's own golden-output test strategy
(sys/whisper.cpp/tests/run-tests.sh:88-120 and the stub-model ctest at
tests/CMakeLists.txt:18-91), pointed at our implementation instead.
"""

import json
import subprocess

import numpy as np
import pytest

import whisper_tpu as wt
from whisper_tpu.audio import mel as mel_mod
from whisper_tpu.checkpoint import ggml_io, quant
from whisper_tpu.checkpoint.init import tiny_test_hparams
from whisper_tpu.config import ContextParams, FullParams, SamplingStrategy
from whisper_tpu.tokenizer import synthetic_vocab

pytestmark = pytest.mark.slow


@pytest.fixture(scope="session")
def ref_harness():
    from tests.ref_harness.build import build_reference
    try:
        return str(build_reference())
    except Exception as e:  # missing toolchain/reference tree: skip, not fail
        pytest.skip(f"cannot build reference whisper.cpp: {e}")


def _write_parity_model(path, sharp, n_vocab: int = 51864,
                        n_text_layer: int = 2, width: int = 0,
                        n_audio_layer: int = 0):
    import dataclasses
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_ggml_io import _make_test_tensors

    # ftype=1 (f16 weights, the standard distribution format): whisper.cpp
    # allocates 2-D weights with the hparams ftype and reads tensor data
    # raw, so per-tensor ttypes must match; f16->f32 dequant is exact on
    # both sides (ggml's f32 conv path aborts in this vendored build)
    hp = dataclasses.replace(tiny_test_hparams(n_vocab=n_vocab),
                             n_text_layer=n_text_layer)
    if width:
        hp = dataclasses.replace(
            hp, n_audio_state=width, n_text_state=width,
            n_audio_head=max(2, width // 64), n_text_head=max(2, width // 64))
    if n_audio_layer:
        hp = dataclasses.replace(hp, n_audio_layer=n_audio_layer)
    vocab = synthetic_vocab(hp.n_vocab)
    tensors = _make_test_tensors(hp, ttype=quant.GGML_TYPE_F16)
    if sharp:
        # scale up the output embedding -> sharply separated logits, so
        # argmax/beam ordering is identical across implementations despite
        # f16-vs-f32 activation noise. 60x (beam tests) drives non-argmax
        # softmax probs to exact-0 underflow; 8x (timestamp tests) keeps
        # decisive gaps while timestamp probabilities stay nonzero
        scale = 60.0 if sharp is True else float(sharp)
        arr, tt = tensors["decoder.token_embedding.weight"]
        tensors["decoder.token_embedding.weight"] = (arr * scale, tt)
    ggml_io.write_ggml(
        str(path), hp, mel_mod.mel_filterbank(hp.n_mels),
        vocab.id_to_token[:50256], tensors)
    return str(path)


@pytest.fixture(scope="session")
def parity_model(tmp_path_factory):
    """One fabricated checkpoint both systems read."""
    return _write_parity_model(
        tmp_path_factory.mktemp("parity") / "model.bin", sharp=False)


@pytest.fixture(scope="session")
def parity_model_sharp(tmp_path_factory):
    return _write_parity_model(
        tmp_path_factory.mktemp("parity_sharp") / "model.bin", sharp=True)


@pytest.fixture(scope="session")
def parity_model_semi(tmp_path_factory):
    """8x logits: decisive argmaxes, but timestamp probabilities do not
    underflow to exact 0 (the x60 model zeroes every non-argmax prob,
    which trips the reference's tid=0 quirk — see filters.timestamp_stats).
    3 decoder layers: n_text_layer==2 && n_vocab!=51866 trips BOTH systems'
    distil-whisper detection, which force-disables timestamps
    (src/whisper.cpp:6954-6959)."""
    return _write_parity_model(
        tmp_path_factory.mktemp("parity_semi") / "model.bin", sharp=8.0,
        n_text_layer=3)


@pytest.fixture(scope="session")
def parity_model_multi(tmp_path_factory):
    """Multilingual variant (n_vocab=51865): exercises the special-token
    shift (src/whisper.cpp:1643-1657), the 100 [_LANG_*] token synthesis,
    and the [SOT, lang, task] prompt construction in both systems."""
    return _write_parity_model(
        tmp_path_factory.mktemp("parity_multi") / "model.bin", sharp=True,
        n_vocab=51865)


@pytest.fixture(scope="session")
def parity_audio():
    """Deterministic 2.5 s of structured audio (sines + noise)."""
    rng = np.random.default_rng(42)
    t = np.arange(int(2.5 * 16000), dtype=np.float32) / 16000.0
    x = (0.30 * np.sin(2 * np.pi * 220.0 * t)
         + 0.20 * np.sin(2 * np.pi * 880.0 * t * (1 + 0.2 * t))
         + 0.05 * rng.standard_normal(t.shape))
    return x.astype(np.float32)


def _run_ref(harness, args, cwd, stdin=None, timeout=300, env=None):
    import os
    full_env = {**os.environ, **(env or {})}
    res = subprocess.run(
        [harness, *args], cwd=cwd, input=stdin, capture_output=True,
        text=True, timeout=timeout, env=full_env)
    assert res.returncode == 0, f"ref_harness failed: {res.stderr[-2000:]}"
    return res.stdout


def _parse_segments(out):
    segs = []
    for line in out.splitlines():
        if line.startswith("SEG "):
            _, t0, t1, ids = line.split(" ", 3)
            segs.append((int(t0), int(t1),
                         [int(x) for x in ids.split(",")] if ids else []))
    return segs


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dur_s", [0.37, 2.5, 31.0])
def test_mel_parity(ref_harness, parity_model, parity_audio, tmp_path, dur_s):
    """Reference log_mel_spectrogram (src/whisper.cpp:3186-3276) vs ours —
    at a sub-second length (odd frame counts through the reflect pad), the
    standard case, and one crossing the 30 s window boundary."""
    if dur_s == 2.5:
        audio = parity_audio
    else:
        rng = np.random.default_rng(int(dur_s * 100))
        t = np.arange(int(dur_s * 16000), dtype=np.float32) / 16000.0
        audio = (0.3 * np.sin(2 * np.pi * 260.0 * t)
                 + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    parity_audio = audio
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    # WHISPER_DEBUG_MEL re-enables the reference's dump (see
    # ref_harness/build.py:_patch_mel_dump — the upstream debug flag is
    # dead code at the :3892 call site)
    _run_ref(ref_harness,
             ["full", parity_model, str(pcm), "--max-tokens", "2"],
             cwd=tmp_path, env={"WHISPER_DEBUG_MEL": "1"})
    dump = tmp_path / "log_mel_spectrogram.json"
    assert dump.exists(), "reference --debug produced no mel dump"
    ref_mel = np.asarray(json.loads(dump.read_text()), np.float32)

    ours, n_len, n_len_org = mel_mod.log_mel_spectrogram(
        parity_audio, mel_mod.mel_filterbank(80))
    ours = np.asarray(ours)
    assert ours.size == ref_mel.size, (ours.shape, ref_mel.size)
    diff = np.abs(ours.flatten() - ref_mel)
    assert diff.max() < 1e-4, f"mel max-abs-diff {diff.max():.2e}"


TOKENIZE_CORPUS = [
    "Hello world",
    " And so my fellow Americans, ask not what your country can do for you",
    "the quick brown fox. Jumped!  over?",
    "你好世界，今天天气很好。",          # CJK
    "Привет мир, как дела?",             # Cyrillic
    "abc123 42nd 3.14159 1,000,000",     # digit mixes
    "mixé café naïve Zürich",            # accented latin
    "日本語とEnglishの mixed text 123",  # mixed scripts
    "   leading spaces and\ttabs",
    "don't it's we're I'll they've",     # apostrophe contractions
    "emoji 🚀 test ©®™",
    # Unicode classes where [^\W\d_] could diverge from \p{L} (VERDICT r2
    # weak #6): Lt titlecase digraphs, Lm modifier letters, Mn combining
    # marks mid-word, non-Latin Nd digits, mixed-script digit/letter runs
    "ǅungla ǈubljana ǋegoš Ǳur",                # Lt titlecase (ǅ ǈ ǋ ǲ)
    "weakʰ aːt ᵒᵏ ʻokina ˈstress",              # Lm modifier letters
    "café vélo ñ äb",   # Mn combining after letters
    "٠١٢٣ ٤٥ arabic ٩ digits",                  # Arabic-Indic Nd
    "देवनागरी १२३४ अंक ९",                      # Devanagari letters + Nd
    "বাংলা সংখ্যা ০১২ ৯",                       # Bengali + Nd
    "๓ thai ๑๒๓ ໐ lao",                          # Thai/Lao Nd
    "Ⅷ roman Ⅻ ⅔ fraction",                     # Nl/No numerals (non-Nd)
    "ŉandu ǌever ẛoft ﬁle ﬆop",                 # deprecated Lm/ligatures
    "Ωμέγα ΔΈΛΤΑ ŉ ǰ",                           # Greek + odd case forms
    "한국어１２３全角ＡＢＣ digits",             # fullwidth Nd/latin
    "ر‌بط zero-width ‍ joiners",                 # ZWNJ/ZWJ (Cf) mid-text
    # byte-level split semantics (r3): the reference's std::regex runs over
    # bytes in the C locale, so "_" joins the punctuation run and ASCII
    # letters break at non-ASCII ones ("caf|é"). The old Unicode-class
    # approximation dropped "_" and kept mixed runs whole.
    "a_b __init__ _ snake_case_name x_",        # underscores (in \w, not :alpha:)
    "café xЖy aΩb ŽivaN half-ЛАТ mix",          # ASCII/non-ASCII letter boundaries
    "Ａb ｃＤ fullwidth-ascii mix ５6",          # fullwidth letters/digits + ASCII
    "١2 mix ٣4 digit-boundaries ５١",           # ASCII/non-ASCII digit boundaries
    "",
]


def test_tokenizer_fuzz_parity(ref_harness, parity_model, tmp_path):
    """Property fuzz: 300 random mixed-script strings through both
    tokenizers. The split is now a byte-exact reproduction of the
    reference's C-locale std::regex, so every sample must agree — this
    locks the equivalence beyond the curated corpus."""
    rng = np.random.default_rng(2024)
    alphabet = (
        [chr(c) for c in range(0x20, 0x7f)]              # ASCII
        + ["é", "ß", "ñ", "Ж", "щ", "你", "好", "語", "ع", "ر",
           "🚀", "٣", "١", "５", "Ａ", "ǅ", "ʰ", "_", "\t", " ", "  "])
    lines = []
    for _ in range(300):
        n = int(rng.integers(1, 24))
        s = "".join(alphabet[int(i)] for i in rng.integers(0, len(alphabet), n))
        lines.append(s.replace("\n", " ").replace("\r", " "))
    out = _run_ref(ref_harness, ["tokenize", parity_model], cwd=tmp_path,
                   stdin="\n".join(lines) + "\n")
    ref_lines = out.splitlines()
    assert len(ref_lines) == len(lines)
    ctx = wt.WhisperContext.new_with_params(parity_model)
    for text, ref_line in zip(lines, ref_lines):
        ref_ids = [int(x) for x in ref_line.split()] if ref_line else []
        assert ctx.tokenize(text) == ref_ids, repr(text)


def test_tokenizer_parity(ref_harness, parity_model, tmp_path):
    """whisper_tokenize (src/whisper.cpp:3288-3336) vs tokenizer.py on a
    multilingual corpus (VERDICT r1 item 10: the \\p{L}/\\p{N} regex
    approximation needs proof)."""
    out = _run_ref(ref_harness, ["tokenize", parity_model], cwd=tmp_path,
                   stdin="\n".join(TOKENIZE_CORPUS) + "\n")
    ref_lines = out.splitlines()
    assert len(ref_lines) == len(TOKENIZE_CORPUS)

    ctx = wt.WhisperContext.new_with_params(parity_model)
    for text, ref_line in zip(TOKENIZE_CORPUS, ref_lines):
        ref_ids = [int(x) for x in ref_line.split()] if ref_line else []
        ours = ctx.tokenize(text)
        assert ours == ref_ids, f"tokenize({text!r}): {ours} != {ref_ids}"


# decisive config: only tokens starting with " t" survive (" the", " to"),
# so every argmax is over 2 well-separated random logits — robust to
# ulp-level reduction-order differences between XLA and ggml
DECISIVE_REGEX = "(?![ ]t).*"
N_TOK = 8


def _ours_full(parity_model, parity_audio, beam=0, language="en",
               timestamps=False, initial_prompt=None, translate=False,
               suppress_regex=DECISIVE_REGEX):
    ctx = wt.WhisperContext.new_with_params(
        parity_model, ContextParams(dtype="float32"))
    p = FullParams.default(
        SamplingStrategy.BEAM_SEARCH if beam else SamplingStrategy.GREEDY)
    p.language = language
    p.no_timestamps = not timestamps
    p.max_tokens = N_TOK
    p.suppress_regex = suppress_regex
    p.initial_prompt = initial_prompt
    p.translate = translate
    p.temperature = 0.0
    p.temperature_inc = 0.0          # decisive: no fallback ladder
    p.entropy_thold = -1e9
    p.logprob_thold = -1e9
    p.no_speech_thold = 1e9
    p.single_segment = False
    p.print_progress = False
    if beam:
        p.beam_search.beam_size = beam
        p.greedy.best_of = beam
    else:
        p.greedy.best_of = 1
    st = ctx.create_state()
    st.full(p, parity_audio)
    segs = []
    for s in st.segments:
        segs.append((s.t0, s.t1, [td.id for td in s.tokens]))
    return segs


@pytest.mark.parametrize("beam", [0, 5], ids=["greedy", "beam5"])
def test_full_token_parity(ref_harness, parity_model, parity_model_sharp,
                           parity_audio, tmp_path, beam):
    """whisper_full segment token streams, decisive config, greedy + beam-5
    (reference orchestrator src/whisper.cpp:6795-7711). Beam uses the
    sharp-logit model: cumulative beam-score ordering needs well-separated
    candidates to be implementation-independent."""
    model = parity_model_sharp if beam else parity_model
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    args = ["full", model, str(pcm),
            "--max-tokens", str(N_TOK), "--suppress-regex", DECISIVE_REGEX]
    if beam:
        args += ["--beam", str(beam)]
    ref_segs = _parse_segments(_run_ref(ref_harness, args, cwd=tmp_path))
    our_segs = _ours_full(model, parity_audio, beam=beam)

    ref_tokens = [ids for _, _, ids in ref_segs]
    our_tokens = [[t for t in ids if t < 50256] for _, _, ids in our_segs]
    # reference emission drops special tokens from segments already
    ref_tokens = [[t for t in ids if t < 50256] for ids in ref_tokens]
    assert our_tokens == ref_tokens, (
        f"segment token streams differ:\nref:  {ref_tokens}\nours: {our_tokens}")


def _only_text(segs):
    return [[t for t in ids if t < 50256] for _, _, ids in segs]


def test_full_token_parity_multilingual(ref_harness, parity_model_multi,
                                        parity_audio, tmp_path):
    """Multilingual model, language zh + the translate task: exercises the
    special-token shift and [SOT, lang, task] prompt against the reference
    (src/whisper.cpp:1643-1690, :6940-6965)."""
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    for extra in ([], ["--translate"]):
        args = ["full", parity_model_multi, str(pcm),
                "--max-tokens", str(N_TOK),
                "--suppress-regex", DECISIVE_REGEX,
                "--language", "zh", *extra]
        ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                                  cwd=tmp_path)))
        ours = _only_text(_ours_full(parity_model_multi, parity_audio,
                                     language="zh",
                                     translate=bool(extra)))
        assert ours == ref, f"(translate={bool(extra)}) {ours} != {ref}"


def test_full_token_parity_with_timestamps(ref_harness, parity_model_semi,
                                           parity_audio, tmp_path):
    """Timestamps ON: exercises the timestamp pairing rules, max_initial_ts,
    the ts-vs-text logsumexp rule, and segment emission/seek_delta
    (src/whisper.cpp:6262-6358, :7546-7675). Compares full token streams
    INCLUDING timestamp tokens plus segment (t0, t1)."""
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    # keep timestamp tokens ([_TT_*] in the synthesized vocab) sampleable —
    # a regex suppressing ALL of them hits a documented deviation (see
    # filters.timestamp_stats: the reference emits t0 = seek - 100726)
    regex = "(?![ ]t|\\[_TT_).*"
    args = ["full", parity_model_semi, str(pcm),
            "--max-tokens", str(N_TOK),
            "--suppress-regex", regex, "--timestamps"]
    ref = _parse_segments(_run_ref(ref_harness, args, cwd=tmp_path))
    ours = _ours_full(parity_model_semi, parity_audio, timestamps=True,
                      suppress_regex=regex)
    assert [(t0, t1) for t0, t1, _ in ours] == [(t0, t1) for t0, t1, _ in ref]
    assert [ids for _, _, ids in ours] == [ids for _, _, ids in ref]


def test_initial_prompt_parity(ref_harness, parity_model, parity_audio,
                               tmp_path):
    """initial_prompt: tokenized and prepended as [PREV]+past in both
    systems (src/whisper.cpp:6906-6931, :7073-7085)."""
    prompt = "ask not what your country can do for you"
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    args = ["full", parity_model, str(pcm),
            "--max-tokens", str(N_TOK),
            "--suppress-regex", DECISIVE_REGEX, "--prompt", prompt]
    ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                              cwd=tmp_path)))
    ours = _only_text(_ours_full(parity_model, parity_audio,
                                 initial_prompt=prompt))
    assert ours == ref


GRAMMAR_GBNF = """\
root ::= item (ws item)*
ws   ::= " "
item ::= word | num
word ::= "the" | "and" | "country" | "ask" | "é"
num  ::= [0-9] [0-9]?
"""


@pytest.mark.parametrize("beam,penalty", [(0, 10000.0), (5, 10000.0),
                                          (0, 100.0)],
                         ids=["greedy", "beam5", "soft-penalty"])
def test_grammar_parity(ref_harness, parity_model_sharp, parity_audio,
                        tmp_path, beam, penalty):
    """GBNF-guided decoding vs the reference: the harness parses the SAME
    grammar text with the reference's own grammar-parser and wires it like
    cli.cpp:1207-1220; we parse with decoding/grammar.parse_gbnf. Asserts
    identical segment token streams for greedy and beam-5, with an absolute
    penalty (grammar fully constrains) AND the default 100.0 (rejected
    tokens are merely downweighted — whisper_suppress_invalid_grammar,
    src/whisper.cpp:5824-5866). The 2-byte "é" terminal exercises the
    partial-UTF-8 stack matching (:5578-5623) through single-byte tokens."""
    from whisper_tpu.decoding.grammar import parse_gbnf

    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    gfile = tmp_path / "g.gbnf"
    gfile.write_text(GRAMMAR_GBNF)
    args = ["full", parity_model_sharp, str(pcm), "--max-tokens", str(N_TOK),
            "--grammar-file", str(gfile), "--grammar-rule", "root",
            "--grammar-penalty", str(penalty)]
    if beam:
        args += ["--beam", str(beam)]
    ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                              cwd=tmp_path)))

    ctx = wt.WhisperContext.new_with_params(
        parity_model_sharp, ContextParams(dtype="float32"))
    p = FullParams.default(
        SamplingStrategy.BEAM_SEARCH if beam else SamplingStrategy.GREEDY)
    p.language = "en"
    p.no_timestamps = True
    p.max_tokens = N_TOK
    p.temperature = 0.0
    p.temperature_inc = 0.0
    p.entropy_thold = -1e9
    p.logprob_thold = -1e9
    p.no_speech_thold = 1e9
    p.print_progress = False
    p.grammar_rules = parse_gbnf(GRAMMAR_GBNF, "root")
    p.grammar_penalty = penalty
    if beam:
        p.beam_search.beam_size = beam
        p.greedy.best_of = beam
    else:
        p.greedy.best_of = 1
    st = ctx.create_state()
    st.full(p, parity_audio)
    ours = [[td.id for td in s.tokens if td.id < 50256] for s in st.segments]
    assert ours == ref, f"grammar streams differ:\nref:  {ref}\nours: {ours}"


def test_vad_parity(ref_harness, tmp_path):
    """Silero-VAD differential parity: a random-weight silero ggml written
    by our writer, loaded by BOTH systems; per-frame speech probabilities
    (reference whisper_vad_detect_speech, src/whisper.cpp:4361-5200) must
    agree to 1e-3, and the hysteresis segments (whisper_vad_segments_from_
    probs, :5202-5435) must match at 10 ms resolution."""
    from whisper_tpu.config import VadParams
    from whisper_tpu.models import vad as vad_mod

    model = vad_mod.random_vad_model()
    model_path = tmp_path / "vad.bin"
    vad_mod.write_vad_ggml(str(model_path), model)

    rng = np.random.default_rng(11)
    t = np.arange(32000, dtype=np.float32) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 300 * t) * (t < 1.0)
             + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
    pcm = tmp_path / "audio.f32"
    audio.tofile(pcm)

    out = _run_ref(ref_harness, ["vad", str(model_path), str(pcm)],
                   cwd=tmp_path).splitlines()
    n = int(out[0].split()[1])
    ref_probs = np.array([float(x) for x in out[1:1 + n]])
    ref_segs = [(float(l.split()[1]), float(l.split()[2]))
                for l in out[1 + n:] if l.startswith("VSEG")]

    ours = np.asarray(vad_mod.detect_speech(model, audio))
    assert len(ours) == n, (len(ours), n)
    assert np.abs(ours - ref_probs).max() < 1e-3

    our_segs = vad_mod.segments_from_probs(
        np.asarray(ours), VadParams(), n_window=model.hparams.n_window)
    got = [(float(s.start), float(s.end)) for s in our_segs]  # centiseconds
    assert got == ref_segs, (got, ref_segs)


def test_lang_detect_parity(ref_harness, parity_model_multi, parity_audio,
                            tmp_path):
    """Language auto-detect (src/whisper.cpp:4037-4110): same winning
    language id and the same softmax distribution over the 100 language
    tokens (tolerance covers ggml-f16 vs XLA-f32 activation noise)."""
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    out = _run_ref(ref_harness, ["lang", parity_model_multi, str(pcm)],
                   cwd=tmp_path).splitlines()
    ref_id = int(out[0].split()[1])
    ref_probs = {int(l.split()[1]): float(l.split()[2])
                 for l in out[1:] if l.startswith("LPROB")}

    ctx = wt.WhisperContext.new_with_params(
        parity_model_multi, ContextParams(dtype="float32"))
    st = ctx.create_state()
    st.pcm_to_mel(parity_audio)
    lang_id, probs = st.lang_detect()
    assert lang_id == ref_id
    ours = np.asarray(probs)
    for i, rp in ref_probs.items():
        assert abs(float(ours[i]) - rp) < 2e-3, (i, float(ours[i]), rp)


@pytest.mark.parametrize("qtype", ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0"])
def test_quantized_model_parity(ref_harness, parity_model_sharp,
                                parity_audio, tmp_path, qtype):
    """Quantized end-to-end for every block codec: OUR quantizer's output
    must load in the reference binary (block-format fidelity:
    ggml-quants.c layouts) and produce the same decisive greedy token
    stream. ggml computes quantized x q8 integer dot products vs our
    dequant-to-f32 matmuls, so this only holds with sharply separated
    logits."""
    from whisper_tpu.tools.quantize import quantize_model

    qpath = tmp_path / f"model-{qtype}.bin"
    quantize_model(parity_model_sharp, str(qpath), qtype)

    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    args = ["full", str(qpath), str(pcm),
            "--max-tokens", str(N_TOK), "--suppress-regex", DECISIVE_REGEX]
    ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                              cwd=tmp_path)))
    ours = _only_text(_ours_full(str(qpath), parity_audio))
    assert ours == ref


@pytest.fixture(scope="session")
def parity_model_k(tmp_path_factory):
    """d=256 variant: every 2-D attention/MLP weight's row dim divides
    QK_K=256, so the K-quant super-block codecs apply (the reference tool
    asserts on non-divisible rows — ggml_quantize_chunk; real models with
    K-quant support are small/medium/large, d in {768,1024,1280})."""
    return _write_parity_model(
        tmp_path_factory.mktemp("parity_k") / "model.bin", sharp=True,
        width=256)


@pytest.fixture(scope="session")
def ggml_lib(ref_harness):
    """The reference build's own libggml-base via ctypes — the ground-truth
    quantization codecs (quantize_row_*_ref / dequantize_row_*)."""
    import ctypes

    from tests.ref_harness.build import BUILD

    lib = ctypes.CDLL(str(BUILD / "ggml" / "src" / "libggml-base.so"))

    class _InitParams(ctypes.Structure):
        _fields_ = [("mem_size", ctypes.c_size_t),
                    ("mem_buffer", ctypes.c_void_p),
                    ("no_alloc", ctypes.c_bool)]

    lib.ggml_init.restype = ctypes.c_void_p
    lib.ggml_init.argtypes = [_InitParams]
    # ggml_init fills the global fp16<->fp32 conversion tables the scalar
    # codecs read; without it every dequantized value is 0
    lib.ggml_init(_InitParams(1 << 16, None, True))
    return lib


_KQ_ROWNAMES = {
    quant.GGML_TYPE_Q2_K: "q2_K", quant.GGML_TYPE_Q3_K: "q3_K",
    quant.GGML_TYPE_Q4_K: "q4_K", quant.GGML_TYPE_Q5_K: "q5_K",
    quant.GGML_TYPE_Q6_K: "q6_K",
}


@pytest.mark.parametrize("ttype", list(_KQ_ROWNAMES),
                         ids=list(_KQ_ROWNAMES.values()))
def test_kquant_codec_bit_parity(ggml_lib, ttype):
    """BIT-exact K-quant codec parity against the reference's own ggml:
    (a) blocks produced by the reference quantizer (quantize_row_X_ref,
    ggml-quants.c) decode identically through our numpy decoder and the
    reference's dequantize_row_X; (b) blocks produced by OUR quantizer
    decode identically through both decoders (container validity)."""
    import ctypes

    name = _KQ_ROWNAMES[ttype]
    n = 8 * 256
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(n) * 0.25).astype(np.float32)
    bs, bn = quant.TYPE_TRAITS[ttype]

    def ref_dequant(raw_bytes):
        buf = np.frombuffer(raw_bytes, np.uint8).copy()
        y = np.zeros(n, np.float32)
        getattr(ggml_lib, f"dequantize_row_{name}")(
            buf.ctypes.data_as(ctypes.c_void_p),
            y.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(n))
        return y

    # (a) reference-quantized -> both decoders bit-equal
    raw_ref = np.zeros(n // bn * bs, np.uint8)
    getattr(ggml_lib, f"quantize_row_{name}_ref")(
        x.ctypes.data_as(ctypes.c_void_p),
        raw_ref.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(n))
    np.testing.assert_array_equal(
        quant.dequantize(raw_ref.tobytes(), ttype, n),
        ref_dequant(raw_ref.tobytes()))

    # (b) our-quantized -> both decoders bit-equal
    raw_ours = quant.quantize(x, ttype)
    np.testing.assert_array_equal(
        quant.dequantize(raw_ours, ttype, n), ref_dequant(raw_ours))


@pytest.mark.parametrize("qtype", ["q2_k", "q3_k", "q4_k", "q5_k", "q6_k"])
def test_kquant_model_parity(ref_harness, parity_model_k, parity_audio,
                             tmp_path, qtype):
    """K-quantized end-to-end: OUR quantizer's q*_K .bin loads in the
    reference binary and yields the identical decisive greedy stream
    (reference loader src/whisper.cpp:1503-1974 with K-quant vec_dot)."""
    from whisper_tpu.tools.quantize import quantize_model

    qpath = tmp_path / f"model-{qtype}.bin"
    log = quantize_model(parity_model_k, str(qpath), qtype)
    from whisper_tpu.tools.quantize import NAME_TO_TYPE
    assert sum(1 for t in log.values() if t == NAME_TO_TYPE[qtype]) > 0

    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    args = ["full", str(qpath), str(pcm),
            "--max-tokens", str(N_TOK), "--suppress-regex", DECISIVE_REGEX]
    ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                              cwd=tmp_path)))
    ours = _only_text(_ours_full(str(qpath), parity_audio))
    assert ours == ref


def test_kquant_reference_tool_roundtrip(ref_harness, parity_model_k,
                                         parity_audio, tmp_path):
    """The REFERENCE's own quantize tool (examples/quantize) produces a
    q5_k .bin; we load it and match the reference's decisive stream on it
    — the read-path 'Done' criterion from VERDICT r2 #3."""
    from tests.ref_harness.build import reference_quantize
    try:
        qbin = reference_quantize()
    except Exception as e:
        pytest.skip(f"cannot build reference quantize tool: {e}")

    qpath = tmp_path / "model-q5k-reftool.bin"
    res = subprocess.run([str(qbin), parity_model_k, str(qpath), "q5_k"],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]

    # our loader must see genuinely K-quantized tensors in the file
    ck = ggml_io.read_ggml(str(qpath))
    assert any(rt.ttype == quant.GGML_TYPE_Q5_K for rt in ck.tensors.values())

    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    args = ["full", str(qpath), str(pcm),
            "--max-tokens", str(N_TOK), "--suppress-regex", DECISIVE_REGEX]
    ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                              cwd=tmp_path)))
    ours = _only_text(_ours_full(str(qpath), parity_audio))
    assert ours == ref


def test_tid0_quirk_parity(ref_harness, parity_model, parity_audio, tmp_path):
    """Bug-for-bug tid=0 quirk (retired deviation, VERDICT r2 #7): with
    timestamps ON but every timestamp token suppressed (DECISIVE_REGEX also
    matches '[_TT_*]'), the timestamp probability mass is exactly zero, the
    reference leaves token.tid at its 0 init (src/whisper.cpp:6437) and
    emits the absurd t0 = seek + 2*(0 - token_beg) = -100726 cs (:7576).
    Our segments must carry the identical absurd t0/t1."""
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    out = _run_ref(
        ref_harness,
        ["full", parity_model, str(pcm), "--max-tokens", str(N_TOK),
         "--suppress-regex", DECISIVE_REGEX, "--timestamps"],
        cwd=tmp_path)
    ref_segs = _parse_segments(out)
    assert ref_segs, out
    our_segs = _ours_full(parity_model, parity_audio, timestamps=True)
    ref_tt = [(t0, t1) for t0, t1, _ in ref_segs]
    our_tt = [(t0, t1) for t0, t1, _ in our_segs]
    assert our_tt == ref_tt, f"ref {ref_tt} vs ours {our_tt}"
    # the quirk actually fired: the emitted t0 is the absurd negative one
    assert ref_tt[0][0] < 0


def test_token_timestamps_and_dtw_parity(ref_harness, parity_model_semi,
                                         parity_audio, tmp_path):
    """Per-token t0/t1 from the energy heuristic (reference
    whisper_exp_compute_token_level_timestamps, src/whisper.cpp:8329-8615)
    and DTW t_dtw (:8617-8933, aheads = 1 top-most layer) must match the
    reference binary token-for-token."""
    import re as _re

    from whisper_tpu.config import AlignmentHeadsPreset, DtwParams

    regex = "(?![ ]t|\\[_TT_).*"
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    out = _run_ref(
        ref_harness,
        ["full", parity_model_semi, str(pcm), "--max-tokens", str(N_TOK),
         "--suppress-regex", regex, "--timestamps", "--token-timestamps",
         "--dtw", "1"],
        cwd=tmp_path, env={"REF_HARNESS_TOKEN_DATA": "1"})
    ref_toks = []
    for line in out.splitlines():
        if line.startswith("TOK "):
            m = _re.search(r"TOK (-?\d+) .*t0=(-?\d+) t1=(-?\d+) t_dtw=(-?\d+)",
                           line)
            ref_toks.append(tuple(int(m.group(i)) for i in (1, 2, 3, 4)))
    assert ref_toks, out

    ctx = wt.WhisperContext.new_with_params(
        parity_model_semi,
        ContextParams(dtype="float32", dtw_token_timestamps=True,
                      dtw=DtwParams(mode=AlignmentHeadsPreset.N_TOP_MOST,
                                    n_top=1)))
    p = FullParams.default(SamplingStrategy.GREEDY)
    p.language = "en"
    p.no_timestamps = False
    p.token_timestamps = True
    p.max_tokens = N_TOK
    p.suppress_regex = regex
    p.temperature_inc = 0.0
    p.entropy_thold = -1e9
    p.logprob_thold = -1e9
    p.no_speech_thold = 1e9
    p.print_progress = False
    p.greedy.best_of = 1
    st = ctx.create_state()
    st.full(p, parity_audio)
    our_toks = [(td.id, td.t0, td.t1, td.t_dtw)
                for s in st.segments for td in s.tokens]

    assert [t[0] for t in our_toks] == [t[0] for t in ref_toks]
    for (oid, ot0, ot1, odtw), (rid, rt0, rt1, rdtw) in zip(our_toks, ref_toks):
        assert abs(ot0 - rt0) <= 2 and abs(ot1 - rt1) <= 2, (
            (oid, ot0, ot1), (rid, rt0, rt1))
        assert abs(odtw - rdtw) <= 4, ((oid, odtw), (rid, rdtw))


def test_full_parallel_parity(ref_harness, parity_model, parity_audio,
                              tmp_path):
    """whisper_full_parallel -p 2 (reference src/whisper.cpp:7736-7864):
    same merged segment token streams AND the same timestamp-offset merge.
    Ours runs the chunks through the batched decode path; the reference
    uses two host threads — identical split points and merge rules."""
    audio = np.concatenate([parity_audio, parity_audio])   # 5 s -> 2 chunks
    pcm = tmp_path / "audio2.f32"
    audio.tofile(pcm)
    args = ["full", parity_model, str(pcm),
            "--max-tokens", str(N_TOK), "--suppress-regex", DECISIVE_REGEX,
            "--processors", "2"]
    ref = _parse_segments(_run_ref(ref_harness, args, cwd=tmp_path))

    ctx = wt.WhisperContext.new_with_params(
        parity_model, ContextParams(dtype="float32"))
    p = FullParams.default(SamplingStrategy.GREEDY)
    p.language = "en"
    p.no_timestamps = True
    p.max_tokens = N_TOK
    p.suppress_regex = DECISIVE_REGEX
    p.temperature_inc = 0.0
    p.entropy_thold = -1e9
    p.logprob_thold = -1e9
    p.no_speech_thold = 1e9
    p.print_progress = False
    p.greedy.best_of = 1
    st = ctx.create_state()
    st.full_parallel(p, audio, 2)
    ours = [(s.t0, s.t1, [t.id for t in s.tokens]) for s in st.segments]

    ref_tok = [[t for t in ids if t < 50256] for _, _, ids in ref]
    our_tok = [[t for t in ids if t < 50256] for _, _, ids in ours]
    assert our_tok == ref_tok
    # t0 is skipped: under no_timestamps the reference emits the tid=0
    # quirk t0 (seek - 100726 cs — see filters.timestamp_stats deviation);
    # t1 carries the chunk-offset merge arithmetic, which must match
    assert [t1 for _, t1, _ in ours] == [t1 for _, t1, _ in ref]


def test_full_parallel_vad_parity(ref_harness, parity_model, tmp_path):
    """-p 2 combined with VAD: the reference VADs ONCE before splitting,
    workers run whisper_full_with_state (no per-chunk VAD,
    src/whisper.cpp:7748-7760), and the merged segments are still
    time-remapped because whisper_vad left the mapping on ctx->state and
    the segment getters translate through it (:7934, :7948). Our
    full_parallel must reproduce the whole pipeline shape."""
    from whisper_tpu.models import vad as vad_mod

    vmodel = vad_mod.random_vad_model()
    vpath = tmp_path / "vadp.bin"
    vad_mod.write_vad_ggml(str(vpath), vmodel)

    rng = np.random.default_rng(13)
    t = np.arange(int(6 * 16000), dtype=np.float32) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 300 * t)
             * ((t < 2.0) | (t > 4.0)).astype(np.float32)
             + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
    pcm = tmp_path / "audio6p.f32"
    audio.tofile(pcm)

    args = ["full", parity_model, str(pcm),
            "--max-tokens", str(N_TOK), "--suppress-regex", DECISIVE_REGEX,
            "--processors", "2", "--vad", str(vpath)]
    ref = _parse_segments(_run_ref(ref_harness, args, cwd=tmp_path))

    ctx = wt.WhisperContext.new_with_params(
        parity_model, ContextParams(dtype="float32"))
    p = FullParams.default(SamplingStrategy.GREEDY)
    p.language = "en"
    p.no_timestamps = True
    p.max_tokens = N_TOK
    p.suppress_regex = DECISIVE_REGEX
    p.temperature_inc = 0.0
    p.entropy_thold = -1e9
    p.logprob_thold = -1e9
    p.no_speech_thold = 1e9
    p.print_progress = False
    p.greedy.best_of = 1
    p.vad = True
    p.vad_model_path = str(vpath)
    st = ctx.create_state()
    st.full_parallel(p, audio, 2)
    ours = [(s.t0, s.t1, [t.id for t in s.tokens]) for s in st.segments]

    ref_tok = [[tk for tk in ids if tk < 50256] for _, _, ids in ref]
    our_tok = [[tk for tk in ids if tk < 50256] for _, _, ids in ours]
    assert our_tok == ref_tok
    assert [t1 for _, t1, _ in ours] == [t1 for _, t1, _ in ref]


def test_multiwindow_context_parity(ref_harness, parity_model, tmp_path):
    """Two 30 s windows with context carry-over (no_context=false): the
    window loop (seek advance, :6986-7704), prompt_past accumulation
    (:7560-7571) and the [PREV]+past prompt construction (:7073-7085) must
    produce identical token streams across BOTH windows."""
    rng = np.random.default_rng(7)
    t = np.arange(int(35 * 16000), dtype=np.float32) / 16000.0
    audio = (0.25 * np.sin(2 * np.pi * (180 + 60 * np.sin(0.2 * t)) * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    pcm = tmp_path / "audio35.f32"
    audio.tofile(pcm)

    # --keep-context (no_context=false): window 2's prompt becomes
    # [PREV]+window-1 tokens in both systems
    args = ["full", parity_model, str(pcm),
            "--max-tokens", str(N_TOK), "--suppress-regex", DECISIVE_REGEX,
            "--keep-context"]
    ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                              cwd=tmp_path)))

    ctx = wt.WhisperContext.new_with_params(
        parity_model, ContextParams(dtype="float32"))
    p = FullParams.default(SamplingStrategy.GREEDY)
    p.language = "en"
    p.no_timestamps = True
    p.no_context = False
    p.max_tokens = N_TOK
    p.suppress_regex = DECISIVE_REGEX
    p.temperature_inc = 0.0
    p.entropy_thold = -1e9
    p.logprob_thold = -1e9
    p.no_speech_thold = 1e9
    p.print_progress = False
    p.greedy.best_of = 1
    st = ctx.create_state()
    st.full(p, audio)
    ours = [[td.id for td in s.tokens if td.id < 50256] for s in st.segments]

    assert len(ref) >= 2, f"expected >= 2 windows, ref={ref}"
    assert ours == ref


def test_cli_writers_parity(parity_model_semi, parity_audio, tmp_path):
    """Output-writer FORMAT parity: feed the reference whisper-cli's own
    segments (parsed from its CSV, which stores raw milliseconds) through
    OUR writers and require byte-identical srt/vtt/csv renderings
    (writers: examples/cli/cli.cpp output_srt/vtt/csv). Decode-token
    parity is covered separately — random-weight timestamp argmax is not
    decisive across audio decoders, so this test isolates formatting."""
    from tests.ref_harness.build import reference_cli
    try:
        cli_bin = str(reference_cli())
    except Exception as e:
        pytest.skip(f"cannot build reference whisper-cli: {e}")

    from whisper_tpu.audio.io import write_wav
    wav = tmp_path / "a.wav"
    write_wav(str(wav), parity_audio)

    regex = "(?![ ]t|\\[_TT_).*"
    res = subprocess.run(
        [cli_bin, "-m", parity_model_semi, "-f", str(wav),
         "-osrt", "-ovtt", "-ocsv", "-of", str(tmp_path / "ref"),
         "-bo", "1", "-nf", "--suppress-regex", regex, "-np"],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-1500:]

    # rebuild the reference's segments from its CSV (ms, ms, "text")
    import csv as _csv

    from whisper_tpu.api import Segment
    rows = list(_csv.reader((tmp_path / "ref.csv").read_text().splitlines()))
    assert rows[0][:2] == ["start", "end"]
    segments = [Segment(t0=int(r[0]) // 10, t1=int(r[1]) // 10, text=r[2])
                for r in rows[1:]]
    assert segments, "reference produced no segments"

    from whisper_tpu.serving import writers
    for ext in ("srt", "vtt", "csv"):
        ref_txt = (tmp_path / f"ref.{ext}").read_text()
        our_txt = writers.render(ext, segments)
        assert our_txt.strip("\n") == ref_txt.strip("\n"), (
            f".{ext} render differs:\nref:  {ref_txt!r}\nours: {our_txt!r}")


def test_hf_converter_output_loads_in_reference(ref_harness, parity_audio,
                                                tmp_path):
    """User onboarding path: a HuggingFace Whisper converted by OUR
    convert_hf must load in the reference binary and transcribe — i.e. the
    converter emits the exact container format whisper.cpp expects
    (counterpart of models/convert-h5-to-ggml.py)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from whisper_tpu.checkpoint import convert_hf

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
    )
    hf = WhisperForConditionalGeneration(cfg).eval()
    path = str(tmp_path / "converted.bin")
    convert_hf.convert_hf_to_ggml(hf, path, ftype=1)

    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    out = _run_ref(ref_harness,
                   ["full", path, str(pcm), "--max-tokens", "4",
                    "--language", "en"],
                   cwd=tmp_path)
    assert "NSEG" in out  # loaded + ran end-to-end in the reference

    # and the decisive token streams match between the two systems
    regex = DECISIVE_REGEX
    args = ["full", path, str(pcm), "--max-tokens", str(N_TOK),
            "--suppress-regex", regex, "--language", "en"]
    ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                              cwd=tmp_path)))
    ours = _only_text(_ours_full(path, parity_audio, language="en"))
    assert ours == ref


def test_diarization_parity(parity_model_semi, tmp_path):
    """Stereo-energy diarization (reference cli.cpp estimate_diarization_
    speaker): our speaker labels for the reference CLI's own segments must
    match its CSV speaker column."""
    import csv as _csv
    import wave

    from tests.ref_harness.build import reference_cli
    try:
        cli_bin = str(reference_cli())
    except Exception as e:
        pytest.skip(f"cannot build reference whisper-cli: {e}")

    # stereo: left-channel speech first half, right-channel second half
    rng = np.random.default_rng(5)
    t = np.arange(int(4 * 16000), dtype=np.float32) / 16000.0
    sig = (0.3 * np.sin(2 * np.pi * 250 * t)
           + 0.03 * rng.standard_normal(t.shape)).astype(np.float32)
    left = np.where(t < 2.0, sig, 0.01 * sig)
    right = np.where(t >= 2.0, sig, 0.01 * sig)
    inter = np.empty(2 * len(t), np.int16)
    inter[0::2] = (left * 32767).astype(np.int16)
    inter[1::2] = (right * 32767).astype(np.int16)
    wav = tmp_path / "stereo.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())

    regex = "(?![ ]t|\\[_TT_).*"
    res = subprocess.run(
        [cli_bin, "-m", parity_model_semi, "-f", str(wav),
         "-di", "-ocsv", "-of", str(tmp_path / "ref"),
         "-bo", "1", "-nf", "--suppress-regex", regex, "-np"],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-1500:]

    rows = list(_csv.reader((tmp_path / "ref.csv").read_text().splitlines()))
    assert rows[0][:3] == ["start", "end", "speaker"]
    assert len(rows) > 1, "reference produced no segments"

    from whisper_tpu.serving.writers import estimate_diarization_speaker
    pcm = np.stack([(inter[0::2].astype(np.float32)) / 32768.0,
                    (inter[1::2].astype(np.float32)) / 32768.0])
    for r in rows[1:]:
        t0_cs, t1_cs, ref_speaker = int(r[0]) // 10, int(r[1]) // 10, r[2]
        ours = estimate_diarization_speaker(pcm, t0_cs, t1_cs, id_only=True)
        assert ours == ref_speaker, (r, ours)


def test_suppress_nst_parity(ref_harness, parity_model, parity_audio,
                             tmp_path):
    """suppress_nst (the 100-entry non-speech token list with its
    bare/space-prefixed lookup rules, src/whisper.cpp:6102-6107 +
    :6241-6259): with punctuation otherwise dominant, enabling the flag
    must flip both systems to the same non-punctuation stream."""
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    # allow only "!", ".", " the" (and byte tokens shadowed per token_to_id)
    regex = "(?![!.]|[ ]th).*"
    for nst in (False, True):
        args = ["full", parity_model, str(pcm),
                "--max-tokens", str(N_TOK), "--suppress-regex", regex]
        if nst:
            args.append("--suppress-nst")
        ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                                  cwd=tmp_path)))
        ctx = wt.WhisperContext.new_with_params(
            parity_model, ContextParams(dtype="float32"))
        p = FullParams.default(SamplingStrategy.GREEDY)
        p.language = "en"
        p.no_timestamps = True
        p.max_tokens = N_TOK
        p.suppress_regex = regex
        p.suppress_nst = nst
        p.temperature_inc = 0.0
        p.entropy_thold = -1e9
        p.logprob_thold = -1e9
        p.no_speech_thold = 1e9
        p.print_progress = False
        p.greedy.best_of = 1
        st = ctx.create_state()
        st.full(p, parity_audio)
        ours = [[td.id for td in s.tokens if td.id < 50256]
                for s in st.segments]
        assert ours == ref, f"(suppress_nst={nst}) {ours} != {ref}"


def _decisive_ts_params(regex, **kw):
    p = FullParams.default(SamplingStrategy.GREEDY)
    p.language = "en"
    p.no_timestamps = False
    p.max_tokens = N_TOK
    p.suppress_regex = regex
    p.temperature_inc = 0.0
    p.entropy_thold = -1e9
    p.logprob_thold = -1e9
    p.no_speech_thold = 1e9
    p.print_progress = False
    p.greedy.best_of = 1
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_segment_wrap_parity(ref_harness, parity_model_semi, parity_audio,
                             tmp_path):
    """max_len segment wrapping (+ split_on_word) on top of token
    timestamps (reference whisper_wrap_segment, src/whisper.cpp:6030-6100):
    identical wrapped sub-segment streams and boundaries."""
    pcm = tmp_path / "audio.f32"
    parity_audio.tofile(pcm)
    regex = "(?![ ]t|\\[_TT_).*"
    for split in (False, True):
        args = ["full", parity_model_semi, str(pcm),
                "--max-tokens", str(N_TOK), "--suppress-regex", regex,
                "--timestamps", "--token-timestamps", "--max-len", "6"]
        if split:
            args.append("--split-on-word")
        ref = _parse_segments(_run_ref(ref_harness, args, cwd=tmp_path))

        ctx = wt.WhisperContext.new_with_params(
            parity_model_semi, ContextParams(dtype="float32"))
        p = _decisive_ts_params(regex, token_timestamps=True, max_len=6,
                                split_on_word=split)
        st = ctx.create_state()
        st.full(p, parity_audio)
        ours = [(s.t0, s.t1, [t.id for t in s.tokens]) for s in st.segments]
        assert [(t0, t1) for t0, t1, _ in ours] == \
               [(t0, t1) for t0, t1, _ in ref], (split, ours, ref)
        assert [ids for _, _, ids in ours] == [ids for _, _, ids in ref], split


def test_vad_full_pipeline_parity(ref_harness, parity_model_semi, tmp_path):
    """whisper_full WITH VAD preprocessing: speech splicing + the
    piecewise-linear time-remap of emitted segments
    (src/whisper.cpp:6615-6793, :7882-7960) must match the reference."""
    from whisper_tpu.models import vad as vad_mod

    vmodel = vad_mod.random_vad_model()
    vpath = tmp_path / "vad.bin"
    vad_mod.write_vad_ggml(str(vpath), vmodel)

    # speech-then-silence-then-speech so splicing actually cuts something
    rng = np.random.default_rng(11)
    t = np.arange(int(6 * 16000), dtype=np.float32) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 300 * t)
             * ((t < 2.0) | (t > 4.0)).astype(np.float32)
             + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
    pcm = tmp_path / "audio6.f32"
    audio.tofile(pcm)

    regex = "(?![ ]t|\\[_TT_).*"
    args = ["full", parity_model_semi, str(pcm),
            "--max-tokens", str(N_TOK), "--suppress-regex", regex,
            "--timestamps", "--vad", str(vpath)]
    ref = _parse_segments(_run_ref(ref_harness, args, cwd=tmp_path))

    ctx = wt.WhisperContext.new_with_params(
        parity_model_semi, ContextParams(dtype="float32"))
    p = _decisive_ts_params(regex, vad=True, vad_model_path=str(vpath))
    st = ctx.create_state()
    st.full(p, audio)
    ours = [(s.t0, s.t1, [t.id for t in s.tokens]) for s in st.segments]
    assert [(t0, t1) for t0, t1, _ in ours] == \
           [(t0, t1) for t0, t1, _ in ref], (ours, ref)
    assert [ids for _, _, ids in ours] == [ids for _, _, ids in ref]


def test_audio_ctx_offset_duration_parity(ref_harness, parity_model,
                                          parity_audio, tmp_path):
    """audio_ctx shrink (encoder sees fewer frames, :6933-6938) and
    offset_ms/duration_ms seek-window math (:6941, :6986) must reproduce
    the reference's streams."""
    audio = np.concatenate([parity_audio, parity_audio])   # 5 s
    pcm = tmp_path / "audio5.f32"
    audio.tofile(pcm)

    cases = [
        ["--audio-ctx", "512"],
        ["--offset-ms", "1000"],
        ["--offset-ms", "500", "--duration-ms", "2000"],
    ]
    for extra in cases:
        args = ["full", parity_model, str(pcm),
                "--max-tokens", str(N_TOK),
                "--suppress-regex", DECISIVE_REGEX, *extra]
        ref = _only_text(_parse_segments(_run_ref(ref_harness, args,
                                                  cwd=tmp_path)))
        kw = {}
        it = iter(extra)
        for flag in it:
            kw[{"--audio-ctx": "audio_ctx", "--offset-ms": "offset_ms",
                "--duration-ms": "duration_ms"}[flag]] = int(next(it))
        ctx = wt.WhisperContext.new_with_params(
            parity_model, ContextParams(dtype="float32"))
        p = _decisive_ts_params(DECISIVE_REGEX, no_timestamps=True, **kw)
        st = ctx.create_state()
        st.full(p, audio)
        ours = [[td.id for td in s.tokens if td.id < 50256]
                for s in st.segments]
        assert ours == ref, (extra, ours, ref)


# ---------------------------------------------------------------------------
# Combined whole-product CLI differential (VERDICT r2 #4)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="session")
def parity_model_tiny_shaped(tmp_path_factory):
    """Real tiny geometry (4+4 layers, 6 heads, d=384) so whisper-cli's
    `-dtw tiny` alignment-heads preset (src/whisper.cpp:418, layers 2-3,
    heads <= 5) applies; 40x logits: at d=384 the f16-vs-f32 activation
    noise is larger than in the d=64 fixtures, so timestamp-token argmaxes
    need a wider gap to be implementation-independent."""
    return _write_parity_model(
        tmp_path_factory.mktemp("parity_tiny") / "model.bin", sharp=40.0,
        width=384, n_text_layer=4, n_audio_layer=4)


def test_combined_cli_differential(parity_model_tiny_shaped, tmp_path):
    """ONE invocation of the full product path on BOTH sides — our
    serving/cli.py vs the reference whisper-cli binary, same checkpoint,
    same stereo WAV, flags combined: --vad + -dtw tiny + -ml 16 -sow +
    -di + srt/vtt/csv/lrc/txt/json-full writers (reference
    examples/cli/cli.cpp:923-1295). Interactions between features
    (VAD time-remap x token-timestamp wrap x diarization x writers) are
    exactly where piecewise parity can hide bugs; every emitted text file
    must be byte-identical and the full JSON structurally identical
    (t_dtw exact, probabilities to 2e-3)."""
    import json as _json
    import wave as _wave

    from tests.ref_harness.build import reference_cli
    try:
        cli_bin = str(reference_cli())
    except Exception as e:
        pytest.skip(f"cannot build reference whisper-cli: {e}")

    from whisper_tpu.models import vad as vad_mod

    vmodel = vad_mod.random_vad_model()
    vpath = tmp_path / "vad.bin"
    vad_mod.write_vad_ggml(str(vpath), vmodel)

    # 6 s stereo: two speech bursts separated by silence (so VAD splices),
    # first burst left-heavy, second right-heavy (so diarization labels
    # two different speakers)
    rng = np.random.default_rng(11)
    t = np.arange(int(6 * 16000), dtype=np.float32) / 16000.0
    burst1 = (t < 2.0).astype(np.float32)
    burst2 = (t > 4.0).astype(np.float32)
    tone = 0.4 * np.sin(2 * np.pi * 300 * t)
    noise = 0.02 * rng.standard_normal(t.shape).astype(np.float32)
    left = tone * (1.0 * burst1 + 0.2 * burst2) + noise
    right = tone * (0.2 * burst1 + 1.0 * burst2) + noise
    inter = np.empty(2 * len(t), np.float32)
    inter[0::2] = left
    inter[1::2] = right
    wav = tmp_path / "stereo.wav"
    with _wave.open(str(wav), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes())

    regex = "(?![ ]t|\\[_TT_).*"
    common = ["-ml", "16", "-sow", "-di", "-dtw", "tiny",
              "--vad", "-vm", str(vpath),
              "-osrt", "-ovtt", "-ocsv", "-olrc", "-otxt", "-oj", "-ojf",
              "-bo", "1", "-nf", "--suppress-regex", regex, "-np",
              "-l", "en"]

    res = subprocess.run(
        [cli_bin, "-m", parity_model_tiny_shaped, "-f", str(wav),
         "-of", str(tmp_path / "ref"), *common],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]

    from whisper_tpu.serving.cli import main as our_cli_main
    rc = our_cli_main(["-m", parity_model_tiny_shaped, "-f", str(wav),
                       "-of", str(tmp_path / "ours"), *common])
    assert rc == 0

    for ext in ("srt", "vtt", "csv", "lrc", "txt"):
        ref_txt = (tmp_path / f"ref.{ext}").read_text()
        our_txt = (tmp_path / f"ours.{ext}").read_text()
        if ext == "lrc":
            # the lrc header line carries the product name by design
            # ("[by:whisper.cpp]" vs "[by:whisper_tpu]"); body must match
            ref_txt = ref_txt.replace("[by:whisper.cpp]", "[by:]")
            our_txt = our_txt.replace("[by:whisper_tpu]", "[by:]")
        assert our_txt.strip("\n") == ref_txt.strip("\n"), (
            f".{ext} differs:\nref:  {ref_txt!r}\nours: {our_txt!r}")

    jref = _json.loads((tmp_path / "ref.json").read_text())
    jours = _json.loads((tmp_path / "ours.json").read_text())
    assert jours["result"]["language"] == jref["result"]["language"]
    tr, to = jref["transcription"], jours["transcription"]
    assert len(to) == len(tr), (tr, to)
    assert len(tr) >= 1
    for sr, so in zip(tr, to):
        assert so["offsets"] == sr["offsets"], (sr, so)
        assert so["text"] == sr["text"], (sr, so)
        assert so.get("speaker") == sr.get("speaker"), (sr, so)
        rtoks, otoks = sr["tokens"], so["tokens"]
        assert [tk["id"] for tk in otoks] == [tk["id"] for tk in rtoks]
        for tkr, tko in zip(rtoks, otoks):
            assert tko.get("offsets") == tkr.get("offsets"), (tkr, tko)
            assert tko["t_dtw"] == tkr["t_dtw"], (tkr, tko)
            # f16 ggml vs f32 XLA activations at d=384: softmax probs agree
            # to ~1e-2 (token identity/timing above are exact)
            assert abs(tko["p"] - tkr["p"]) < 2e-2, (tkr, tko)
    # diarization ran on both sides (speaker keys present and equal above)
    assert all("speaker" in s for s in tr)


# ---------------------------------------------------------------------------
# sampled-mode (t > 0) distributional parity (VERDICT r3 missing #4)


@pytest.fixture(scope="session")
def parity_model_sample(tmp_path_factory):
    """Sharpened (x10) logits: the sampling distribution over the decisive
    candidate set is concentrated enough that temperature matters — measured
    while tuning (r4): cross-temperature TVD(t=0.3 vs t=1.0) ~0.16-0.20 on
    both implementations vs ~0.05-0.08 matched-temperature sampling noise at
    ~800 draws — but not so peaked that sampling degenerates to argmax
    (top-token share 0.23 @ t=0.3)."""
    return _write_parity_model(
        tmp_path_factory.mktemp("parity_sample") / "model.bin", sharp=10.0)


def _token_hist(segs):
    from collections import Counter
    c = Counter()
    for _, _, ids in segs:
        c.update(t for t in ids if t < 50256)
    return c


def _tvd(c1, c2):
    n1, n2 = sum(c1.values()), sum(c2.values())
    keys = set(c1) | set(c2)
    return 0.5 * sum(abs(c1.get(k, 0) / n1 - c2.get(k, 0) / n2)
                     for k in keys), n1, n2


@pytest.mark.parametrize("temp", [0.3, 1.0])
def test_multinomial_sampling_distributional(ref_harness, parity_model_sample,
                                             tmp_path, temp):
    """Token-for-token equality is inapplicable at t > 0 (reference samples
    from per-decoder std::mt19937 streams, src/whisper.cpp:6897 + 6552; we
    sample with JAX's Gumbel trick on device) — but both draw from the SAME
    per-step distribution softmax(filtered_logits / t), so over many steps
    the empirical token frequencies must agree. 10 independent 30 s windows
    x up to 60 sampled tokens per side give ~300-480 draws; total-variation
    distance between the two unigram histograms must be small (measured
    sampling noise at these counts is 0.05-0.08; a sampler that ignored
    temperature, the filter pipeline, or collapsed to argmax lands >0.15).
    Cross-temperature TVD is checked to exceed the matched-temperature TVDs
    so the assertion is actually discriminative."""
    rng = np.random.default_rng(99)
    t = np.arange(int(10 * 30.0 * 16000), dtype=np.float32) / 16000.0
    audio = (0.25 * np.sin(2 * np.pi * 180.0 * t)
             + 0.15 * np.sin(2 * np.pi * 517.0 * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)

    pcm = tmp_path / "audio.f32"
    audio.tofile(pcm)
    out = _run_ref(ref_harness,
                   ["full", parity_model_sample, str(pcm),
                    "--max-tokens", "80", "--suppress-regex", DECISIVE_REGEX,
                    "--temperature", str(temp)],
                   cwd=tmp_path, timeout=600)
    ref_hist = _token_hist(_parse_segments(out))

    ctx = wt.WhisperContext.new_with_params(
        parity_model_sample, ContextParams(dtype="float32"))
    p = FullParams.default(SamplingStrategy.GREEDY)
    p.language = "en"
    p.no_timestamps = True
    p.max_tokens = 80
    p.suppress_regex = DECISIVE_REGEX
    p.temperature = temp
    p.temperature_inc = 0.0
    p.entropy_thold = -1e9
    p.logprob_thold = -1e9
    p.no_speech_thold = 1e9
    p.greedy.best_of = 1
    st = ctx.create_state()
    st.full(p, audio)
    our_hist = _token_hist([(s.t0, s.t1, [td.id for td in s.tokens])
                            for s in st.segments])

    tvd, n_ref, n_ours = _tvd(ref_hist, our_hist)
    assert n_ref >= 100 and n_ours >= 100, (n_ref, n_ours)
    assert len(our_hist) >= 2 and len(ref_hist) >= 2, (ref_hist, our_hist)
    assert tvd < 0.2, (
        f"t={temp}: TVD {tvd:.3f} over {n_ref}/{n_ours} draws\n"
        f"ref:  {ref_hist.most_common(8)}\nours: {our_hist.most_common(8)}")

    # discriminativeness: our stream at this temperature must NOT match the
    # reference's OTHER-temperature (0.3 vs 1.0) distribution better than
    # its matched-temperature counterpart
    other = 1.0 if temp == 0.3 else 0.3
    out2 = _run_ref(ref_harness,
                    ["full", parity_model_sample, str(pcm),
                     "--max-tokens", "80", "--suppress-regex", DECISIVE_REGEX,
                     "--temperature", str(other)],
                    cwd=tmp_path, timeout=600)
    ref_other = _token_hist(_parse_segments(out2))
    tvd_cross, _, _ = _tvd(ref_other, our_hist)
    assert tvd_cross > tvd, (
        f"cross-temp TVD {tvd_cross:.3f} <= matched {tvd:.3f}: "
        "temperature has no measurable effect — sampler not discriminated")
