"""Word-error-rate computation + basic English text normalizer.

reference: tests/librispeech/eval.py (jiwer + OpenAI EnglishTextNormalizer);
this environment has no jiwer, so WER is a direct Levenshtein over words and
the normalizer implements the standard steps of OpenAI's
BasicTextNormalizer/EnglishTextNormalizer that don't need its large
spelling dictionary: lowercase, bracket/parenthesis removal, punctuation
stripping, whitespace collapse, common English contraction/number-word
standardizations.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterable, Sequence, Tuple

_CONTRACTIONS = {
    "won't": "will not", "can't": "can not", "let's": "let us",
    "ain't": "aint", "y'all": "you all", "wanna": "want to",
    "gotta": "got to", "gonna": "going to", "i'ma": "i am going to",
    "imma": "i am going to",
}
_SUFFIXES = [
    (r"'s\b", " s"), (r"'re\b", " are"), (r"'ve\b", " have"),
    (r"'m\b", " am"), (r"'ll\b", " will"), (r"'d\b", " would"),
    (r"n't\b", " not"),
]
_SPELLED = {
    "mr": "mister", "mrs": "missus", "st": "saint", "dr": "doctor",
    "prof": "professor", "capt": "captain", "gov": "governor",
    "ald": "alderman", "gen": "general", "sen": "senator",
    "rep": "representative", "pres": "president", "rev": "reverend",
    "hon": "honorable", "asst": "assistant", "assoc": "associate",
    "lt": "lieutenant", "col": "colonel", "jr": "junior", "sr": "senior",
    "esq": "esquire",
}


class EnglishTextNormalizer:
    """Reduced port of OpenAI whisper's normalizer (behavioral subset)."""

    def __call__(self, text: str) -> str:
        s = text.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)       # remove <...> [...] tags
        s = re.sub(r"\(([^)]+?)\)", "", s)            # remove (...)
        for k, v in _CONTRACTIONS.items():
            s = s.replace(k, v)
        for pat, rep in _SUFFIXES:
            s = re.sub(pat, rep, s)
        s = re.sub(r"(\d),(\d)", r"\1\2", s)          # 1,000 -> 1000
        s = re.sub(r"\.([^0-9]|$)", r" \1", s)        # keep decimal points
        # strip punctuation/symbols/diacritics
        s = "".join(" " if unicodedata.category(c)[0] in "PS" and c not in "'"
                    else c for c in unicodedata.normalize("NFKC", s))
        for k, v in _SPELLED.items():
            s = re.sub(rf"\b{k}\b", v, s)
        s = re.sub(r"\s+", " ", s)
        return s.strip()


def _edit_ops(ref: Sequence[str], hyp: Sequence[str]) -> Tuple[int, int, int]:
    """(substitutions+deletions+insertions breakdown) via Levenshtein DP.
    Returns (S, D, I)."""
    n, m = len(ref), len(hyp)
    # dp[i][j] = (cost, S, D, I)
    import numpy as np
    cost = np.zeros((n + 1, m + 1), np.int32)
    cost[:, 0] = np.arange(n + 1)
    cost[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        ri = ref[i - 1]
        row = cost[i]
        prev = cost[i - 1]
        for j in range(1, m + 1):
            sub = prev[j - 1] + (ri != hyp[j - 1])
            dele = prev[j] + 1
            ins = row[j - 1] + 1
            row[j] = min(sub, dele, ins)
    # backtrace for S/D/I counts
    i, j = n, m
    S = D = I = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and cost[i, j] == cost[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]):
            if ref[i - 1] != hyp[j - 1]:
                S += 1
            i -= 1
            j -= 1
        elif i > 0 and cost[i, j] == cost[i - 1, j] + 1:
            D += 1
            i -= 1
        else:
            I += 1
            j -= 1
    return S, D, I


def wer(references: Iterable[str], hypotheses: Iterable[str],
        normalize: bool = False) -> float:
    """Corpus WER = (S+D+I) / total reference words (jiwer semantics)."""
    norm = EnglishTextNormalizer() if normalize else (lambda x: x)
    total_err = 0
    total_ref = 0
    for ref, hyp in zip(references, hypotheses):
        r = norm(ref).split()
        h = norm(hyp).split()
        S, D, I = _edit_ops(r, h)
        total_err += S + D + I
        total_ref += len(r)
    return total_err / max(1, total_ref)


def wer_details(reference: str, hypothesis: str, normalize: bool = True):
    norm = EnglishTextNormalizer() if normalize else (lambda x: x)
    r = norm(reference).split()
    h = norm(hypothesis).split()
    S, D, I = _edit_ops(r, h)
    return {"wer": (S + D + I) / max(1, len(r)), "sub": S, "del": D,
            "ins": I, "n_ref": len(r)}
