"""ctypes bindings for the native C++ runtime (runtime.cpp).

Auto-builds on first import if g++ is available; every entry point has a
pure-Python fallback, so the framework works without a toolchain (the
reference hard-requires its C++ build; here native is an accelerator)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libwhisper_tpu_runtime.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _HERE, "-s"],
            check=True, capture_output=True, timeout=240)
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    _src = os.path.join(os.path.dirname(_SO), "runtime.cpp")
    stale = (os.path.exists(_SO) and os.path.exists(_src)
             and os.path.getmtime(_src) > os.path.getmtime(_SO))
    if stale:
        # rebuild-on-edit: a build-only-when-missing rule left parity
        # tests validating a stale binary after runtime.cpp changes (r4)
        try:
            os.unlink(_SO)
        except OSError:
            pass
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.wtpu_dequantize.restype = ctypes.c_int
        lib.wtpu_dequantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int]
        lib.wtpu_dtw.restype = ctypes.c_int
        lib.wtpu_dtw.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.wtpu_signal_energy.restype = None
        lib.wtpu_signal_energy.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p]
        lib.wtpu_version.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def dequantize(ttype: int, raw: bytes, nelems: int,
               n_threads: int = 0) -> Optional[np.ndarray]:
    """Native block dequantization; None if unavailable/unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    out = np.empty(nelems, np.float32)
    buf = np.frombuffer(raw, np.uint8) if isinstance(raw, (bytes, bytearray)) else raw
    # size guard: the C side trusts nelems and would over-read a short
    # buffer (r4 review); undersized input degrades to the numpy path
    from whisper_tpu.checkpoint import quant as _quant
    try:
        need = _quant.row_nbytes(ttype, nelems)
    except Exception:
        need = None
    if need is not None and buf.nbytes < need:
        return None
    rc = lib.wtpu_dequantize(
        ttype, buf.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), nelems, n_threads)
    return out if rc == 0 else None


def dtw(x: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native DTW path; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n, m = x.shape
    ti = np.empty(n + m, np.int32)
    tj = np.empty(n + m, np.int32)
    ln = lib.wtpu_dtw(x.ctypes.data_as(ctypes.c_void_p), n, m,
                      ti.ctypes.data_as(ctypes.c_void_p),
                      tj.ctypes.data_as(ctypes.c_void_p))
    if ln < 0:
        return None
    return ti[:ln].copy(), tj[:ln].copy()


def signal_energy(x: np.ndarray, hw: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(len(x), np.float32)
    lib.wtpu_signal_energy(x.ctypes.data_as(ctypes.c_void_p), len(x), hw,
                           out.ctypes.data_as(ctypes.c_void_p))
    return out


# ---------------------------------------------------------------------------
# GBNF grammar engine (native twin of decoding/grammar.py)
# ---------------------------------------------------------------------------

def _grammar_syms(lib) -> bool:
    if getattr(lib, "_grammar_ready", False):
        return True
    try:
        lib.wtpu_grammar_rejects.restype = ctypes.c_int64
        lib.wtpu_grammar_rejects.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p]
        lib.wtpu_grammar_accept.restype = ctypes.c_int32
        lib.wtpu_grammar_accept.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
        lib._grammar_ready = True
        return True
    except AttributeError:
        return False


def flatten_rules(rules) -> Tuple[np.ndarray, np.ndarray]:
    """rules: list of [(type, value), ...] -> (elems (N,2) i32, offs i32)."""
    offs = np.zeros(len(rules) + 1, np.int32)
    for i, r in enumerate(rules):
        offs[i + 1] = offs[i] + len(r)
    elems = np.zeros((int(offs[-1]), 2), np.int32)
    k = 0
    for r in rules:
        for t, v in r:
            elems[k, 0] = t
            elems[k, 1] = v
            k += 1
    return elems, offs


def flatten_stacks(stacks) -> Tuple[np.ndarray, np.ndarray]:
    offs = np.zeros(len(stacks) + 1, np.int32)
    for i, s in enumerate(stacks):
        offs[i + 1] = offs[i] + len(s)
    flat = np.zeros((int(offs[-1]), 2), np.int32)
    k = 0
    for s in stacks:
        for (r, idx) in s:
            flat[k, 0] = r
            flat[k, 1] = idx
            k += 1
    return flat, offs


def flatten_vocab(tokens) -> Tuple[np.ndarray, np.ndarray]:
    """tokens: list of bytes -> (concatenated u8, offsets i64)."""
    offs = np.zeros(len(tokens) + 1, np.int64)
    for i, t in enumerate(tokens):
        offs[i + 1] = offs[i] + len(t)
    buf = np.frombuffer(b"".join(tokens), np.uint8) if offs[-1] else \
        np.zeros(0, np.uint8)
    return buf, offs


def grammar_rejects(rules_flat, stacks, vocab_flat, partial_value: int,
                    partial_remain: int) -> Optional[np.ndarray]:
    """Rejected-token mask (len n_tokens, uint8); None if native unavailable.
    rules_flat/vocab_flat: pre-flattened via flatten_rules/flatten_vocab."""
    lib = get_lib()
    if lib is None or not _grammar_syms(lib):
        return None
    elems, roffs = rules_flat
    vbuf, voffs = vocab_flat
    sflat, soffs = flatten_stacks(stacks)
    n_tokens = len(voffs) - 1
    mask = np.zeros(n_tokens, np.uint8)
    rc = lib.wtpu_grammar_rejects(
        elems.ctypes.data_as(ctypes.c_void_p),
        roffs.ctypes.data_as(ctypes.c_void_p), len(roffs) - 1,
        sflat.ctypes.data_as(ctypes.c_void_p),
        soffs.ctypes.data_as(ctypes.c_void_p), len(soffs) - 1,
        vbuf.ctypes.data_as(ctypes.c_void_p),
        voffs.ctypes.data_as(ctypes.c_void_p), n_tokens,
        partial_value, partial_remain,
        mask.ctypes.data_as(ctypes.c_void_p))
    return mask if rc >= 0 else None


def grammar_accept(rules_flat, stacks, token: bytes, partial_value: int,
                   partial_remain: int):
    """Advance stacks through one token's codepoints.
    Returns (new_stacks, new_pv, new_pr) or None if native unavailable or
    the result exceeds the fixed output buffers."""
    lib = get_lib()
    if lib is None or not _grammar_syms(lib):
        return None
    elems, roffs = rules_flat
    sflat, soffs = flatten_stacks(stacks)
    tok = np.frombuffer(bytes(token), np.uint8)
    partial = np.array([partial_value, partial_remain], np.int32)
    MAX_STACKS, MAX_PAIRS = 4096, 65536
    out_flat = np.zeros((MAX_PAIRS, 2), np.int32)
    out_offs = np.zeros(MAX_STACKS + 1, np.int32)
    n = lib.wtpu_grammar_accept(
        elems.ctypes.data_as(ctypes.c_void_p),
        roffs.ctypes.data_as(ctypes.c_void_p), len(roffs) - 1,
        sflat.ctypes.data_as(ctypes.c_void_p),
        soffs.ctypes.data_as(ctypes.c_void_p), len(soffs) - 1,
        tok.ctypes.data_as(ctypes.c_void_p), len(tok),
        partial.ctypes.data_as(ctypes.c_void_p),
        out_flat.ctypes.data_as(ctypes.c_void_p),
        out_offs.ctypes.data_as(ctypes.c_void_p), MAX_PAIRS, MAX_STACKS)
    if n < 0:
        return None
    stacks_out = []
    for s in range(n):
        a, b = int(out_offs[s]), int(out_offs[s + 1])
        stacks_out.append(tuple((int(out_flat[k, 0]), int(out_flat[k, 1]))
                                for k in range(a, b)))
    return stacks_out, int(partial[0]), int(partial[1])
