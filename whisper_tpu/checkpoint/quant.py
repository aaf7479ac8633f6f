"""ggml block-quantization codecs (numpy, vectorized).

Implements the block formats the reference's quantized checkpoints use
(layouts from ggml/src/ggml-common.h:167-213; scalar codecs in
ggml/src/ggml-quants.c). All blocks cover 32 consecutive elements:

  Q4_0: fp16 d;          16B nibbles          v = (q4 - 8) * d
  Q4_1: fp16 d, fp16 m;  16B nibbles          v = q4 * d + m
  Q5_0: fp16 d; u32 qh;  16B nibbles          v = ((q4 | hi_bit<<4) - 16) * d
  Q5_1: fp16 d, fp16 m; u32 qh; 16B nibbles   v = (q4 | hi_bit<<4) * d + m
  Q8_0: fp16 d;          32 int8              v = q8 * d

Nibble packing: byte j holds element j (low nibble) and element j+16 (high
nibble). qh bit i is the 5th bit of element i.

This module is pure numpy so the checkpoint converter and the quantizer tool
run host-side with no accelerator; the TPU int8 inference path repacks these
into (int8 values, per-block scales) arrays instead (ops/quant_matmul.py).
"""

from __future__ import annotations

import numpy as np

QK = 32  # block size for all supported formats

GGML_TYPE_F32 = 0
GGML_TYPE_F16 = 1
GGML_TYPE_Q4_0 = 2
GGML_TYPE_Q4_1 = 3
GGML_TYPE_Q5_0 = 6
GGML_TYPE_Q5_1 = 7
GGML_TYPE_Q8_0 = 8
GGML_TYPE_I8 = 24
GGML_TYPE_I16 = 25
GGML_TYPE_I32 = 26

# type -> (block_nbytes, block_nelems); float/int types have block size 1
TYPE_TRAITS = {
    GGML_TYPE_F32: (4, 1),
    GGML_TYPE_F16: (2, 1),
    GGML_TYPE_Q4_0: (2 + 16, QK),
    GGML_TYPE_Q4_1: (2 + 2 + 16, QK),
    GGML_TYPE_Q5_0: (2 + 4 + 16, QK),
    GGML_TYPE_Q5_1: (2 + 2 + 4 + 16, QK),
    GGML_TYPE_Q8_0: (2 + 32, QK),
    GGML_TYPE_I8: (1, 1),
    GGML_TYPE_I16: (2, 1),
    GGML_TYPE_I32: (4, 1),
}

TYPE_NAMES = {
    GGML_TYPE_F32: "f32", GGML_TYPE_F16: "f16", GGML_TYPE_Q4_0: "q4_0",
    GGML_TYPE_Q4_1: "q4_1", GGML_TYPE_Q5_0: "q5_0", GGML_TYPE_Q5_1: "q5_1",
    GGML_TYPE_Q8_0: "q8_0",
}

# ggml_ftype -> per-tensor ggml_type for the "big" tensors
# (reference ggml/src/ggml.c ggml_ftype_to_ggml_type)
FTYPE_TO_TYPE = {
    0: GGML_TYPE_F32, 1: GGML_TYPE_F16, 2: GGML_TYPE_Q4_0, 3: GGML_TYPE_Q4_1,
    8: GGML_TYPE_Q5_0, 9: GGML_TYPE_Q5_1, 7: GGML_TYPE_Q8_0,
}
TYPE_TO_FTYPE = {v: k for k, v in FTYPE_TO_TYPE.items()}


def type_size(ttype: int) -> int:
    return TYPE_TRAITS[ttype][0]


def block_size(ttype: int) -> int:
    return TYPE_TRAITS[ttype][1]


def row_nbytes(ttype: int, nelems: int) -> int:
    bs, bn = TYPE_TRAITS[ttype]
    assert nelems % bn == 0, f"nelems {nelems} not divisible by block {bn}"
    return nelems // bn * bs


def _split_nibbles(qs: np.ndarray) -> np.ndarray:
    """(nb, 16) uint8 -> (nb, 32) int: elements [low nibbles | high nibbles]."""
    lo = (qs & 0x0F).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    return np.concatenate([lo, hi], axis=1)


def _pack_nibbles(q: np.ndarray) -> np.ndarray:
    """(nb, 32) int -> (nb, 16) uint8."""
    lo = q[:, :16].astype(np.uint8)
    hi = q[:, 16:].astype(np.uint8)
    return lo | (hi << 4)


def _qh_bits(qh: np.ndarray) -> np.ndarray:
    """(nb,) uint32 -> (nb, 32) int 5th bits."""
    shifts = np.arange(32, dtype=np.uint32)
    return ((qh[:, None] >> shifts[None, :]) & 1).astype(np.int32)


def _pack_qh(bits: np.ndarray) -> np.ndarray:
    shifts = np.arange(32, dtype=np.uint32)
    return (bits.astype(np.uint32) << shifts[None, :]).sum(axis=1, dtype=np.uint64).astype(np.uint32)


def dequantize(raw: bytes | np.ndarray, ttype: int, nelems: int) -> np.ndarray:
    """Decode a raw ggml tensor payload to float32 (flat array of nelems).

    Uses the threaded C++ runtime when built (whisper_tpu/runtime); the
    numpy path below is the always-available fallback and the reference
    implementation for the native tests."""
    buf = np.frombuffer(raw, dtype=np.uint8) if not isinstance(raw, np.ndarray) else raw
    if ttype == GGML_TYPE_F32:
        return buf.view(np.float32)[:nelems].copy()
    if ttype in (GGML_TYPE_F16, GGML_TYPE_Q4_0, GGML_TYPE_Q4_1, GGML_TYPE_Q5_0,
                 GGML_TYPE_Q5_1, GGML_TYPE_Q8_0) and nelems >= 1 << 16:
        from whisper_tpu.runtime import native
        out = native.dequantize(ttype, buf, nelems)
        if out is not None:
            return out
    if ttype == GGML_TYPE_F16:
        return buf.view(np.float16)[:nelems].astype(np.float32)
    if ttype == GGML_TYPE_I32:
        return buf.view(np.int32)[:nelems].astype(np.float32)

    nb = nelems // QK
    bs = type_size(ttype)
    blocks = buf[: nb * bs].reshape(nb, bs)

    if ttype == GGML_TYPE_Q4_0:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        q = _split_nibbles(blocks[:, 2:18]) - 8
        return (q * d).astype(np.float32).reshape(-1)
    if ttype == GGML_TYPE_Q4_1:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
        q = _split_nibbles(blocks[:, 4:20])
        return (q * d + m).astype(np.float32).reshape(-1)
    if ttype == GGML_TYPE_Q5_0:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        qh = blocks[:, 2:6].copy().view(np.uint32).reshape(-1)
        q = _split_nibbles(blocks[:, 6:22]) | (_qh_bits(qh) << 4)
        return ((q - 16) * d).astype(np.float32).reshape(-1)
    if ttype == GGML_TYPE_Q5_1:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
        qh = blocks[:, 4:8].copy().view(np.uint32).reshape(-1)
        q = _split_nibbles(blocks[:, 8:24]) | (_qh_bits(qh) << 4)
        return (q * d + m).astype(np.float32).reshape(-1)
    if ttype == GGML_TYPE_Q8_0:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        q = blocks[:, 2:34].view(np.int8).astype(np.int32)
        return (q * d).astype(np.float32).reshape(-1)
    raise ValueError(f"unsupported ggml type {ttype}")


def quantize(x: np.ndarray, ttype: int) -> bytes:
    """Encode float32 array into a ggml payload (reference codecs:
    quantize_row_* in ggml/src/ggml-quants.c — max-abs / min-max scaling
    with round-to-nearest)."""
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    if ttype == GGML_TYPE_F32:
        return x.tobytes()
    if ttype == GGML_TYPE_F16:
        return x.astype(np.float16).tobytes()

    assert x.size % QK == 0, f"size {x.size} not divisible by {QK}"
    b = x.reshape(-1, QK)
    nb = b.shape[0]

    if ttype in (GGML_TYPE_Q4_0, GGML_TYPE_Q5_0, GGML_TYPE_Q8_0):
        # symmetric: d = max_abs / qmax, with sign carried by the abs-max element
        amax_idx = np.argmax(np.abs(b), axis=1)
        amax_signed = b[np.arange(nb), amax_idx]
        qmax = {GGML_TYPE_Q4_0: -8.0, GGML_TYPE_Q5_0: -16.0, GGML_TYPE_Q8_0: 127.0}[ttype]
        if ttype == GGML_TYPE_Q8_0:
            d = np.abs(amax_signed) / qmax
        else:
            d = amax_signed / qmax
        d16 = d.astype(np.float16)
        dr = d16.astype(np.float32)
        inv_d = np.where(dr != 0, 1.0 / np.where(dr == 0, 1, dr), 0.0)
        if ttype == GGML_TYPE_Q8_0:
            q = np.clip(np.round(b * inv_d[:, None]), -128, 127).astype(np.int8)
            return np.concatenate(
                [d16[:, None].view(np.uint8), q.view(np.uint8)], axis=1).tobytes()
        offset = 8 if ttype == GGML_TYPE_Q4_0 else 16
        hi = offset * 2 - 1
        q = np.clip(np.floor(b * inv_d[:, None] + (offset + 0.5)), 0, hi).astype(np.int32)
        if ttype == GGML_TYPE_Q4_0:
            return np.concatenate(
                [d16[:, None].view(np.uint8), _pack_nibbles(q)], axis=1).tobytes()
        qh = _pack_qh((q >> 4) & 1)
        return np.concatenate(
            [d16[:, None].view(np.uint8), qh[:, None].view(np.uint8),
             _pack_nibbles(q & 0x0F)], axis=1).tobytes()

    if ttype in (GGML_TYPE_Q4_1, GGML_TYPE_Q5_1):
        hi = 15 if ttype == GGML_TYPE_Q4_1 else 31
        mn = b.min(axis=1)
        mx = b.max(axis=1)
        d = (mx - mn) / hi
        d16 = d.astype(np.float16)
        m16 = mn.astype(np.float16)
        dr = d16.astype(np.float32)
        inv_d = np.where(dr != 0, 1.0 / np.where(dr == 0, 1, dr), 0.0)
        q = np.clip(np.floor((b - m16.astype(np.float32)[:, None]) * inv_d[:, None] + 0.5),
                    0, hi).astype(np.int32)
        if ttype == GGML_TYPE_Q4_1:
            return np.concatenate(
                [d16[:, None].view(np.uint8), m16[:, None].view(np.uint8),
                 _pack_nibbles(q)], axis=1).tobytes()
        qh = _pack_qh((q >> 4) & 1)
        return np.concatenate(
            [d16[:, None].view(np.uint8), m16[:, None].view(np.uint8),
             qh[:, None].view(np.uint8), _pack_nibbles(q & 0x0F)], axis=1).tobytes()

    raise ValueError(f"unsupported ggml type {ttype}")


def dequantize_to_int8_blocks(raw: bytes, ttype: int, nelems: int):
    """Decode a quantized payload into (int8 q, float32 per-block scale d,
    float32 per-block offset m) without expanding to float — the repack used
    by the TPU int8 matmul path. Returns q:(nb,32) int8, d:(nb,), m:(nb,)."""
    buf = np.frombuffer(raw, dtype=np.uint8)
    nb = nelems // QK
    bs = type_size(ttype)
    blocks = buf[: nb * bs].reshape(nb, bs)
    if ttype == GGML_TYPE_Q4_0:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        q = (_split_nibbles(blocks[:, 2:18]) - 8).astype(np.int8)
        return q, d, np.zeros_like(d)
    if ttype == GGML_TYPE_Q5_0:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        qh = blocks[:, 2:6].copy().view(np.uint32).reshape(-1)
        q = ((_split_nibbles(blocks[:, 6:22]) | (_qh_bits(qh) << 4)) - 16).astype(np.int8)
        return q, d, np.zeros_like(d)
    if ttype == GGML_TYPE_Q8_0:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        q = blocks[:, 2:34].view(np.int8).copy()
        return q, d, np.zeros_like(d)
    if ttype == GGML_TYPE_Q4_1:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(-1)
        q = _split_nibbles(blocks[:, 4:20]).astype(np.int8)
        return q, d, m
    if ttype == GGML_TYPE_Q5_1:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
        m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(-1)
        qh = blocks[:, 4:8].copy().view(np.uint32).reshape(-1)
        q = (_split_nibbles(blocks[:, 8:24]) | (_qh_bits(qh) << 4)).astype(np.int8)
        return q, d, m
    raise ValueError(f"unsupported quantized type {ttype}")
