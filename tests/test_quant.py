"""Quantization codec tests (reference behavior: ggml/src/ggml-quants.c)."""

import numpy as np
import pytest

from whisper_tpu.checkpoint import quant


ALL_QTYPES = [
    quant.GGML_TYPE_Q4_0, quant.GGML_TYPE_Q4_1, quant.GGML_TYPE_Q5_0,
    quant.GGML_TYPE_Q5_1, quant.GGML_TYPE_Q8_0,
]
K_QTYPES = list(quant.K_QUANT_TYPES)


@pytest.mark.parametrize("ttype", ALL_QTYPES)
def test_roundtrip_error_bounded(ttype):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(32 * 64).astype(np.float32)
    raw = quant.quantize(x, ttype)
    assert len(raw) == quant.row_nbytes(ttype, x.size)
    y = quant.dequantize(raw, ttype, x.size)
    # max error per block bounded by the quantization step (d = amax/qmax)
    bits = {quant.GGML_TYPE_Q4_0: 4, quant.GGML_TYPE_Q4_1: 4,
            quant.GGML_TYPE_Q5_0: 5, quant.GGML_TYPE_Q5_1: 5,
            quant.GGML_TYPE_Q8_0: 8}[ttype]
    xb = x.reshape(-1, 32)
    yb = y.reshape(-1, 32)
    step = (np.abs(xb).max(axis=1) * 2) / (2 ** bits - 1) + 1e-6
    assert np.all(np.abs(xb - yb).max(axis=1) <= step * 1.5)


@pytest.mark.parametrize("ttype", [quant.GGML_TYPE_F16, quant.GGML_TYPE_F32])
def test_float_passthrough(ttype):
    x = np.linspace(-2, 2, 128, dtype=np.float32)
    y = quant.dequantize(quant.quantize(x, ttype), ttype, x.size)
    atol = 0 if ttype == quant.GGML_TYPE_F32 else 1e-3
    np.testing.assert_allclose(x, y, atol=atol)


def test_q8_exact_for_grid_values():
    # values already on the int8 grid survive the round trip exactly
    d = 0.5
    x = (np.arange(-32, 0, dtype=np.float32).repeat(1)) * d  # one block, amax=16
    x = x[:32]
    y = quant.dequantize(quant.quantize(x, quant.GGML_TYPE_Q8_0), quant.GGML_TYPE_Q8_0, 32)
    # d = 16/127 here, so grid isn't exactly 0.5; just check tight error
    assert np.abs(x - y).max() < 16 / 127


@pytest.mark.parametrize("ttype", ALL_QTYPES)
def test_int8_block_repack_matches_dequant(ttype):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(32 * 8).astype(np.float32)
    raw = quant.quantize(x, ttype)
    q, d, m = quant.dequantize_to_int8_blocks(raw, ttype, x.size)
    recon = (q.astype(np.float32) * d[:, None] + m[:, None]).reshape(-1)
    full = quant.dequantize(raw, ttype, x.size)
    np.testing.assert_allclose(recon, full, rtol=1e-6, atol=1e-6)


def test_zero_block():
    x = np.zeros(64, np.float32)
    for ttype in ALL_QTYPES:
        y = quant.dequantize(quant.quantize(x, ttype), ttype, 64)
        np.testing.assert_allclose(y, 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# K-quants (256-element super-blocks, ggml-common.h:255-327)
# ---------------------------------------------------------------------------

# error ceilings (relative RMSE on N(0, 0.25) data); measured values are
# ~{q2:0.33, q3:0.16, q4:0.08, q5:0.04, q6:0.02} — ceilings catch a broken
# sub-block mapping (which produces ~1.0) without flaking on rng choice
_K_RMSE_MAX = {
    quant.GGML_TYPE_Q2_K: 0.45, quant.GGML_TYPE_Q3_K: 0.25,
    quant.GGML_TYPE_Q4_K: 0.13, quant.GGML_TYPE_Q5_K: 0.07,
    quant.GGML_TYPE_Q6_K: 0.035,
}


@pytest.mark.parametrize("ttype", K_QTYPES)
def test_kquant_roundtrip(ttype):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(8 * 256) * 0.25).astype(np.float32)
    raw = quant.quantize(x, ttype)
    assert len(raw) == quant.row_nbytes(ttype, x.size)
    y = quant.dequantize(raw, ttype, x.size)
    rmse = float(np.sqrt(((x - y) ** 2).mean()) / x.std())
    assert rmse < _K_RMSE_MAX[ttype], rmse


@pytest.mark.parametrize("ttype", K_QTYPES)
def test_kquant_int8_repack_matches_dequant(ttype):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(4 * 256)).astype(np.float32)
    raw = quant.quantize(x, ttype)
    q, d, m = quant.dequantize_to_int8_blocks(raw, ttype, x.size)
    bs = quant.int8_block_size(ttype)
    assert q.shape == (x.size // bs, bs)
    recon = (q.astype(np.float32) * d[:, None] + m[:, None]).reshape(-1)
    full = quant.dequantize(raw, ttype, x.size)
    np.testing.assert_array_equal(recon, full)


@pytest.mark.parametrize("ttype", K_QTYPES)
def test_kquant_zero_block(ttype):
    y = quant.dequantize(quant.quantize(np.zeros(256, np.float32), ttype),
                         ttype, 256)
    np.testing.assert_allclose(y, 0.0, atol=1e-7)
