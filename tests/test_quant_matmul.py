"""Int8 quantized matmul kernel + keep-quantized model path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.checkpoint import quant
from whisper_tpu.ops.quant_matmul import (
    QBLOCK,
    dequant_reference,
    quant_matmul,
    repack_for_tpu,
)


def _make_qweight(rng, n_in, n_out, ttype=quant.GGML_TYPE_Q8_0):
    w = rng.standard_normal((n_out, n_in)).astype(np.float32) * 0.05
    raw = quant.quantize(w, ttype)
    q, d, m = quant.dequantize_to_int8_blocks(raw, ttype, w.size)
    qT, dT = repack_for_tpu(q, d, n_out, n_in)
    w_deq = quant.dequantize(raw, ttype, w.size).reshape(n_out, n_in)
    return qT, dT, w_deq


def test_repack_matches_dequant():
    rng = np.random.default_rng(0)
    qT, dT, w_deq = _make_qweight(rng, 64, 128)
    recon = np.asarray(dequant_reference(jnp.asarray(qT), jnp.asarray(dT)))
    np.testing.assert_allclose(recon, w_deq.T, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("shape", [(2, 64, 128), (1, 128, 256), (5, 256, 64)])
def test_quant_matmul_matches_dense(shape):
    B, n_in, n_out = shape
    rng = np.random.default_rng(1)
    qT, dT, w_deq = _make_qweight(rng, n_in, n_out)
    x = rng.standard_normal((B, n_in)).astype(np.float32) * 0.1
    want = x @ w_deq.T
    got = np.asarray(quant_matmul(jnp.asarray(x), jnp.asarray(qT),
                                  jnp.asarray(dT), out_tile=128))
    # kernel computes in bf16 inputs / f32 accum
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_quant_matmul_3d_input():
    rng = np.random.default_rng(2)
    qT, dT, w_deq = _make_qweight(rng, 64, 128)
    x = rng.standard_normal((2, 3, 64)).astype(np.float32) * 0.1
    got = np.asarray(quant_matmul(jnp.asarray(x), jnp.asarray(qT), jnp.asarray(dT),
                                  out_tile=128))
    assert got.shape == (2, 3, 128)
    want = x.reshape(-1, 64) @ w_deq.T
    np.testing.assert_allclose(got.reshape(-1, 128), want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("ttype", [quant.GGML_TYPE_Q4_1, quant.GGML_TYPE_Q5_1,
                                   quant.GGML_TYPE_Q2_K, quant.GGML_TYPE_Q3_K,
                                   quant.GGML_TYPE_Q4_K, quant.GGML_TYPE_Q5_K,
                                   quant.GGML_TYPE_Q6_K])
def test_quant_matmul_offset_and_kquant_blocks(ttype):
    """Offset formats (m operand) and 16-element K-quant sub-blocks run
    through the same kernel and match the materialized dequant matmul."""
    n_in, n_out, B = 256, 128, 3
    rng = np.random.default_rng(3)
    w = rng.standard_normal((n_out, n_in)).astype(np.float32) * 0.05
    raw = quant.quantize(w, ttype)
    q, d, m = quant.dequantize_to_int8_blocks(raw, ttype, w.size)
    bs = quant.int8_block_size(ttype)
    has_m = bool(np.any(m))
    if has_m:
        qT, dT, mT = repack_for_tpu(q, d, n_out, n_in, m, qblock=bs)
    else:
        qT, dT = repack_for_tpu(q, d, n_out, n_in, qblock=bs)
        mT = None
    w_deq = quant.dequantize(raw, ttype, w.size).reshape(n_out, n_in)
    x = rng.standard_normal((B, n_in)).astype(np.float32) * 0.1
    want = x @ w_deq.T
    got = np.asarray(quant_matmul(
        jnp.asarray(x), jnp.asarray(qT), jnp.asarray(dT),
        jnp.asarray(mT) if mT is not None else None,
        out_tile=128, qblock=bs))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_keep_quantized_model_close_to_dequantized(tmp_path):
    """A Q8_0 checkpoint loaded keep_quantized must produce logits close to
    the dequant-on-load path (only bf16-in-kernel rounding differs)."""
    import sys
    sys.path.insert(0, "tests")
    from test_ggml_io import _make_test_tensors
    import whisper_tpu as wt
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io
    from whisper_tpu.checkpoint.init import tiny_test_hparams
    from whisper_tpu.config import ContextParams
    from whisper_tpu.models import whisper as m
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = tiny_test_hparams()
    path = str(tmp_path / "q8.bin")
    ggml_io.write_ggml(path, hp, mel_filterbank(80),
                       synthetic_vocab(hp.n_vocab).id_to_token[:50256],
                       _make_test_tensors(hp, ttype=quant.GGML_TYPE_Q8_0))

    ctx_f = wt.WhisperContext.new_with_params(path, ContextParams(dtype="float32"))
    ctx_q = wt.WhisperContext.new_with_params(
        path, ContextParams(dtype="float32", keep_quantized=True))
    # structure: quantized blocks carry q/d instead of w
    assert "q" in ctx_q.params["decoder"]["blocks"]["mlp_0"]
    assert "w" in ctx_f.params["decoder"]["blocks"]["mlp_0"]

    mel = jnp.zeros((1, hp.n_mels, 2 * hp.n_audio_ctx), jnp.float32)
    e_f = np.asarray(m.encoder_forward(ctx_f.params, hp, mel, jnp.float32))
    e_q = np.asarray(m.encoder_forward(ctx_q.params, hp, mel, jnp.float32))
    assert np.abs(e_f - e_q).max() < 0.15  # bf16 kernel rounding only

    # full pipeline runs end-to-end with quantized weights
    st = ctx_q.create_state()
    from whisper_tpu.config import FullParams
    p = FullParams.default()
    p.print_progress = False
    p.temperature_inc = 0.0
    rng = np.random.default_rng(0)
    assert st.full(p, (0.1 * rng.standard_normal(32000)).astype(np.float32)) == 0


def test_kquant_keep_quantized_end_to_end(tmp_path):
    """A q5_K checkpoint (256-divisible dims) served keep_quantized: the
    16/32-element sub-block repack + offset operand flow through the
    int8 kernel inside a real full() decode."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from test_ggml_io import _make_test_tensors
    import whisper_tpu as wt
    from whisper_tpu.audio.mel import mel_filterbank
    from whisper_tpu.checkpoint import ggml_io
    from whisper_tpu.checkpoint.init import tiny_test_hparams
    from whisper_tpu.config import ContextParams, FullParams
    from whisper_tpu.tokenizer import synthetic_vocab
    from whisper_tpu.tools.quantize import quantize_model

    hp = dataclasses.replace(tiny_test_hparams(), n_audio_state=256,
                             n_text_state=256, n_audio_head=4, n_text_head=4)
    f16 = str(tmp_path / "m.bin")
    ggml_io.write_ggml(f16, hp, mel_filterbank(80),
                       synthetic_vocab(hp.n_vocab).id_to_token[:50256],
                       _make_test_tensors(hp, ttype=quant.GGML_TYPE_F16))
    q5k = str(tmp_path / "m-q5k.bin")
    log = quantize_model(f16, q5k, "q5_k")
    assert any(t == quant.GGML_TYPE_Q5_K for t in log.values())

    ctx = wt.WhisperContext.new_with_params(
        q5k, ContextParams(keep_quantized=True))
    # q5_K leaves carry the offset operand
    leaf = ctx.params["decoder"]["blocks"]["mlp_0"]
    assert "q" in leaf and "m" in leaf
    st = ctx.create_state()
    p = FullParams.default()
    p.print_progress = False
    p.temperature_inc = 0.0
    rng = np.random.default_rng(0)
    assert st.full(p, (0.1 * rng.standard_normal(32000)).astype(np.float32)) == 0
    assert st.full_n_segments() >= 1
