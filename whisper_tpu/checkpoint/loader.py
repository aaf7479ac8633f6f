"""ggml checkpoint -> JAX parameter pytree.

The reference streams tensors into per-backend ggml buffers keyed by exact
tensor names (src/whisper.cpp:1729-1965; name map sys/whisper.cpp/src/
whisper-arch.h:42-141). Here we instead build a functional pytree designed
for TPU execution:

- per-layer weights are STACKED along a leading `layer` axis so the
  encoder/decoder run as `lax.scan` over layers (one compiled block instead
  of L unrolled ones; one sharding spec per stacked tensor);
- matmul weights are stored [in, out] so the hot path is `x @ W` on the MXU;
- weights live in the compute dtype (bfloat16 by default), layernorm and
  biases stay float32 for numerical stability;
- quantized checkpoints (Q4/Q5/Q8) can either be dequantized on load
  (default) or repacked to int8-blocks + scales for the Pallas int8 matmul
  path (`keep_quantized=True`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np

from whisper_tpu.checkpoint import ggml_io, quant
from whisper_tpu.config import WhisperHParams
from whisper_tpu.tokenizer import WhisperVocab

Params = Dict[str, Any]


@dataclasses.dataclass
class LoadedModel:
    hparams: WhisperHParams
    params: Params                 # pytree of np/jnp arrays
    mel_filters: np.ndarray        # (n_mel, n_fft_bins) float32
    vocab: WhisperVocab
    n_loaded: int                  # tensors loaded; 0 = stub model (tests)


def _stack(layers: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of per-layer pytrees along a new leading `layer` axis."""
    if not layers:
        return {}
    first = layers[0]
    out: Dict[str, Any] = {}
    for k, v in first.items():
        if isinstance(v, dict):
            out[k] = _stack([l[k] for l in layers])
        else:
            out[k] = np.stack([l[k] for l in layers], axis=0)
    return out


def _get(t: Dict[str, ggml_io.RawTensor], name: str) -> Optional[np.ndarray]:
    rt = t.get(name)
    return None if rt is None else rt.to_float32()


# block formats that can stay quantized on device (int8 + per-block scale,
# plus a per-block offset for the asymmetric codecs)
_KEEPQ_TYPES = (quant.GGML_TYPE_Q4_0, quant.GGML_TYPE_Q4_1,
                quant.GGML_TYPE_Q5_0, quant.GGML_TYPE_Q5_1,
                quant.GGML_TYPE_Q8_0) + quant.K_QUANT_TYPES
# backwards-compat alias (pre-K-quant name)


def _linear(t, prefix: str, has_bias: bool = True,
            keep_quantized: bool = False) -> Optional[Dict[str, np.ndarray]]:
    rt = t.get(prefix + ".weight")
    if rt is None:
        return None
    out: Dict[str, np.ndarray]
    if (keep_quantized and rt.ttype in _KEEPQ_TYPES and len(rt.ne) == 2
            and rt.ne[0] % quant.block_size(rt.ttype) == 0):
        # keep int8 blocks + scales for the dequant-in-kernel matmul path
        from whisper_tpu.ops.quant_matmul import repack_for_tpu
        q, d, m = quant.dequantize_to_int8_blocks(rt.data, rt.ttype, rt.nelements)
        n_out, n_in = rt.shape  # numpy row-major [out, in]
        bs = quant.int8_block_size(rt.ttype)
        # offset-or-not is decided by FORMAT (not by the values) so every
        # layer of a stacked group gets an identical leaf structure
        if rt.ttype in (quant.GGML_TYPE_Q4_1, quant.GGML_TYPE_Q5_1,
                        quant.GGML_TYPE_Q2_K, quant.GGML_TYPE_Q4_K,
                        quant.GGML_TYPE_Q5_K):
            qT, dT, mT = repack_for_tpu(q, d, n_out, n_in, m, qblock=bs)
            out = {"q": qT, "d": dT, "m": mT}
        else:
            qT, dT = repack_for_tpu(q, d, n_out, n_in, qblock=bs)
            out = {"q": qT, "d": dT}
    else:
        w = rt.to_float32()
        out = {"w": np.ascontiguousarray(w.T)}  # [out,in] -> [in,out]
    if has_bias:
        b = _get(t, prefix + ".bias")
        out["b"] = b if b is not None else np.zeros(rt.shape[0], np.float32)
    return out


def _ln(t, prefix: str) -> Optional[Dict[str, np.ndarray]]:
    w = _get(t, prefix + ".weight")
    if w is None:
        return None
    return {"scale": w, "bias": _get(t, prefix + ".bias")}


def _cast_tree(tree, compute_dtype: str):
    """Cast matmul weights ('w') to compute dtype; keep ln/bias in f32."""
    if isinstance(tree, dict):
        return {k: (v.astype(compute_dtype) if k in ("w", "pos_embed", "token_embed")
                    and isinstance(v, np.ndarray) else _cast_tree(v, compute_dtype))
                for k, v in tree.items()}
    return tree


def params_from_checkpoint(
    ckpt: ggml_io.GgmlCheckpoint,
    compute_dtype: str = "bfloat16",
    keep_quantized: bool = False,
) -> LoadedModel:
    hp = ckpt.hparams
    t = ckpt.tensors

    kq = keep_quantized

    enc_blocks = []
    for il in range(hp.n_audio_layer):
        p = f"encoder.blocks.{il}"
        blk = {
            "attn_ln": _ln(t, f"{p}.attn_ln"),
            "attn_q": _linear(t, f"{p}.attn.query", keep_quantized=kq),
            "attn_k": _linear(t, f"{p}.attn.key", has_bias=False, keep_quantized=kq),
            "attn_v": _linear(t, f"{p}.attn.value", keep_quantized=kq),
            "attn_out": _linear(t, f"{p}.attn.out", keep_quantized=kq),
            "mlp_ln": _ln(t, f"{p}.mlp_ln"),
            "mlp_0": _linear(t, f"{p}.mlp.0", keep_quantized=kq),
            "mlp_2": _linear(t, f"{p}.mlp.2", keep_quantized=kq),
        }
        if any(v is None for v in blk.values()):
            enc_blocks = []
            break
        enc_blocks.append(blk)

    dec_blocks = []
    for il in range(hp.n_text_layer):
        p = f"decoder.blocks.{il}"
        blk = {
            "attn_ln": _ln(t, f"{p}.attn_ln"),
            "attn_q": _linear(t, f"{p}.attn.query", keep_quantized=kq),
            "attn_k": _linear(t, f"{p}.attn.key", has_bias=False, keep_quantized=kq),
            "attn_v": _linear(t, f"{p}.attn.value", keep_quantized=kq),
            "attn_out": _linear(t, f"{p}.attn.out", keep_quantized=kq),
            "cross_ln": _ln(t, f"{p}.cross_attn_ln"),
            "cross_q": _linear(t, f"{p}.cross_attn.query", keep_quantized=kq),
            "cross_k": _linear(t, f"{p}.cross_attn.key", has_bias=False, keep_quantized=kq),
            "cross_v": _linear(t, f"{p}.cross_attn.value", keep_quantized=kq),
            "cross_out": _linear(t, f"{p}.cross_attn.out", keep_quantized=kq),
            "mlp_ln": _ln(t, f"{p}.mlp_ln"),
            "mlp_0": _linear(t, f"{p}.mlp.0", keep_quantized=kq),
            "mlp_2": _linear(t, f"{p}.mlp.2", keep_quantized=kq),
        }
        if any(v is None for v in blk.values()):
            dec_blocks = []
            break
        dec_blocks.append(blk)

    conv1_w = _get(t, "encoder.conv1.weight")  # (d, n_mels, 3)
    conv2_w = _get(t, "encoder.conv2.weight")

    params: Params = {}
    if conv1_w is not None and enc_blocks and dec_blocks:
        params = {
            "encoder": {
                "pos_embed": _get(t, "encoder.positional_embedding"),
                # (out, in, k) -> (k, in, out) "WIO" for lax.conv NWC;
                # conv biases are stored [n, 1] in the reference format
                # (convert-pt-to-ggml.py:299-301) — flatten either layout
                "conv1": {"w": np.ascontiguousarray(conv1_w.transpose(2, 1, 0)),
                          "b": _get(t, "encoder.conv1.bias").reshape(-1)},
                "conv2": {"w": np.ascontiguousarray(conv2_w.transpose(2, 1, 0)),
                          "b": _get(t, "encoder.conv2.bias").reshape(-1)},
                "ln_post": _ln(t, "encoder.ln_post"),
                "blocks": _stack(enc_blocks),
            },
            "decoder": {
                "pos_embed": _get(t, "decoder.positional_embedding"),
                "token_embed": _get(t, "decoder.token_embedding.weight"),
                "ln": _ln(t, "decoder.ln"),
                "blocks": _stack(dec_blocks),
            },
        }
        params = _cast_tree(params, compute_dtype)

    vocab = WhisperVocab(hp.n_vocab, ckpt.vocab_tokens)
    return LoadedModel(
        hparams=hp,
        params=params,
        mel_filters=ckpt.mel_filters,
        vocab=vocab,
        n_loaded=len(ckpt.tensors),
    )


def load_model(path: str, compute_dtype: str = "bfloat16",
               keep_quantized: bool = False) -> LoadedModel:
    """One-call load: parse .bin + build pytree (reference call stack
    whisper_init_from_file_with_params -> whisper_model_load,
    src/whisper.cpp:3640-3721 + 1503)."""
    return params_from_checkpoint(ggml_io.read_ggml(path), compute_dtype,
                                  keep_quantized)
