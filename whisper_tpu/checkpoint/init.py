"""Random parameter initialization for tests and benchmarks.

No real weights ship with this repo (zero-egress environment), mirroring the
reference's own CI which exercises the full pipeline with stub models
(sys/whisper.cpp/tests/CMakeLists.txt:18-91). Shapes follow the checkpoint
loader's pytree layout exactly, so a random model is interchangeable with a
loaded one.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from whisper_tpu.audio.mel import mel_filterbank
from whisper_tpu.checkpoint.loader import LoadedModel, Params
from whisper_tpu.config import WhisperHParams, PRESET_HPARAMS
from whisper_tpu.tokenizer import synthetic_vocab


def _rng_normal(rng, shape, scale, dtype):
    return (rng.standard_normal(shape) * scale).astype(dtype)


def random_params(
    hp: WhisperHParams,
    seed: int = 0,
    compute_dtype: str = "bfloat16",
) -> Params:
    rng = np.random.default_rng(seed)
    d_a, d_t = hp.n_audio_state, hp.n_text_state
    cdt = compute_dtype

    def linear(n_in, n_out, bias=True):
        out = {"w": _rng_normal(rng, (n_in, n_out), n_in ** -0.5, cdt)}
        if bias:
            out["b"] = np.zeros(n_out, np.float32)
        return out

    def ln(n):
        return {"scale": np.ones(n, np.float32), "bias": np.zeros(n, np.float32)}

    def enc_block():
        return {
            "attn_ln": ln(d_a),
            "attn_q": linear(d_a, d_a),
            "attn_k": linear(d_a, d_a, bias=False),
            "attn_v": linear(d_a, d_a),
            "attn_out": linear(d_a, d_a),
            "mlp_ln": ln(d_a),
            "mlp_0": linear(d_a, 4 * d_a),
            "mlp_2": linear(4 * d_a, d_a),
        }

    def dec_block():
        return {
            "attn_ln": ln(d_t),
            "attn_q": linear(d_t, d_t),
            "attn_k": linear(d_t, d_t, bias=False),
            "attn_v": linear(d_t, d_t),
            "attn_out": linear(d_t, d_t),
            "cross_ln": ln(d_t),
            "cross_q": linear(d_t, d_t),
            "cross_k": linear(d_t, d_t, bias=False),
            "cross_v": linear(d_t, d_t),
            "cross_out": linear(d_t, d_t),
            "mlp_ln": ln(d_t),
            "mlp_0": linear(d_t, 4 * d_t),
            "mlp_2": linear(4 * d_t, d_t),
        }

    def stack(blocks):
        return {k: np.stack([b[k] if not isinstance(b[k], dict) else None for b in blocks])
                if not isinstance(blocks[0][k], dict)
                else {kk: np.stack([b[k][kk] for b in blocks]) for kk in blocks[0][k]}
                for k in blocks[0]}

    return {
        "encoder": {
            "pos_embed": sinusoid_position_embedding(hp.n_audio_ctx, d_a).astype(cdt),
            "conv1": {"w": _rng_normal(rng, (3, hp.n_mels, d_a), hp.n_mels ** -0.5, cdt),
                      "b": np.zeros(d_a, np.float32)},
            "conv2": {"w": _rng_normal(rng, (3, d_a, d_a), d_a ** -0.5, cdt),
                      "b": np.zeros(d_a, np.float32)},
            "ln_post": ln(d_a),
            "blocks": stack([enc_block() for _ in range(hp.n_audio_layer)]),
        },
        "decoder": {
            "pos_embed": _rng_normal(rng, (hp.n_text_ctx, d_t), 0.01, cdt),
            "token_embed": _rng_normal(rng, (hp.n_vocab, d_t), d_t ** -0.5, cdt),
            "ln": ln(d_t),
            "blocks": stack([dec_block() for _ in range(hp.n_text_layer)]),
        },
    }


def sinusoid_position_embedding(length: int, channels: int) -> np.ndarray:
    """OpenAI Whisper's encoder sinusoids (checkpoint tensor
    encoder.positional_embedding is exactly this)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def random_model(
    preset: str = "tiny",
    seed: int = 0,
    compute_dtype: str = "bfloat16",
    hp: Optional[WhisperHParams] = None,
) -> LoadedModel:
    """Random-weight LoadedModel for tests/benches (stub-model analogue)."""
    hp = hp or PRESET_HPARAMS[preset]
    return LoadedModel(
        hparams=hp,
        params=random_params(hp, seed, compute_dtype),
        mel_filters=mel_filterbank(hp.n_mels),
        vocab=synthetic_vocab(hp.n_vocab),
        n_loaded=-1,  # sentinel: random init, not a real checkpoint
    )


def tiny_test_hparams(n_vocab: int = 51864, n_mels: int = 80) -> WhisperHParams:
    """A micro model (2 audio / 3 text layers, 64-dim) for fast unit tests.

    THREE decoder layers on purpose: n_text_layer == 2 with a non-51866
    vocab trips the distil-whisper detection (loop.py is_distil, reference
    src/whisper.cpp:6954-6959), which force-disables timestamps — the
    default test model must behave like regular whisper (r4: the forced
    flag now reaches the logit filters, so a distil-shaped fixture would
    silently strip every timestamp test)."""
    return WhisperHParams(
        n_vocab=n_vocab, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_text_ctx=448, n_text_state=64, n_text_head=2,
        n_text_layer=3, n_mels=n_mels,
    )
