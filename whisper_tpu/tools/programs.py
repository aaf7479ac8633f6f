"""Abstract-shape builders for the evidence programs (bench + audits).

Every perf artifact in this repo AOT-compiles the REAL shipped programs at
large-v3 dims from jax.ShapeDtypeStructs (no multi-GB weight upload over
the relay) and reads XLA's memory/cost analysis. This module is the single
source of those lowerings so bench.py, tools/hbm_audit.py and
tools/tp_evidence.py cannot drift from each other or from the serving path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LV3Abstract(NamedTuple):
    hp: object
    consts: object
    tids: object
    abs_params: object     # bf16 weight ShapeDtypeStructs
    q_params: object       # int8-block (q5-class) layout
    prompt_max: int


def lv3_abstract(preset: str = "large-v3", beam: bool = True) -> LV3Abstract:
    from whisper_tpu.checkpoint.init import random_params
    from whisper_tpu.checkpoint.quant import abstract_int8_block_shapes
    from whisper_tpu.config import FullParams, PRESET_HPARAMS, SamplingStrategy
    from whisper_tpu.decoding import filters
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = PRESET_HPARAMS[preset]
    vocab = synthetic_vocab(hp.n_vocab)
    consts, tids = filters.build_filter_consts(
        vocab, hp,
        FullParams.default(SamplingStrategy.BEAM_SEARCH if beam
                           else SamplingStrategy.GREEDY))
    shapes = jax.eval_shape(
        lambda: jax.tree_util.tree_map(
            jnp.asarray, random_params(hp, seed=0, compute_dtype="bfloat16")))
    abs_params = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)
    q_params = abstract_int8_block_shapes(abs_params)
    return LV3Abstract(hp, consts, tids, abs_params, q_params,
                       hp.n_text_ctx // 2 + 8)


def cross_kv_structs(hp, n_utt: int, quant: bool = False):
    """ShapeDtypeStructs for one side (K or V) of the precomputed cross-KV."""
    L, H = hp.n_text_layer, hp.n_text_head
    dh = hp.n_text_state // hp.n_text_head
    T = hp.n_audio_ctx
    if quant:
        return (jax.ShapeDtypeStruct((L, n_utt, H, T, dh), jnp.int8),
                jax.ShapeDtypeStruct((L, n_utt, H, T), jnp.float32))
    return jax.ShapeDtypeStruct((L, n_utt, H, T, dh), jnp.bfloat16)


def lower_decode_window(a: LV3Abstract, quantized: bool = False,
                        beam_size: int = 5):
    """The north-star program: single-utterance whole-window beam decode
    (decoding/device_loop.decode_window) at large-v3 dims."""
    from whisper_tpu.decoding import device_loop

    hp = a.hp
    ck = cross_kv_structs(hp, 1)
    i32, f32 = jnp.int32, jnp.float32
    return device_loop.decode_window.lower(
        a.q_params if quantized else a.abs_params, hp, a.consts, ck, ck,
        jax.ShapeDtypeStruct((a.prompt_max,), i32),
        jax.ShapeDtypeStruct((), i32),
        jax.ShapeDtypeStruct((), f32),
        jax.ShapeDtypeStruct((), i32), jax.ShapeDtypeStruct((), i32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        tids=a.tids, n_dec=beam_size, strategy=device_loop.BEAM,
        beam_size=beam_size, dtype=jnp.bfloat16)


def lower_batch_decode(a: LV3Abstract, n_utt: int, weights: str = "bf16",
                       kv_quant: bool = False, n_per_utt: int = 5):
    """The serving program: U-utterance batched windowed decode
    (decoding/batch_loop.decode_windows_batch)."""
    from whisper_tpu.decoding import batch_loop, device_loop

    hp = a.hp
    ck = cross_kv_structs(hp, n_utt, quant=kv_quant)
    i32, f32 = jnp.int32, jnp.float32
    p = a.q_params if weights == "q5" else a.abs_params
    return batch_loop.decode_windows_batch.lower(
        p, hp, a.consts, ck, ck,
        jax.ShapeDtypeStruct((n_utt, a.prompt_max), i32),
        jax.ShapeDtypeStruct((n_utt,), i32),
        jax.ShapeDtypeStruct((), f32),
        jax.ShapeDtypeStruct((n_utt,), i32),
        jax.ShapeDtypeStruct((n_utt,), i32),
        jax.ShapeDtypeStruct((n_utt,), jnp.bool_),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        tids=a.tids, n_utt=n_utt, n_per_utt=n_per_utt,
        strategy=device_loop.BEAM, dtype=jnp.bfloat16, kv_quant=kv_quant)


def lower_speculative(a: LV3Abstract, k_spec: int = 8, draft_layers: int = 2):
    """Speculative greedy at scale: large-v3 main + a distil-shaped draft
    (2 decoder layers, same width/vocab) — the two-model draft/verify
    while_loop program (decoding/speculative.py)."""
    import dataclasses as _dc

    from whisper_tpu.checkpoint.init import random_params
    from whisper_tpu.config import FullParams
    from whisper_tpu.decoding import filters
    from whisper_tpu.decoding.speculative import decode_window_speculative
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = a.hp
    hp_d = _dc.replace(hp, n_text_layer=draft_layers)
    d_shapes = jax.eval_shape(
        lambda: jax.tree_util.tree_map(
            jnp.asarray, random_params(hp_d, seed=0, compute_dtype="bfloat16")))
    abs_draft = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), d_shapes)
    H = hp.n_text_head
    dh = hp.n_text_state // H
    ck = cross_kv_structs(hp, 1)
    dck = jax.ShapeDtypeStruct((draft_layers, 1, H, hp.n_audio_ctx, dh),
                               jnp.bfloat16)
    vocab = synthetic_vocab(hp.n_vocab)
    consts_g, tids_g = filters.build_filter_consts(
        vocab, hp, FullParams.default())
    i32 = jnp.int32
    return decode_window_speculative.lower(
        a.abs_params, abs_draft, hp, hp_d, consts_g, ck, ck, dck, dck,
        jax.ShapeDtypeStruct((a.prompt_max,), i32),
        jax.ShapeDtypeStruct((), i32),
        jax.ShapeDtypeStruct((), i32), jax.ShapeDtypeStruct((), i32),
        tids=tids_g, k_spec=k_spec, dtype=jnp.bfloat16)


def lower_encoder(a: LV3Abstract, batch: int = 1, use_flash=None):
    from whisper_tpu.api import _encode_jit

    hp = a.hp
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    return _encode_jit.lower(
        a.abs_params, hp,
        jax.ShapeDtypeStruct((batch, hp.n_mels, 2 * hp.n_audio_ctx),
                             jnp.bfloat16),
        jnp.bfloat16, use_flash)


def memory_summary(compiled) -> dict:
    m = compiled.memory_analysis()
    return {
        "args_gb": round(m.argument_size_in_bytes / 2**30, 3),
        "temp_gb": round(m.temp_size_in_bytes / 2**30, 3),
        "out_mb": round(m.output_size_in_bytes / 2**20, 3),
        "hbm_peak_gb": round(
            (m.argument_size_in_bytes + m.temp_size_in_bytes
             + m.output_size_in_bytes) / 2**30, 2),
    }
