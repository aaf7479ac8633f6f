"""Fused multi-head attention Pallas kernel for the encoder.

Replaces the reference's ggml_flash_attn_ext path (src/whisper.cpp:
2159-2207, with its pad-to-256 kv_pad buffer) on the encoder's 1500-frame
self-attention. At seq 1500 / head_dim 64 the whole K/V of one head fits in
VMEM, so the kernel streams Q blocks against resident K/V — one fused
QK^T -> softmax -> PV per program, no HBM round-trip for the 1500x1500
score matrix (the HBM-bandwidth win over unfused XLA attention).

Shapes: q,k,v (B, H, T, D) -> out (B, H, T, D). T padded to the Q-block
multiple internally; padded keys are masked with -inf before softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t_real: int):
    # blocks carry a leading singleton (batch*head) axis
    q = q_ref[0].astype(jnp.float32)     # (BLOCK_Q, D)
    k = k_ref[0].astype(jnp.float32)     # (T_pad, D)
    v = v_ref[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # (BLOCK_Q, T_pad)

    t_pad = k.shape[0]
    if t_real < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < t_real, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom

    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    block_q: int = 512, interpret: bool | None = None) -> jax.Array:
    """Unmasked MHA: softmax(q k^T / sqrt(d)) v, fused per (batch*head,
    q-block). Numerically matches models/whisper.attention (f32 softmax).

    q may have a different sequence length than k/v (cross-attention: the
    decoder's prompt pass contracts T_prompt queries against 1500 encoder
    frames; materializing those (B, H, Tq, 1500) f32 score stages cost
    ~1.7 GB x softmax pipeline at serving batch — r5)."""
    B, H, T, D = q.shape
    Tk = k.shape[2]
    scale = D ** -0.5

    t_pad = -(-T // block_q) * block_q
    if t_pad != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    tk_pad = -(-Tk // 128) * 128
    if tk_pad != Tk:
        pad = ((0, 0), (0, 0), (0, tk_pad - Tk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qf = q.reshape(B * H, t_pad, D)
    kf = k.reshape(B * H, tk_pad, D)
    vf = v.reshape(B * H, tk_pad, D)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    grid = (B * H, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, t_real=Tk),
        out_shape=jax.ShapeDtypeStruct((B * H, t_pad, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, tk_pad, D), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, tk_pad, D), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, i: (bh, i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * block_q * tk_pad * D,
            bytes_accessed=(block_q * D + 2 * tk_pad * D + block_q * D) * 2,
            transcendentals=block_q * tk_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(B, H, t_pad, D)[:, :, :T]


def encoder_attn_fn(q, k, v):
    """Drop-in for models/whisper.encoder_forward's attn_fn hook."""
    return flash_attention(q, k, v)
