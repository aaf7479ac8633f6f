"""Int8-block quantized matmul — dequantize-in-kernel Pallas op.

The reference's quantized path dequantizes blocks inside its CPU/CUDA
matmul microkernels (ggml-quants.c + per-backend kernels) so weights cross
memory at ~1 byte/elem. Same idea here: weights live in HBM as int8 with
per-block scales (checkpoint/quant.dequantize_to_int8_blocks layout,
repacked to column-major blocks by the loader); the kernel upcasts q*d (+m)
to bf16 in VMEM and feeds the MXU. For the bandwidth-bound decoder token
step this halves (vs bf16) or quarters (vs f32) the weight traffic — the
dominant cost at batch 1-8.

Layout: q (IN, OUT) int8; d (IN//bs, OUT) f32 — scale of the bs-row input
block (bs = 32 for the legacy ggml formats and q4_K/q5_K, 16 for the
16-element K-quant sub-blocks, see quant.int8_block_size). Offset formats
(q4_1/q5_1/q2_K/q4_K/q5_K) add m (IN//bs, OUT) f32:
y = x @ (q * repeat(d, bs, 0) + repeat(m, bs, 0)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 32  # default block size (legacy formats)


def _qmm_kernel(x_ref, q_ref, d_ref, o_ref, *, qblock):
    # x: (Bp, IN) bf16 | q: (IN, OT) i8 | d: (IN//bs, OT) f32 | o: (Bp, OT)
    q = q_ref[:]
    d = d_ref[:]
    IN, OT = q.shape
    # element-repeat each scale row over its bs input rows
    # (NB: pltpu.repeat TILES copies — wrong op here)
    qb = q.reshape(IN // qblock, qblock, OT).astype(jnp.bfloat16)
    w = (qb * d.astype(jnp.bfloat16)[:, None, :]).reshape(IN, OT)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _qmm_kernel_offset(x_ref, q_ref, d_ref, m_ref, o_ref, *, qblock):
    # offset variant: w = q*d + m (block-broadcast), fused before the MXU
    q = q_ref[:]
    d = d_ref[:]
    m = m_ref[:]
    IN, OT = q.shape
    qb = q.reshape(IN // qblock, qblock, OT).astype(jnp.bfloat16)
    w = (qb * d.astype(jnp.bfloat16)[:, None, :]
         + m.astype(jnp.bfloat16)[:, None, :]).reshape(IN, OT)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_tile", "interpret", "qblock"))
def quant_matmul(
    x: jax.Array,          # (..., IN) bf16/f32
    q: jax.Array,          # (IN, OUT) int8
    d: jax.Array,          # (IN//qblock, OUT) f32
    m: jax.Array | None = None,  # (IN//qblock, OUT) f32 block offsets
    out_tile: int = 512,
    interpret: bool | None = None,
    qblock: int = QBLOCK,
) -> jax.Array:
    """y[..., OUT] = x @ dequant(q, d[, m]); accumulation in f32."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    IN, OUT = q.shape
    lead = x.shape[:-1]
    B = 1
    for s in lead:
        B *= s
    xf = x.reshape(B, IN).astype(jnp.bfloat16)

    # pad rows to the bf16 sublane multiple and OUT to the tile; large row
    # counts (batched prompt passes: B = n_utt * prompt_len, up to ~1k)
    # are tiled too — a single (Bp, IN) activation block at IN = 4*d blows
    # Mosaic's VMEM budget and kills the compile (r4: q5 batch capacity
    # sweep failed at U>=4 on exactly this), and decode-sized calls
    # (Bp <= row_tile) keep the old single-row-block schedule
    row_tile = 256
    Bp = max(16, -(-B // 16) * 16)
    if Bp > row_tile:
        Bp = -(-B // row_tile) * row_tile
    else:
        row_tile = Bp
    if Bp != B:
        xf = jnp.pad(xf, ((0, Bp - B), (0, 0)))
    out_tile = min(out_tile, OUT)
    Op = -(-OUT // out_tile) * out_tile
    if Op != OUT:
        q = jnp.pad(q, ((0, 0), (0, Op - OUT)))
        d = jnp.pad(d, ((0, 0), (0, Op - OUT)))
        if m is not None:
            m = jnp.pad(m, ((0, 0), (0, Op - OUT)))

    in_specs = [
        pl.BlockSpec((row_tile, IN), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((IN, out_tile), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((IN // qblock, out_tile), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xf, q, d]
    if m is not None:
        in_specs.append(pl.BlockSpec((IN // qblock, out_tile),
                                     lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(m)
        kernel = functools.partial(_qmm_kernel_offset, qblock=qblock)
    else:
        kernel = functools.partial(_qmm_kernel, qblock=qblock)

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Op), jnp.float32),
        # out tiles innermost: each row tile's weight stream stays hot
        grid=(Bp // row_tile, Op // out_tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((row_tile, out_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * IN * Op,
            bytes_accessed=IN * Op + IN // qblock * Op * 4 + Bp * IN * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    return y[:B, :OUT].reshape(lead + (OUT,))


def dequant_reference(q: jax.Array, d: jax.Array, m: jax.Array | None = None,
                      qblock: int = QBLOCK) -> jax.Array:
    """Materialized dequantization (the XLA fallback and test oracle)."""
    w = q.astype(jnp.float32) * jnp.repeat(d, qblock, axis=0)
    if m is not None:
        w = w + jnp.repeat(m, qblock, axis=0)
    return w


def repack_for_tpu(w_rowmajor_q, w_rowmajor_d, out_dim: int, in_dim: int,
                   w_rowmajor_m=None, qblock: int = QBLOCK):
    """(nb, bs) int8 + (nb,) scales [+ (nb,) offsets] over a row-major
    [out, in] tensor -> (in, out) int8 + (in//bs, out) f32 for quant_matmul."""
    import numpy as np
    q = np.asarray(w_rowmajor_q).reshape(out_dim, in_dim).T.copy()
    d = np.asarray(w_rowmajor_d).reshape(out_dim, in_dim // qblock).T.copy()
    if w_rowmajor_m is None:
        return q, d
    m = np.asarray(w_rowmajor_m).reshape(out_dim, in_dim // qblock).T.copy()
    return q, d, m
