"""Whisper encoder/decoder as pure JAX functions.

Functional re-design of the reference's ggml graph builders
(whisper_build_graph_conv src/whisper.cpp:1994-2054, _encoder :2056-2287,
_cross :2290-2363, _decoder :2474-2851) for TPU execution:

- layers are stacked and executed with `lax.scan` (one compiled block per
  stack instead of L unrolled graphs; fast compiles even for large-v3's 32
  layers);
- all matmuls run in bfloat16 on the MXU with float32 softmax/layernorm;
- the decoder step keeps its KV cache as explicit arrays threaded through
  the jitted step function — no host round-trip per token;
- attention mask logic is positional arithmetic, not the reference's
  host-built KQ_mask upload (src/whisper.cpp:2924-2956).

Shape conventions: activations (B, T, D); KV caches (L, B, H, T, Dh)
(see KVCache.zeros); weights from checkpoint/loader.py with W as [in, out].
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from whisper_tpu.config import WhisperHParams

Params = Dict[str, Any]


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def linear(x: jax.Array, p: Params) -> jax.Array:
    if "q" in p:
        # int8-block weights resident in HBM; dequant-in-kernel matmul
        # (ops/quant_matmul.py — the reference's quantized-microkernel idea).
        # block size is in//n_blocks (32 legacy / q4_K-q5_K, 16 for the
        # 16-element K-quant sub-blocks); "m" present for offset formats
        qb = p["q"].shape[-2] // p["d"].shape[-2]
        from whisper_tpu.ops.quant_matmul import quant_matmul
        y = quant_matmul(x, p["q"], p["d"], p.get("m"), qblock=qb)
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _split_heads(x: jax.Array, n_head: int) -> jax.Array:
    """(B, T, D) -> (B, H, T, Dh)"""
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, T, Dh) -> (B, T, D)"""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def attention(
    q: jax.Array,            # (B, H, Tq, Dh)
    k: jax.Array,            # (B, H, Tk, Dh)
    v: jax.Array,            # (B, H, Tk, Dh)
    mask: Optional[jax.Array] = None,  # broadcastable to (B, H, Tq, Tk); True=keep
) -> jax.Array:
    """Masked scaled-dot-product attention, f32 softmax. XLA fuses this into
    two MXU matmuls + a fused softmax; the Pallas flash-attention kernel in
    ops/flash_attention.py replaces it on the encoder hot path."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    # rows that are fully masked produce NaN from softmax(-inf); zero them
    if mask is not None:
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def quantize_kv_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(.., T, Dh) bf16 -> int8 codes + per-(.., T) f32 max-abs scales."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-10)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def attention_quant(
    q: jax.Array,            # (B, H, Tq, Dh) bf16
    kq: jax.Array,           # (B, H, Tk, Dh) int8
    ks: jax.Array,           # (B, H, Tk) f32
    vq: jax.Array,           # (B, H, Tk, Dh) int8
    vs: jax.Array,           # (B, H, Tk) f32
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """SDPA over the int8 KV cache. Per-position scales factor OUT of both
    contractions — scores[.., s] = ks[s] * (q . kq[s]) and
    out = (probs * vs) @ vq — so the int8 codes feed the MXU directly and
    the dequantized cache is never materialized."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, kq.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * scale * ks[:, :, None, :]
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    if mask is not None:
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    pw = (probs * vs[:, :, None, :]).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", pw, vq.astype(q.dtype),
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def conv_stem(params: Params, mel: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Conv1 (s=1) + GELU + Conv2 (s=2) + GELU.
    reference whisper_build_graph_conv (src/whisper.cpp:1994-2054).
    mel: (B, n_mels, 2*n_ctx) -> (B, n_ctx, D)."""
    x = mel.astype(dtype).transpose(0, 2, 1)  # (B, T, n_mels) NWC
    dn = lax.conv_dimension_numbers(x.shape, params["conv1"]["w"].shape, ("NWC", "WIO", "NWC"))
    x = lax.conv_general_dilated(
        x, params["conv1"]["w"].astype(dtype), window_strides=(1,),
        padding=((1, 1),), dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    x = jax.nn.gelu(x + params["conv1"]["b"], approximate=False).astype(dtype)
    dn = lax.conv_dimension_numbers(x.shape, params["conv2"]["w"].shape, ("NWC", "WIO", "NWC"))
    x = lax.conv_general_dilated(
        x, params["conv2"]["w"].astype(dtype), window_strides=(2,),
        padding=((1, 1),), dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    x = jax.nn.gelu(x + params["conv2"]["b"], approximate=False).astype(dtype)
    return x


def _encoder_block(hp: WhisperHParams, x: jax.Array, blk: Params,
                   attn_fn=None) -> jax.Array:
    """Pre-LN self-attention block (reference src/whisper.cpp:2109-2283)."""
    h = layer_norm(x, blk["attn_ln"], hp.eps)
    q = _split_heads(linear(h, blk["attn_q"]), hp.n_audio_head)
    k = _split_heads(linear(h, blk["attn_k"]), hp.n_audio_head)
    v = _split_heads(linear(h, blk["attn_v"]), hp.n_audio_head)
    if attn_fn is None:
        o = attention(q, k, v)
    else:
        o = attn_fn(q, k, v)
    x = x + linear(_merge_heads(o), blk["attn_out"])

    h = layer_norm(x, blk["mlp_ln"], hp.eps)
    h = jax.nn.gelu(linear(h, blk["mlp_0"]).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    x = x + linear(h, blk["mlp_2"])
    return x


def encoder_forward(
    params: Params,
    hp: WhisperHParams,
    mel: jax.Array,            # (B, n_mels, 2*n_audio_ctx_used)
    dtype=jnp.bfloat16,
    attn_fn=None,
) -> jax.Array:
    """Full encoder (reference whisper_build_graph_encoder,
    src/whisper.cpp:2056-2287). Returns (B, n_ctx_used, D)."""
    enc = params["encoder"]
    x = conv_stem(enc, mel, dtype)
    n_ctx_used = x.shape[1]
    x = x + enc["pos_embed"][:n_ctx_used].astype(dtype)

    def body(carry, blk):
        return _encoder_block(hp, carry, blk, attn_fn), None

    x, _ = lax.scan(body, x, enc["blocks"])
    return layer_norm(x, enc["ln_post"], hp.eps)


def cross_attention_kv(
    params: Params,
    hp: WhisperHParams,
    audio_embed: jax.Array,    # (B, Ta, D)
    quant: bool = False,
) -> Tuple[Any, Any]:
    """Precompute cross-attention K/V for every decoder layer from the
    encoder output (reference whisper_build_graph_cross,
    src/whisper.cpp:2290-2363; done once per 30 s window).
    Returns (L, B, H, Ta, Dh) each — or, with quant=True, each side as an
    (int8 codes, f32 (L, B, H, Ta) scales) tuple. The cross-KV is the
    second-largest HBM stream at serving batch (large-v3: 0.49 GB/utt in
    bf16, read every token); int8 halves it and the scales factor out of
    the attention dots exactly like the self-cache (attention_quant)."""
    dec = params["decoder"]

    def body(_, blk):
        k = _split_heads(linear(audio_embed, blk["cross_k"]), hp.n_text_head)
        v = _split_heads(linear(audio_embed, blk["cross_v"]), hp.n_text_head)
        if quant:
            return None, (quantize_kv_rows(k), quantize_kv_rows(v))
        return None, (k, v)

    _, (ks, vs) = lax.scan(body, None, dec["blocks"])
    return ks, vs


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Self-attention KV cache: (L, B, H, Tmax, Dh) arrays.

    Replaces the reference's cell/slot ring allocator
    (whisper_kv_cache, src/whisper.cpp:998-1187): decode batch entry b IS
    sequence b, so slot management reduces to a position counter; beam
    forking (kv_seq_cp, :1121-1167) becomes a gather over the batch axis
    (see decoding/beam.py).

    Optional int8 quantization (TPU-native, beyond the reference): with
    `ks`/`vs` set, k/v hold int8 codes and ks/vs the per-(layer, row,
    head, position) f32 scales (max-abs over the Dh lane / 127). The KV
    cache dominates per-chip HBM at serving batch sizes (12.5 GiB of a
    16 GiB chip at large-v3 beam-5 x 16 utterances in bf16), so halving
    it nearly doubles utterances/chip; attention dequantizes by factoring
    the scale out of the dot products (attention_quant)."""

    k: jax.Array
    v: jax.Array
    ks: Optional[jax.Array] = None   # (L, B, H, Tmax) f32, int8 mode only
    vs: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.ks is not None

    @classmethod
    def zeros(cls, hp: WhisperHParams, batch: int, dtype=jnp.bfloat16,
              size: int = 0, quant: bool = False) -> "KVCache":
        # pad to 256 like the reference (GGML_PAD(n_text_ctx, 256),
        # src/whisper.cpp:3403-3438): prompt (≤ n_text_ctx/2 + init) plus
        # n_text_ctx/2-4 sampled tokens can exceed n_text_ctx slots
        if size <= 0:
            size = -(-hp.n_text_ctx // 256) * 256
        shape = (hp.n_text_layer, batch, hp.n_text_head, size,
                 hp.n_text_state // hp.n_text_head)
        if quant:
            return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape[:-1], jnp.float32),
                       jnp.zeros(shape[:-1], jnp.float32))
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def reorder(self, src_idx: jax.Array) -> "KVCache":
        """Beam fork: new cache[b] = old cache[src_idx[b]]."""
        return KVCache(self.k[:, src_idx], self.v[:, src_idx],
                       None if self.ks is None else self.ks[:, src_idx],
                       None if self.vs is None else self.vs[:, src_idx])

    def reorder_if_forked(self, src_idx: jax.Array) -> "KVCache":
        """`reorder`, skipping the gather at runtime when src_idx is the
        identity permutation. In beam-search steady state each beam extends
        itself, so most steps fork nothing — but XLA cannot know that at
        compile time, and the unconditional batch-axis gather moves the
        whole cache through HBM every step (large-v3 beam-5: ~0.4 GB read
        + 0.4 GB written per token). The lax.cond makes the copy pay-per-use
        (reference analogue: kv_seq_cp is likewise only called for decoders
        whose source slot differs, src/whisper.cpp:7272-7285).

        NOTE (r4): the decode loops no longer materialize the fork at all —
        they pass `fork_src` into decoder_forward, which gathers each
        layer's rows as it reads them (pay-per-fork via a per-layer cond,
        zero cache-sized temp buffers). Any whole-cache cond here costs a
        second cache-sized XLA buffer (+2.1 GB at large-v3 beam-5, r3
        bench; a per-layer fori_loop variant still cost +1.2 GB). This
        method remains for host-side/manual cache surgery."""
        is_identity = jnp.all(src_idx == jnp.arange(src_idx.shape[0]))
        return jax.lax.cond(
            is_identity, lambda kv: kv, lambda kv: kv.reorder(src_idx), self)


def decoder_forward(
    params: Params,
    hp: WhisperHParams,
    tokens: jax.Array,         # (B, T) int32
    pos0: jax.Array,           # scalar int32 — first position of this chunk
    kv: KVCache,
    cross_k: jax.Array,        # (L, B, H, Ta, Dh); batch may be 1 when the
    cross_v: jax.Array,        # encoder K/V is shared across all B decoders
    dtype=jnp.bfloat16,
    collect_cross_qk: bool = False,
    logit_rows: Optional[jax.Array] = None,
    fork_src: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache, Optional[jax.Array]]:
    """Causal decoder over a chunk of T tokens (T=1 for the sampling loop,
    T=n_prompt for prompt ingestion — the reference's batched decode,
    src/whisper.cpp:2474-2851 + 2864-2993).

    `fork_src` ((B,) int32): beam fork, deferred. Row b's cache content is
    read AS IF it were row fork_src[b]'s (the reference's kv_seq_cp,
    src/whisper.cpp:7272-7285, as a gather). Applying it here — per layer,
    inside the scan, under a runtime identity check — costs nothing on the
    (steady-state) no-fork step and never materializes a second
    cache-sized buffer, unlike a standalone gather/cond before the call
    (r3/r4 bench: +2.1 GB / +1.2 GB of XLA temps at large-v3 beam-5).

    With collect_cross_qk, also returns the per-layer softmaxed cross-
    attention weights (L, B, H, T, Ta) for DTW token timestamps
    (reference saves the aheads-masked softmax(QK) per layer,
    src/whisper.cpp:2736-2752).

    `logit_rows` (scalar or (B,) int32): project ONLY that token row of each
    batch entry against the vocab, returning logits (B, 1, V). This is the
    reference's last-row-only logits trick (src/whisper.cpp:2835) — at
    large-v3 a 232-row prompt pass would otherwise waste ~30 GFLOP on the
    [T, 1280] x [1280, 51866] projection for rows nobody reads.

    Returns (logits[B, T|1, n_vocab] float32, updated KV, cross_qk or None).
    """
    dec = params["decoder"]
    B, T = tokens.shape
    H = hp.n_text_head

    # pos0 may be a scalar (all rows at the same position — the single-
    # utterance loop) or a (B,) vector (multi-utterance continuous batching,
    # where each row's prompt length differs)
    pos0 = jnp.asarray(pos0, jnp.int32)
    per_row = pos0.ndim == 1
    pos0_vec = jnp.broadcast_to(pos0, (B,))

    x = dec["token_embed"].astype(dtype)[tokens]          # get_rows (:2504)
    # clamp like ggml_get_rows' bounds behavior — positions past n_text_ctx
    # can only arise in the padded tail of an overlong prompt
    positions = jnp.minimum(pos0_vec[:, None] + jnp.arange(T)[None, :],
                            hp.n_text_ctx - 1)            # (B, T)
    x = x + dec["pos_embed"].astype(dtype)[positions]

    # SPLIT vs MERGED self-attention (r5). Scalar-position programs (the
    # single-utterance beam/greedy/speculative loops) read the cache
    # HISTORY (< pos0) straight out of the carried cache — XLA fuses the
    # dynamic-slice into the attention dots, so no merged per-layer slice
    # is ever materialized — and handle the chunk's own rows as an
    # explicit causally-masked block; writes are row-granular and the
    # beam fork persists via a per-layer pre-pass cond on the carry.
    # HLO-audited per-token traffic at large-v3 beam-5: 2.48 -> 2.28 GB
    # (the analytic model exactly); temps 1.19 -> 0.98 GB.
    # The per-row batched program keeps the merged path: its per-row
    # write positions lower to scatter under the split form, which
    # defeats carry aliasing (full-cache copies per layer) — measured,
    # not theoretical; see tools/hbm_audit.py and PERF.md.
    split = not per_row
    cache_pos = jnp.arange(kv.k.shape[3])
    if split:
        hist_mask = (cache_pos[None, None, None, :]
                     < pos0_vec[:, None, None, None])        # (B,1,1,Tmax)
        chunk_mask = (jnp.arange(T)[None, :]
                      <= jnp.arange(T)[:, None])[None, None]  # (1,1,T,T)
    else:
        # query t may attend cache pos <= pos0+t; garbage prompt-padding
        # slots sit above pos0+t and are never visible
        mask = cache_pos[None, None, :] <= (
            pos0_vec[:, None] + jnp.arange(T)[None, :])[:, :, None]
        mask = mask[:, None]                                 # (B,1,T,Tmax)

    if fork_src is not None:
        fork_needed = jnp.any(fork_src != jnp.arange(B))
    quant = kv.quantized

    def body(x, scanned):
        blk, kvs, ck, cv = scanned
        # --- self-attention with KV cache
        h = layer_norm(x, blk["attn_ln"], hp.eps)
        q = _split_heads(linear(h, blk["attn_q"]), H)
        k_new = _split_heads(linear(h, blk["attn_k"]), H)
        v_new = _split_heads(linear(h, blk["attn_v"]), H)

        if split:
            # history block (raw carry slices) + new-rows block
            scale_a = q.shape[-1] ** -0.5
            if quant:
                kq, vq, ksc, vsc = kvs
                lh = jnp.einsum("bhqd,bhkd->bhqk", q, kq.astype(q.dtype),
                                preferred_element_type=jnp.float32)
                lh = lh * scale_a * ksc[:, :, None, :]
                kq_r, ks_r = quantize_kv_rows(k_new)
                vq_r, vs_r = quantize_kv_rows(v_new)
                rows = (kq_r, vq_r, ks_r, vs_r)
            else:
                kh, vh = kvs
                lh = jnp.einsum("bhqd,bhkd->bhqk", q, kh.astype(q.dtype),
                                preferred_element_type=jnp.float32) * scale_a
                rows = (k_new, v_new)
            lh = jnp.where(hist_mask, lh, -jnp.inf)
            ln = jnp.einsum("bhqd,bhkd->bhqk", q, k_new,
                            preferred_element_type=jnp.float32) * scale_a
            ln = jnp.where(chunk_mask, ln, -jnp.inf)
            probs = jax.nn.softmax(
                jnp.concatenate([lh, ln], axis=-1), axis=-1)
            ph, pn = probs[..., : lh.shape[-1]], probs[..., lh.shape[-1]:]
            if quant:
                pw = (ph * vsc[:, :, None, :]).astype(q.dtype)
                o = jnp.einsum("bhqk,bhkd->bhqd", pw, vq.astype(q.dtype),
                               preferred_element_type=jnp.float32)
            else:
                o = jnp.einsum("bhqk,bhkd->bhqd", ph.astype(q.dtype),
                               vh.astype(q.dtype),
                               preferred_element_type=jnp.float32)
            o = (o + jnp.einsum("bhqk,bhkd->bhqd", pn.astype(q.dtype), v_new,
                                preferred_element_type=jnp.float32)
                 ).astype(q.dtype)
        else:
            # deferred beam fork (see docstring): gather this layer's rows
            # from their fork sources, skipped at runtime on no-fork steps
            if fork_src is not None:
                kvs = lax.cond(
                    fork_needed,
                    lambda t: tuple(a[fork_src] for a in t),
                    lambda t: t, kvs)

            # write new K/V at positions [pos0, pos0+T)
            def _write(cache_l, new_rows):
                """DUS rows at [pos0, pos0+T) on one layer's cache — same
                helper for (B, H, T, Dh) values and (B, H, T) scales."""
                tail = new_rows.ndim - 3       # dims after the T axis
                if per_row:
                    def _upd(cache_b, new_b, p):
                        return lax.dynamic_update_slice(
                            cache_b, new_b, (0, p) + (0,) * tail)
                    return jax.vmap(_upd)(cache_l, new_rows, pos0_vec)
                return lax.dynamic_update_slice(
                    cache_l, new_rows, (0, 0, pos0) + (0,) * tail)

            if quant:
                kq_new, ksc_new = quantize_kv_rows(k_new)
                vq_new, vsc_new = quantize_kv_rows(v_new)
                rows = (kq_new, vq_new, ksc_new, vsc_new)
                kvs = tuple(_write(c, n) for c, n in zip(kvs, rows))
                o = attention_quant(q, kvs[0], kvs[2], kvs[1], kvs[3], mask)
            else:
                rows = (k_new, v_new)
                kvs = tuple(_write(c, n) for c, n in zip(kvs, rows))
                o = attention(q, kvs[0], kvs[1], mask)
        x = x + linear(_merge_heads(o), blk["attn_out"])

        # --- cross-attention (precomputed K/V; optionally int8 codes +
        # per-position scales, which factor out of both dots — see
        # cross_attention_kv / attention_quant)
        h = layer_norm(x, blk["cross_ln"], hp.eps)
        qc = _split_heads(linear(h, blk["cross_q"]), H)
        scale = qc.shape[-1] ** -0.5
        cross_q8 = isinstance(ck, tuple)
        if cross_q8:
            (ck, ck_s), (cv, cv_s) = ck, cv
        # multi-row chunks (prompt / speculative-verify passes) run the
        # Pallas flash kernel: the (.., Tq, 1500) f32 score stages would
        # otherwise materialize ~1.7 GB x softmax pipeline at serving
        # batch (r5). T == 1 decode steps and the cross-QK-collecting DTW
        # pass keep the einsum path (flash never materializes the probs),
        # as does the int8 cross-KV (scales factor into the dots there).
        use_flash_cross = T > 1 and not collect_cross_qk and not cross_q8
        cross_probs = None
        if ck.shape[0] != B:
            # shared encoder K/V across groups of decoders (beam/best-of
            # fan-out, and utterance×beam folding in batch mode): fold each
            # group's decoder rows into the query-length axis and contract
            # against its single K/V copy — broadcasting it B-fold would
            # cost GBs of HBM per window for beam-5 large-v3 (L×B×H×1500×Dh).
            # Row u*G+g uses encoder copy u (G = rows per copy).
            U = ck.shape[0]
            G = B // U                                # rows per encoder copy
            ta = ck.shape[2]
            dh = qc.shape[-1]
            # (B,H,T,Dh) -> (U, H, G*T, Dh)
            qh = (qc.reshape(U, G, H, T, dh)
                    .transpose(0, 2, 1, 3, 4).reshape(U, H, G * T, dh))
            if use_flash_cross:
                from whisper_tpu.ops.flash_attention import flash_attention
                oc = flash_attention(qh, ck.astype(qh.dtype),
                                     cv.astype(qh.dtype), block_q=256)
            else:
                cross_logits = jnp.einsum(
                    "uhqd,uhkd->uhqk", qh, ck.astype(qc.dtype),
                    preferred_element_type=jnp.float32) * scale   # (U,H,G*T,Ta)
                if cross_q8:
                    cross_logits = cross_logits * ck_s[:, :, None, :]
                cross_probs = jax.nn.softmax(cross_logits, axis=-1)
                pw = (cross_probs * cv_s[:, :, None, :] if cross_q8
                      else cross_probs).astype(qc.dtype)
                oc = jnp.einsum("uhqk,uhkd->uhqd", pw, cv.astype(qc.dtype),
                                preferred_element_type=jnp.float32
                                ).astype(qc.dtype)
                cross_probs = (cross_probs.reshape(U, H, G, T, ta)
                               .transpose(0, 2, 1, 3, 4).reshape(B, H, T, ta))
            oc = (oc.reshape(U, H, G, T, dh)
                    .transpose(0, 2, 1, 3, 4).reshape(B, H, T, dh))
        elif use_flash_cross:
            from whisper_tpu.ops.flash_attention import flash_attention
            oc = flash_attention(qc, ck.astype(qc.dtype), cv.astype(qc.dtype),
                                 block_q=256)
        else:
            cross_logits = jnp.einsum("bhqd,bhkd->bhqk", qc, ck.astype(qc.dtype),
                                      preferred_element_type=jnp.float32) * scale
            if cross_q8:
                cross_logits = cross_logits * ck_s[:, :, None, :]
            cross_probs = jax.nn.softmax(cross_logits, axis=-1)
            pw = (cross_probs * cv_s[:, :, None, :] if cross_q8
                  else cross_probs).astype(qc.dtype)
            oc = jnp.einsum("bhqk,bhkd->bhqd", pw, cv.astype(qc.dtype),
                            preferred_element_type=jnp.float32).astype(qc.dtype)
        x = x + linear(_merge_heads(oc), blk["cross_out"])

        # --- MLP
        h = layer_norm(x, blk["mlp_ln"], hp.eps)
        h = jax.nn.gelu(linear(h, blk["mlp_0"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = x + linear(h, blk["mlp_2"])
        extras = (kvs, rows) + ((cross_probs,) if collect_cross_qk else ())
        return x, extras

    kvs_in = (kv.k, kv.v, kv.ks, kv.vs) if quant else (kv.k, kv.v)

    # The full stacked caches ride the scan CARRY, each layer
    # dynamic-slice-read and dynamic-update-slice-written at its layer
    # index — NOT as scan xs/ys. Same bytes either way, but the xs/ys form
    # broke XLA's in-place aliasing whenever the body contains Mosaic
    # custom calls (the q5 Pallas matmul): copy-insertion then rebuilt the
    # whole k AND v cache every token step (async per-layer slices +
    # ConcatBitcast + full-cache copy in the optimized HLO), costing ~2.4
    # GB/utt of temps and a cache-sized r/w per step at large-v3
    # (VERDICT r4 weak #2). The carry+DUS form aliases in place under the
    # same body (r5 fix, scratch evidence: temps 486 -> 175 MB at 1/4-dims
    # U=4xK=5, q5 weights).
    def body_carry(carry, scanned):
        x, kvs_full = carry
        blk, ck, cv, li = scanned

        if split and fork_src is not None:
            # the split path persists the beam fork by permuting this
            # layer's slice in the CARRY before it is read (pay-per-fork
            # cond; the attention then reads raw, fork-free history)
            def prefork(full):
                out = []
                for a in full:
                    sl = lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
                    out.append(lax.dynamic_update_index_in_dim(
                        a, sl[fork_src], li, 0))
                return tuple(out)

            kvs_full = lax.cond(fork_needed, prefork, lambda f: f, kvs_full)

        kvs_l = tuple(lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
                      for a in kvs_full)
        x, extras = body(x, (blk, kvs_l, ck, cv))
        new_layer, rows = extras[0], extras[1]

        def slice_wb(full):
            """Persist the whole updated layer slice (needed when the
            slice was permuted by a read-time beam fork or rows wrote at
            per-row positions)."""
            return tuple(lax.dynamic_update_index_in_dim(a, n, li, 0)
                         for a, n in zip(full, new_layer))

        # steady state writes ONE token-row range, not the 511 untouched
        # positions: r5 audit (tools/hbm_audit.py) measured the whole-slice
        # write-back at 2 x 6.55 MB/layer/step at large-v3 beam-5 —
        # ~0.4 GB/token of avoidable HBM traffic
        if per_row:
            # per-row positions (the batched loop): vmapped DUS over lanes
            def row_wb(full):
                out = []
                for a, r in zip(full, rows):
                    def upd(al, rb, p):
                        tail = rb.ndim - 2     # dims after the T axis
                        return lax.dynamic_update_slice(
                            al, rb[None], (li, 0, p) + (0,) * tail)
                    out.append(jax.vmap(upd, in_axes=(1, 0, 0), out_axes=1)(
                        a, r, pos0_vec))
                return tuple(out)
        else:
            def row_wb(full):
                out = []
                for a, r in zip(full, rows):
                    tail = r.ndim - 3          # dims after the T axis
                    out.append(lax.dynamic_update_slice(
                        a, r[None], (li, 0, 0, pos0) + (0,) * tail))
                return tuple(out)

        if split or fork_src is None:
            kvs_full = row_wb(kvs_full)
        else:
            kvs_full = lax.cond(fork_needed, slice_wb, row_wb, kvs_full)
        return (x, kvs_full), extras[2:]

    (x, kvs_out), ys = lax.scan(
        body_carry, (x, kvs_in),
        (dec["blocks"], cross_k, cross_v, jnp.arange(hp.n_text_layer)))
    cross_qk = ys[0] if collect_cross_qk else None
    new_kv = KVCache(*kvs_out)

    x = layer_norm(x, dec["ln"], hp.eps)
    if logit_rows is not None:
        # slice BEFORE the vocab projection (reference computes last-row
        # logits only, src/whisper.cpp:2835)
        lr = jnp.broadcast_to(jnp.asarray(logit_rows, jnp.int32), (B,))
        x = jnp.take_along_axis(
            x, jnp.broadcast_to(lr[:, None, None], (B, 1, x.shape[-1])), axis=1)
    logits = jnp.dot(x, dec["token_embed"].astype(x.dtype).T,
                     preferred_element_type=jnp.float32)
    return logits, new_kv, cross_qk


def decode_logits_only(params, hp, tokens, pos0, kv, cross_k, cross_v,
                       dtype=jnp.bfloat16, fork_src=None):
    logits, kv, _ = decoder_forward(params, hp, tokens, pos0, kv, cross_k,
                                    cross_v, dtype, fork_src=fork_src)
    return logits, kv
