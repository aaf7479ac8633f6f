"""Large-v3 tensor-parallel compiled evidence (VERDICT r2 #5).

AOT-compiles the SHARDED large-v3 programs — the encoder and the full
batched beam-5 decode window (decoding/batch_loop.py, the lax.while_loop
included) — over a (data=1, model=TP) mesh for TP in {1, 2, 4}, entirely
from abstract shapes (no weights materialized). For each TP degree it
reports:

  - per-shard argument/temp bytes from XLA's memory_analysis() — for an
    SPMD executable these are PER-DEVICE numbers, so they must drop as TP
    grows (the north-star check: per-chip HBM below the 3.96 GB
    single-chip beam-5 footprint from BENCH_r02);
  - collective-op counts from the optimized HLO (all-reduce/all-gather/
    reduce-scatter/collective-permute), placed where parallel/mesh.py's
    Megatron specs predict them (one psum per attention out-projection +
    one per MLP second matmul, SURVEY §2.7 TP row).

Run on virtual CPU devices (the compiler's partitioner is identical for
CPU/TPU targets at this level):

    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
        python -m whisper_tpu.tools.tp_evidence
"""

from __future__ import annotations

import json
import re


def _abs_sharded_params(hp, mesh, tp: bool):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from whisper_tpu.checkpoint.init import random_params
    from whisper_tpu.parallel import mesh as mesh_mod

    shapes = jax.eval_shape(
        lambda: jax.tree_util.tree_map(
            jnp.asarray, random_params(hp, seed=0, compute_dtype="bfloat16")))
    specs = mesh_mod.param_specs(shapes, tp=tp, n_model=mesh.shape["model"])
    return jax.tree_util.tree_map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        shapes, specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _report(compiled) -> dict:
    m = compiled.memory_analysis()
    hlo = compiled.as_text()
    coll = {}
    for c in _COLLECTIVES:
        # count the op once: async pairs lower to X-start/X-done — counting
        # both doubled the figure (r3 review)
        n = len(re.findall(rf"\b{c}(?:-start)?\(", hlo))
        if n:
            coll[c] = n
    return {
        "args_gb": round(m.argument_size_in_bytes / 2**30, 3),
        "temp_gb": round(m.temp_size_in_bytes / 2**30, 3),
        "out_mb": round(m.output_size_in_bytes / 2**20, 3),
        "collectives": coll,
    }


def tp_compile_evidence(tp: int, preset: str = "large-v3",
                        beam: int = 5) -> dict:
    """Compile sharded encoder + batched beam decode at `preset` dims with
    TP-way model parallelism; return per-shard memory + collective counts."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_tpu.config import (FullParams, PRESET_HPARAMS,
                                    SamplingStrategy)
    from whisper_tpu.decoding import batch_loop, device_loop, filters
    from whisper_tpu.models import whisper as model_mod
    from whisper_tpu.parallel import mesh as mesh_mod
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = PRESET_HPARAMS[preset]
    assert hp.n_text_head % tp == 0, (hp.n_text_head, tp)
    mesh = mesh_mod.make_mesh(1, tp)
    abs_params = _abs_sharded_params(hp, mesh, tp=tp > 1)

    vocab = synthetic_vocab(hp.n_vocab)
    consts, tids = filters.build_filter_consts(
        vocab, hp, FullParams.default(SamplingStrategy.BEAM_SEARCH))

    def sds(shape, dtype, spec=None):
        return jax.ShapeDtypeStruct(
            shape, dtype,
            sharding=NamedSharding(mesh, spec if spec is not None else P()))

    L, H = hp.n_text_layer, hp.n_text_head
    dh = hp.n_text_state // H
    i32, f32, bf16 = jnp.int32, jnp.float32, jnp.bfloat16

    out = {"tp": tp, "preset": preset}

    # --- sharded encoder (XLA SDPA attention; the partitioner handles the
    # head-sharded projections + psum on the out-projection) --------------
    from whisper_tpu.api import _encode_jit
    with mesh:
        enc = _encode_jit.lower(
            abs_params, hp,
            sds((1, hp.n_mels, 2 * hp.n_audio_ctx), bf16),
            bf16, False).compile()
    out["encoder"] = _report(enc)

    # --- sharded batched beam decode window (the real serving program:
    # U=1 utterance x K=beam rows; cross-KV head-sharded over model) ------
    ck = sds((L, 1, H, hp.n_audio_ctx, dh), bf16,
             P(None, None, "model", None, None))
    prompt_max = hp.n_text_ctx // 2 + 8
    with mesh:
        dec = batch_loop.decode_windows_batch.lower(
            abs_params, hp, consts, ck, ck,
            sds((1, prompt_max), i32), sds((1,), i32),
            sds((), f32), sds((1,), i32), sds((1,), i32),
            sds((1,), jnp.bool_),
            sds((2,), jnp.uint32),
            tids=tids, n_utt=1, n_per_utt=beam,
            strategy=device_loop.BEAM,
            dtype=bf16).compile()
    out["decode_beam%d" % beam] = _report(dec)
    return out


def spec_tp_compile_evidence(tp: int = 2, preset: str = "large-v3",
                             k_spec: int = 8) -> dict:
    """TP x speculative: the latency feature composes with model sharding —
    main model TP-sharded, 2-layer distil-shaped draft replicated (its
    weights are ~4% of the main's; sharding them would add collectives for
    nothing). Per-shard memory must drop for the main weights only."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_tpu.config import FullParams, PRESET_HPARAMS
    from whisper_tpu.decoding import filters
    from whisper_tpu.decoding.speculative import decode_window_speculative
    from whisper_tpu.parallel import mesh as mesh_mod
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = PRESET_HPARAMS[preset]
    hp_d = _dc.replace(hp, n_text_layer=2)
    mesh = mesh_mod.make_mesh(1, tp)
    abs_params = _abs_sharded_params(hp, mesh, tp=tp > 1)
    abs_draft = _abs_sharded_params(hp_d, mesh, tp=False)   # replicated

    vocab = synthetic_vocab(hp.n_vocab)
    consts, tids = filters.build_filter_consts(vocab, hp, FullParams.default())

    def sds(shape, dtype, spec=None):
        return jax.ShapeDtypeStruct(
            shape, dtype,
            sharding=NamedSharding(mesh, spec if spec is not None else P()))

    L, H = hp.n_text_layer, hp.n_text_head
    dh = hp.n_text_state // H
    i32, bf16 = jnp.int32, jnp.bfloat16
    ck = sds((L, 1, H, hp.n_audio_ctx, dh), bf16,
             P(None, None, "model", None, None))
    dck = sds((2, 1, H, hp.n_audio_ctx, dh), bf16)
    prompt_max = hp.n_text_ctx // 2 + 8
    with mesh:
        sdec = decode_window_speculative.lower(
            abs_params, abs_draft, hp, hp_d, consts, ck, ck, dck, dck,
            sds((prompt_max,), i32), sds((), i32),
            sds((), i32), sds((), i32),
            tids=tids, k_spec=k_spec, dtype=bf16).compile()
    return {"tp": tp, "preset": preset, "spec_k": k_spec,
            "decode_speculative": _report(sdec)}


def capacity_tp_compile_evidence(dp: int = 2, tp: int = 2, n_utt: int = 8,
                                 preset: str = "large-v3") -> dict:
    """The POD-SERVING configuration (r4): DP x TP mesh, U utterances
    sharded over 'data', int8-block (q5) weights sharded over 'model',
    int8 self-KV AND cross-KV — i.e. the exact capacity setup from
    bench.py batch_capacity (q5_kv8 rows), partitioned. Per-shard args
    must be ~1/(dp·tp) of the cross-KV plus ~1/tp of the weights."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_tpu.config import (FullParams, PRESET_HPARAMS,
                                    SamplingStrategy)
    from whisper_tpu.checkpoint.init import random_params
    from whisper_tpu.decoding import batch_loop, device_loop, filters
    from whisper_tpu.parallel import mesh as mesh_mod
    from whisper_tpu.tokenizer import synthetic_vocab

    hp = PRESET_HPARAMS[preset]
    mesh = mesh_mod.make_mesh(dp, tp)

    # q5-layout abstract weights (same rule as the real keep_quantized
    # loader layout — shared helper, r4 review)
    from whisper_tpu.checkpoint.quant import abstract_int8_block_shapes
    shapes = jax.eval_shape(
        lambda: jax.tree_util.tree_map(
            jnp.asarray, random_params(hp, seed=0, compute_dtype="bfloat16")))
    q_shapes = abstract_int8_block_shapes(shapes)
    specs = mesh_mod.param_specs(q_shapes, tp=tp > 1, n_model=tp)
    abs_params = jax.tree_util.tree_map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        q_shapes, specs, is_leaf=lambda x: not isinstance(x, dict))

    vocab = synthetic_vocab(hp.n_vocab)
    consts, tids = filters.build_filter_consts(
        vocab, hp, FullParams.default(SamplingStrategy.BEAM_SEARCH))

    def sds(shape, dtype, spec=None):
        return jax.ShapeDtypeStruct(
            shape, dtype,
            sharding=NamedSharding(mesh, spec if spec is not None else P()))

    L, H = hp.n_text_layer, hp.n_text_head
    dh = hp.n_text_state // H
    i32, f32, bf16 = jnp.int32, jnp.float32, jnp.bfloat16
    U = n_utt
    # int8 cross-KV tuples: utterances over data, heads over model
    ck = (sds((L, U, H, hp.n_audio_ctx, dh), jnp.int8,
              P(None, "data", "model", None, None)),
          sds((L, U, H, hp.n_audio_ctx), f32,
              P(None, "data", "model", None)))
    prompt_max = hp.n_text_ctx // 2 + 8
    row = P("data")
    with mesh:
        dec = batch_loop.decode_windows_batch.lower(
            abs_params, hp, consts, ck, ck,
            sds((U, prompt_max), i32, row), sds((U,), i32, row),
            sds((), f32), sds((U,), i32, row), sds((U,), i32, row),
            sds((U,), jnp.bool_, row),
            sds((2,), jnp.uint32),
            tids=tids, n_utt=U, n_per_utt=5,
            strategy=device_loop.BEAM, dtype=bf16,
            kv_quant=True).compile()
    return {"dp": dp, "tp": tp, "n_utt": U, "preset": preset,
            "weights": "q5", "kv": "int8",
            "decode_beam5_capacity": _report(dec)}


def main() -> int:
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    # sitecustomize on relayed-TPU boxes rewrites jax_platforms at import
    # time; virtual-device partitioning evidence must run on CPU
    jax.config.update("jax_platforms", "cpu")
    n = len(jax.devices())
    degrees = [d for d in (1, 2, 4) if d <= n]
    results = [tp_compile_evidence(tp) for tp in degrees]
    if 2 in degrees:
        results.append(spec_tp_compile_evidence(2))
    if n >= 4:
        # the pod-serving capacity config: DP x TP x q5 x int8-KV
        results.append(capacity_tp_compile_evidence(dp=2, tp=2, n_utt=8))
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
