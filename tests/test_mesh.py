"""Mesh sharding tests: TP-sharded weights must produce the same outputs
as the unsharded model (GSPMD inserts psums over 'model'), and the
keep-quantized layout must carry PartitionSpecs too.

The reference has no tensor parallelism (SURVEY.md §2.7) — this validates
the TPU-native replacement for its multi-backend weight placement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_tpu.checkpoint.init import random_model
from whisper_tpu.config import WhisperHParams
from whisper_tpu.models import whisper as model_mod
from whisper_tpu.models.whisper import KVCache
from whisper_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def tp_model():
    hp = WhisperHParams(
        n_vocab=51864, n_audio_ctx=32, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_text_ctx=32, n_text_state=64, n_text_head=4,
        n_text_layer=2, n_mels=80,
    )
    return random_model(hp=hp, compute_dtype="float32")


def _forward(params, hp, mel, tokens, kv):
    embed = model_mod.encoder_forward(params, hp, mel, jnp.float32)
    ck, cv = model_mod.cross_attention_kv(params, hp, embed)
    logits, kv2, _ = model_mod.decoder_forward(
        params, hp, tokens, jnp.int32(0), kv, ck, cv, jnp.float32)
    return logits


def test_tp_matches_unsharded(tp_model):
    """2-way tensor parallel == single-device outputs (f32, tight atol)."""
    hp = tp_model.hparams
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, hp.n_mels, 2 * hp.n_audio_ctx)).astype(np.float32)
    tokens = np.array([[50258], [50258]], np.int32)

    params0 = jax.tree_util.tree_map(jnp.asarray, tp_model.params)
    kv0 = KVCache.zeros(hp, 2, jnp.float32, size=hp.n_text_ctx)
    ref = np.asarray(jax.jit(_forward, static_argnames="hp")(
        params0, hp, mel, tokens, kv0))

    mesh = mesh_mod.make_mesh(n_data=2, n_model=2)
    params = mesh_mod.shard_params(tp_model.params, mesh, tp=True)
    mel_s = jax.device_put(mel, NamedSharding(mesh, P("data")))
    tok_s = jax.device_put(tokens, NamedSharding(mesh, P("data")))
    kv = KVCache(jax.device_put(kv0.k, mesh_mod.kv_sharding(mesh)),
                 jax.device_put(kv0.v, mesh_mod.kv_sharding(mesh)))
    with mesh:
        out = np.asarray(jax.jit(_forward, static_argnames="hp")(
            params, hp, mel_s, tok_s, kv))

    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_param_specs_cover_quantized_layout(tp_model):
    """{q, d} leaves get the same feature-axis sharding as w (int8 TP)."""
    params = jax.tree_util.tree_map(lambda x: x, tp_model.params)
    blk = params["decoder"]["blocks"]
    w = blk["mlp_0"].pop("w")
    # fake int8-block layout: q (L, in, out) int8, d (L, in/32, out) f32
    blk["mlp_0"]["q"] = np.zeros(w.shape, np.int8)
    blk["mlp_0"]["d"] = np.zeros((w.shape[0], w.shape[1] // 32, w.shape[2]),
                                 np.float32)
    # offset formats (q4_1/q5_1/q2_K/q4_K/q5_K) add an "m" leaf — same spec
    blk["mlp_0"]["m"] = np.zeros_like(blk["mlp_0"]["d"])
    specs = mesh_mod.param_specs(params, tp=True)
    s = specs["decoder"]["blocks"]["mlp_0"]
    assert s["q"] == P(None, None, "model")
    assert s["d"] == P(None, None, "model")
    assert s["m"] == P(None, None, "model")
    assert s["b"] == P(None, "model")
    # input-sharded role
    assert specs["decoder"]["blocks"]["mlp_2"]["w"] == P(None, "model", None)

    mesh = mesh_mod.make_mesh(n_data=2, n_model=2)
    sharded = mesh_mod.shard_params(params, mesh, tp=True)  # must not raise
    assert sharded["decoder"]["blocks"]["mlp_0"]["q"].sharding.spec == \
        P(None, None, "model")


def test_tp_evidence_sharded_compile_tiny():
    """tp_evidence's sharded AOT pipeline (fast variant at tiny dims; the
    large-v3 run is tools/tp_evidence.py -> MULTICHIP_TP_r03.json):
    TP=2 must halve per-shard argument bytes and insert collectives."""
    from whisper_tpu.tools.tp_evidence import tp_compile_evidence

    r1 = tp_compile_evidence(1, preset="tiny", beam=2)
    r2 = tp_compile_evidence(2, preset="tiny", beam=2)
    for phase in ("encoder", "decode_beam2"):
        a1, a2 = r1[phase]["args_gb"], r2[phase]["args_gb"]
        assert a2 < 0.7 * a1, (phase, a1, a2)
        assert not r1[phase]["collectives"], r1[phase]
        assert r2[phase]["collectives"].get("all-reduce", 0) > 0, r2[phase]
