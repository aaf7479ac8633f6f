"""Numerical parity against torch transformers' Whisper.

The strongest correctness evidence available without real weights: a
randomly initialized HF WhisperForConditionalGeneration is converted
through our ggml writer/loader pipeline, and the JAX encoder/decoder must
reproduce torch's outputs. This validates conv padding, pre-LN placement,
attention scaling, causal masking, and the converter's name/layout mapping
in one shot (SURVEY.md §7 hard parts)."""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from whisper_tpu.checkpoint import convert_hf, ggml_io, loader
from whisper_tpu.models import whisper as jmodel


@pytest.fixture(scope="module")
def hf_and_ours(tmp_path_factory):
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
    )
    hf = WhisperForConditionalGeneration(cfg).eval()

    path = str(tmp_path_factory.mktemp("conv") / "model.bin")
    convert_hf.convert_hf_to_ggml(hf, path, ftype=1)  # f16
    ours = loader.load_model(path, compute_dtype="float32")
    return hf, ours


def test_converted_checkpoint_loads(hf_and_ours):
    hf, ours = hf_and_ours
    assert ours.hparams.n_audio_layer == 2
    assert ours.hparams.n_vocab == 51865
    assert ours.params, "pytree empty — converter/loader name mismatch"
    assert ours.vocab.is_multilingual


def test_encoder_parity(hf_and_ours):
    hf, ours = hf_and_ours
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5

    with torch.no_grad():
        want = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()

    import jax
    params = jax.tree_util.tree_map(jnp.asarray, ours.params)
    got = np.asarray(jmodel.encoder_forward(params, ours.hparams,
                                            jnp.asarray(mel), jnp.float32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_decoder_logits_parity(hf_and_ours):
    hf, ours = hf_and_ours
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    toks = np.array([[50258, 50259, 50359, 123, 456]], np.int64)

    with torch.no_grad():
        want = hf(input_features=torch.from_numpy(mel),
                  decoder_input_ids=torch.from_numpy(toks)).logits.numpy()

    params = jax.tree_util.tree_map(jnp.asarray, ours.params)
    hp = ours.hparams
    embed = jmodel.encoder_forward(params, hp, jnp.asarray(mel), jnp.float32)
    ck, cv = jmodel.cross_attention_kv(params, hp, embed)
    kv = jmodel.KVCache.zeros(hp, 1, jnp.float32)
    logits, _, _ = jmodel.decoder_forward(
        params, hp, jnp.asarray(toks.astype(np.int32)), jnp.int32(0),
        kv, ck, cv, jnp.float32)
    got = np.asarray(logits)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_incremental_decode_matches_torch(hf_and_ours):
    """KV-cached token-by-token decode equals torch full-context logits."""
    hf, ours = hf_and_ours
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    toks = np.array([[50258, 50259, 50359, 777]], np.int64)

    with torch.no_grad():
        want = hf(input_features=torch.from_numpy(mel),
                  decoder_input_ids=torch.from_numpy(toks)).logits.numpy()

    params = jax.tree_util.tree_map(jnp.asarray, ours.params)
    hp = ours.hparams
    embed = jmodel.encoder_forward(params, hp, jnp.asarray(mel), jnp.float32)
    ck, cv = jmodel.cross_attention_kv(params, hp, embed)
    kv = jmodel.KVCache.zeros(hp, 1, jnp.float32)
    outs = []
    for i in range(toks.shape[1]):
        lg, kv, _ = jmodel.decoder_forward(
            params, hp, jnp.asarray(toks[:, i : i + 1].astype(np.int32)),
            jnp.int32(i), kv, ck, cv, jnp.float32)
        outs.append(np.asarray(lg[:, 0]))
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_export_pt_roundtrip(hf_and_ours, tmp_path):
    """HF -> ggml -> export_pt must reproduce the original state dict
    (reference models/ggml_to_pt.py, inverse of convert-h5-to-ggml)."""
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from whisper_tpu.checkpoint import export_pt

    hf, ours = hf_and_ours
    # rebuild the .bin from the fixture's hf model
    path = str(tmp_path / "m.bin")
    convert_hf.convert_hf_to_ggml(hf, path, ftype=1)

    sd_np, hp = export_pt.export_hf_state_dict(path)
    assert hp.n_audio_layer == 2
    orig = hf.state_dict()
    assert set(sd_np) <= set(orig)
    checked = 0
    for name, arr in sd_np.items():
        ref = orig[name].detach().numpy()
        assert arr.shape == ref.shape, name
        np.testing.assert_allclose(arr, ref, atol=2e-3, rtol=1e-2,
                                   err_msg=name)   # f16 quantization
        checked += 1
    assert checked > 30

    # the exported dict loads back into a fresh HF model
    model2 = WhisperForConditionalGeneration(WhisperConfig(**hf.config.to_dict())).eval()
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
    missing, unexpected = model2.load_state_dict(sd_t, strict=False)
    assert not unexpected
    # only the tied proj_out and the (buffer-like) position tables may be absent
    assert all("proj_out" in m or "embed_positions" in m for m in missing)

    # CLI writer
    rc = export_pt.main([path, str(tmp_path / "out")])
    assert rc == 0
    blob = torch.load(str(tmp_path / "out" / "torch-model.pt"), weights_only=False)
    assert "state_dict" in blob and blob["dims"]["n_text_layer"] == 2
