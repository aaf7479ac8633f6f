"""Native (orbax) checkpoint cache — fast repeat loads.

SURVEY.md §5.4 calls for a ggml.bin -> orbax/pytree converter: the first
load parses + dequantizes the .bin (seconds for large-v3 even with the C++
runtime); subsequent loads restore the ready pytree via orbax in a fraction
of that. Sharding-on-load composes: restore then `parallel.mesh.shard_params`.

Layout on disk:
  <cache_dir>/
    meta.json            hparams + vocab + filters (small host data)
    params/              orbax checkpoint of the parameter pytree
"""

from __future__ import annotations

import base64
import json
import os
from typing import Optional

import numpy as np

from whisper_tpu.checkpoint.loader import LoadedModel
from whisper_tpu.config import WhisperHParams
from whisper_tpu.tokenizer import WhisperVocab


def _source_stamp(path: str) -> Optional[dict]:
    """Identity of the source .bin: size + mtime_ns. A replaced or
    re-quantized checkpoint at the same path must invalidate the cache
    (r4 review: stale weights served silently otherwise)."""
    try:
        st = os.stat(path)
        return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}
    except OSError:
        return None


def save_native(model: LoadedModel, cache_dir: str,
                source_path: Optional[str] = None) -> None:
    import orbax.checkpoint as ocp

    os.makedirs(cache_dir, exist_ok=True)
    meta = {
        "hparams": model.hparams.__dict__,
        "n_loaded": model.n_loaded,
        "mel_filters_shape": list(model.mel_filters.shape),
        "vocab": [base64.b64encode(t).decode("ascii")
                  for t in model.vocab.id_to_token[: min(model.hparams.n_vocab, 50364)]],
    }
    if source_path is not None:
        meta["source"] = _source_stamp(source_path)
    with open(os.path.join(cache_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    model.mel_filters.astype(np.float32).tofile(
        os.path.join(cache_dir, "mel_filters.f32"))

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(cache_dir, "params")), model.params)
    ckptr.wait_until_finished()


def load_native(cache_dir: str,
                source_path: Optional[str] = None) -> Optional[LoadedModel]:
    """Restore a cached model; None if the cache is absent/incomplete or
    (when source_path is given) stale vs the source .bin."""
    meta_path = os.path.join(cache_dir, "meta.json")
    filters_path = os.path.join(cache_dir, "mel_filters.f32")
    params_path = os.path.abspath(os.path.join(cache_dir, "params"))
    if not (os.path.exists(meta_path) and os.path.exists(filters_path)
            and os.path.isdir(params_path)):
        return None
    import orbax.checkpoint as ocp

    with open(meta_path) as f:
        meta = json.load(f)
    if source_path is not None:
        # caches written before the stamp existed (no "source" key) are
        # treated as stale too — re-converting once is cheap and safe
        if meta.get("source") != _source_stamp(source_path):
            return None
    hp = WhisperHParams(**meta["hparams"])
    filters = np.fromfile(filters_path,
                          dtype=np.float32).reshape(meta["mel_filters_shape"])
    tokens = [base64.b64decode(t) for t in meta["vocab"]]

    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(params_path)
    return LoadedModel(
        hparams=hp, params=params, mel_filters=filters,
        vocab=WhisperVocab(hp.n_vocab, tokens), n_loaded=meta["n_loaded"])


def load_model_cached(path: str, compute_dtype: str = "bfloat16",
                      keep_quantized: bool = False,
                      cache_dir: Optional[str] = None) -> LoadedModel:
    """load_model with an orbax-backed cache next to the .bin."""
    from whisper_tpu.checkpoint.loader import load_model

    if cache_dir is None:
        cache_dir = path + f".native-{compute_dtype}" + \
            ("-q" if keep_quantized else "")
    cached = load_native(cache_dir, source_path=path)
    if cached is not None:
        return cached
    model = load_model(path, compute_dtype, keep_quantized)
    if model.params:
        try:
            save_native(model, cache_dir, source_path=path)
        except Exception:
            pass  # cache is best-effort
    return model
