"""Device mesh + sharding specs for multi-chip execution.

The reference's entire scale-out story is POSIX threads plus an optional
TCP tensor-RPC backend (SURVEY.md §2.7, §5.8). The TPU-native design
replaces it with a 2-D `jax.sharding.Mesh`:

  axis "data"  — utterance/window batch data-parallelism
                 (replaces whisper_full_parallel, src/whisper.cpp:7736-7864)
  axis "model" — tensor-parallel weight sharding over ICI for models that
                 exceed one chip's HBM (large-v3), Megatron-style:
                 QKV/mlp_0 sharded on the output feature axis (= heads),
                 out-proj/mlp_2 on the input axis; XLA inserts the psum.

Shardings are expressed as PartitionSpecs per parameter pytree leaf and
applied with jax.device_put + NamedSharding; jit/GSPMD propagates them
through the computation and places collectives on ICI.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def make_cross_host_mesh(n_data: int = 1, n_model: int = 1) -> Mesh:
    """Mesh whose MODEL axis spans process (host) boundaries, so every
    tensor-parallel collective crosses the inter-host link.

    make_mesh() reshapes jax.devices() row-major, which on a multi-process
    run places each TP pair WITHIN one process (devices are ordered by
    process); good for production (TP rides ICI, DP rides DCN) but useless
    for proving that TP collectives actually work across processes. Here
    the grid is transposed: column j = process j, row i = that process's
    i-th local device. Requires n_model == process_count and
    n_data == local device count."""
    import jax

    by_proc: Dict[int, list] = {}
    for d in sorted(jax.devices(), key=lambda d: (d.process_index, d.id)):
        by_proc.setdefault(d.process_index, []).append(d)
    procs = sorted(by_proc)
    if len(procs) != n_model:
        raise ValueError(
            f"need n_model == process_count ({len(procs)}), got {n_model}")
    if any(len(by_proc[p]) < n_data for p in procs):
        raise ValueError(f"need {n_data} local devices per process")
    grid = np.empty((n_data, n_model), dtype=object)
    for j, p in enumerate(procs):
        for i in range(n_data):
            grid[i, j] = by_proc[p][i]
    return Mesh(grid, ("data", "model"))


# linear roles: True = output-feature (head) sharded, False = input sharded
_BLOCK_ROLES = {
    "attn_q": True, "attn_k": True, "attn_v": True, "attn_out": False,
    "mlp_0": True, "mlp_2": False,
    "cross_q": True, "cross_k": True, "cross_v": True, "cross_out": False,
}
_LN_SPEC = {"scale": P(None, None), "bias": P(None, None)}


def _lin_spec(leaf: Dict[str, Any], out_sharded: bool, m) -> Dict[str, Any]:
    """Specs for one (stacked) linear leaf dict. Handles both the bf16
    layout {w:(L,in,out), b:(L,out)} and the keep-quantized layout
    {q:(L,in,out) int8, d/m:(L,in/bs,out) f32}: q/d/m shard exactly like
    w — the per-block scale/offset axis follows the `in` axis."""
    wspec = P(None, None, m) if out_sharded else P(None, m, None)
    spec: Dict[str, Any] = {}
    for k in leaf:
        if k in ("w", "q", "d", "m"):
            spec[k] = wspec
        elif k == "b":
            spec[k] = P(None, m) if out_sharded else P(None, None)
    return spec


def _blocks_specs(blocks: Dict[str, Any], tp: bool) -> Dict[str, Any]:
    m = "model" if tp else None
    out: Dict[str, Any] = {}
    for name, leaf in blocks.items():
        if name.endswith("_ln"):
            out[name] = _LN_SPEC
        else:
            out[name] = _lin_spec(leaf, _BLOCK_ROLES[name], m)
    return out


def param_specs(params: Dict[str, Any], tp: bool = True,
                n_model: int = 0) -> Dict[str, Any]:
    """PartitionSpec pytree matching checkpoint/loader.py's layout
    (built from the actual params so bf16 and keep-quantized layouts both
    shard correctly). Pass n_model to replicate the token embedding when
    the vocab (51865/51866 — both 2x prime) doesn't divide the TP degree;
    every other sharded axis is a multiple of d (>= 64-divisible)."""
    m = "model" if tp else None
    vocab_rows = params["decoder"]["token_embed"].shape[0]
    emb_m = m if (not n_model or vocab_rows % n_model == 0) else None
    enc_blocks = _blocks_specs(params["encoder"]["blocks"], tp)
    dec_blocks = _blocks_specs(params["decoder"]["blocks"], tp)
    return {
        "encoder": {
            "pos_embed": P(None, None),
            "conv1": {"w": P(None, None, m), "b": P(m)},
            "conv2": {"w": P(None, None, m), "b": P(m)},
            "ln_post": {"scale": P(None), "bias": P(None)},
            "blocks": enc_blocks,
        },
        "decoder": {
            "pos_embed": P(None, None),
            # vocab-dim sharding: the logits matmul all-gathers over model
            # (replicated instead when vocab %% TP != 0, e.g. TP=4)
            "token_embed": P(emb_m, None),
            "ln": {"scale": P(None), "bias": P(None)},
            "blocks": dec_blocks,
        },
    }


def shard_params(params: Dict[str, Any], mesh: Mesh, tp: bool = True) -> Dict[str, Any]:
    """Place the parameter pytree on the mesh with TP shardings."""
    specs = param_specs(params, tp=tp and mesh.shape["model"] > 1,
                        n_model=mesh.shape["model"])
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading utterance/window batch axis over "data"."""
    return NamedSharding(mesh, P("data"))


def kv_sharding(mesh: Mesh) -> NamedSharding:
    """KV caches (L, B, H, T, Dh): batch over data, heads over model."""
    return NamedSharding(mesh, P(None, "data", "model", None, None))


def kv_scale_sharding(mesh: Mesh) -> NamedSharding:
    """Int8-cache scale arrays (L, B, H, T): follow the codes' layout
    (models/whisper.py KVCache ks/vs)."""
    return NamedSharding(mesh, P(None, "data", "model", None))
