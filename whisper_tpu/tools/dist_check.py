"""Cross-process tensor-parallel execution check (SURVEY §5.8).

The reference's only networked scale-out path is the ggml-rpc tensor
server (ggml/src/ggml-rpc/ggml-rpc.cpp): tensors stream over TCP to a
remote backend. The TPU-native replacement is jax.distributed — one
process per host, a global ('data','model') Mesh, XLA collectives over
ICI/DCN. This module proves that claim END TO END on CPU device fakes:
two processes x two local devices form a mesh whose MODEL axis spans the
process boundary (parallel/mesh.make_cross_host_mesh), so every
tensor-parallel psum in the encoder/decoder crosses processes. The real
batched windowed decode (decoding/batch_loop.decode_windows_batch) runs
under that mesh and must produce BIT-IDENTICAL tokens to a
single-process run of the same-shape (2,2) mesh program: identical mesh
shape -> identical GSPMD partitioning -> identical per-device reduction
order (TP=2 psum is a single commutative fp add), so exact equality is
valid here despite the random weights (CLAUDE.md parity rule: compare
within one program shape).

Used by tests/test_distributed.py (pytest lane) and
__graft_entry__.dryrun_multichip (driver lane). Invoked as:

    python -m whisper_tpu.tools.dist_check reference <out.npz>
    python -m whisper_tpu.tools.dist_check worker <coordinator> <n_procs> \
        <proc_id> <expected.npz>

The reference invocation needs XLA_FLAGS=--xla_force_host_platform_device_count=4;
each worker needs ...=2. JAX_PLATFORMS=cpu for both.
"""

from __future__ import annotations

import sys

import numpy as np

N_UTT = 4
MAX_TOKENS = 8


def _setup():
    """Deterministic tiny model + decisive decode config + mel batch,
    identical in every process (seeded)."""
    import jax.numpy as jnp

    import whisper_tpu as wt
    from whisper_tpu.checkpoint.init import tiny_test_hparams
    from whisper_tpu.config import ContextParams, FullParams
    from whisper_tpu.decoding import filters

    ctx = wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"), seed=3)
    hp = ctx.hparams

    # decisive config (CLAUDE.md): shrink candidates so argmax is robust
    p = FullParams.default()
    p.no_timestamps = True
    p.max_tokens = MAX_TOKENS
    p.suppress_regex = r"<syn\d\d\d+>"
    consts, tids = filters.build_filter_consts(ctx.vocab, hp, p)

    rng = np.random.default_rng(7)
    audios = [(0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
              for _ in range(N_UTT)]
    sts = [ctx.create_state() for _ in range(N_UTT)]
    for st, a in zip(sts, audios):
        st.pcm_to_mel(a)
    mel_batch = np.stack([np.asarray(st.mel_window(0)[0]) for st in sts])
    seek_end = np.array([st.n_len_org for st in sts], np.int32)
    return ctx, consts, tids, mel_batch, seek_end


def _decode_under_mesh(ctx, consts, tids, mel_batch, seek_end, mesh):
    """Encode + batched windowed decode with params TP-sharded and the
    utterance batch DP-sharded over `mesh` (shape ('data','model'))."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_tpu.api import _cross_kv_jit, _encode_jit
    from whisper_tpu.decoding import batch_loop, device_loop
    from whisper_tpu.parallel import mesh as mesh_mod

    hp = ctx.hparams
    # host numpy -> global arrays (works for cross-process meshes too:
    # every process holds the full host copy and contributes its shards)
    params_np = jax.tree_util.tree_map(np.asarray, ctx.params)
    params = mesh_mod.shard_params(params_np, mesh, tp=True)
    sh = NamedSharding(mesh, P("data"))
    mel = jax.make_array_from_callback(
        mel_batch.shape, sh, lambda idx: mel_batch[idx])

    prompts = np.zeros((N_UTT, hp.n_text_ctx // 2 + 8), np.int32)
    prompts[:, 0] = ctx.vocab.token_sot

    with mesh:
        embed = _encode_jit(params, hp, mel, ctx.dtype, False)
        ck, cv = _cross_kv_jit(params, hp, embed)
        res = batch_loop.decode_windows_batch(
            params, hp, consts, ck, cv,
            jnp.asarray(prompts), jnp.ones(N_UTT, jnp.int32),
            jnp.float32(0.0), jnp.zeros(N_UTT, jnp.int32),
            jnp.asarray(seek_end), jnp.ones(N_UTT, bool),
            jax.random.PRNGKey(0),
            tids=tids, n_utt=N_UTT, n_per_utt=1,
            strategy=device_loop.GREEDY_BEST,
            max_tokens=MAX_TOKENS, no_timestamps=True, dtype=ctx.dtype)
        jax.block_until_ready(res.tokens)
    return res


def run_reference(out_path: str) -> None:
    """Single process, >= 4 local devices: run the (2,2)-mesh program and
    record tokens/result_len as the bit-exact expectation for the
    cross-process run of the same program shape."""
    import jax

    from whisper_tpu.parallel import mesh as mesh_mod

    assert len(jax.devices()) >= 4, "needs 4 virtual devices"
    ctx, consts, tids, mel_batch, seek_end = _setup()
    mesh = mesh_mod.make_mesh(n_data=2, n_model=2)
    res = _decode_under_mesh(ctx, consts, tids, mel_batch, seek_end, mesh)
    np.savez(out_path,
             tokens=np.asarray(res.tokens),
             result_len=np.asarray(res.result_len))
    print(f"REF_OK tokens={np.asarray(res.tokens).shape}", flush=True)


def run_worker(coordinator: str, n_procs: int, proc_id: int,
               expected_npz: str) -> None:
    """One process of the cross-process run: model axis spans processes,
    every locally-addressable output shard must equal the single-process
    reference bit-for-bit."""
    from whisper_tpu.parallel import distributed
    from whisper_tpu.parallel import mesh as mesh_mod

    info = distributed.init_distributed(
        coordinator_address=coordinator, num_processes=n_procs,
        process_id=proc_id)
    assert info["process_count"] == n_procs, info

    ctx, consts, tids, mel_batch, seek_end = _setup()
    mesh = mesh_mod.make_cross_host_mesh(n_data=2, n_model=n_procs)
    # every TP pair spans both processes by construction
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == n_procs, mesh.devices
    res = _decode_under_mesh(ctx, consts, tids, mel_batch, seek_end, mesh)

    exp = np.load(expected_npz)
    checked = 0
    for name, got in (("tokens", res.tokens), ("result_len", res.result_len)):
        for shard in got.addressable_shards:
            np.testing.assert_array_equal(
                np.asarray(shard.data), exp[name][shard.index],
                err_msg=f"{name} shard {shard.index} proc {proc_id}")
            checked += 1
    assert checked > 0
    print(f"TP_DIST_OK proc={proc_id} shards_checked={checked}", flush=True)


def main(argv):
    mode = argv[0]
    if mode == "reference":
        run_reference(argv[1])
    elif mode == "worker":
        run_worker(argv[1], int(argv[2]), int(argv[3]), argv[4])
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    import os

    # honor CPU forcing under the relay sitecustomize
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(sys.argv[1:])
