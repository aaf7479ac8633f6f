"""Cross-process distributed execution checks (SURVEY §5.8).

The reference's only networked scale-out path is the ggml-rpc tensor
server (ggml/src/ggml-rpc/ggml-rpc.cpp): tensors stream over TCP to a
remote backend. The TPU-native replacement is jax.distributed — one
process per host, a global ('data','model') Mesh, XLA collectives over
ICI/DCN. This module proves that claim END TO END on CPU device fakes,
running the REAL batched windowed decode
(decoding/batch_loop.decode_windows_batch) in three topologies:

  worker (TP-transposed stress): 2 processes x 2 local devices, MODEL
    axis spanning the process boundary (mesh.make_cross_host_mesh) so
    every tensor-parallel psum crosses processes. Tokens must be
    BIT-IDENTICAL to the single-process (2,2)-mesh run: identical mesh
    shape -> identical GSPMD partitioning -> identical per-device
    reduction order (TP=2 psum is a single commutative fp add), so exact
    equality is valid despite random weights (CLAUDE.md parity rule).

  worker_dp (PRODUCTION topology): same 2x2 processes/devices but the
    default make_mesh layout — TP pairs INTRA-process (ICI in prod), the
    DATA axis crossing processes (DCN in prod; mesh.py:37-47). Same
    bit-exactness argument (same (2,2) program shape as the reference).

  worker_tp4 (TP=4): 4 processes x 1 local device, model axis spanning
    all four. TP=4 psums are multi-operand reductions whose order could
    in principle differ between the gloo cross-process path and the
    single-process backend, so bit-exactness is NOT argued from shape
    alone here; instead the decode runs the DECISIVE config
    (suppress_regex shrinking candidates to a ~400-token set +
    no_timestamps + max_tokens — argmax gaps >> reduction-order ulps)
    and exact TOKEN equality against the single-process (1,4)-mesh run
    is required.

Used by tests/test_distributed.py (pytest lane) and
__graft_entry__.dryrun_multichip (driver lane). Invoked as:

    python -m whisper_tpu.tools.dist_check reference <out.npz>        # (2,2)
    python -m whisper_tpu.tools.dist_check reference4 <out.npz>       # (1,4)
    python -m whisper_tpu.tools.dist_check worker <coordinator> <n_procs> \
        <proc_id> <expected.npz> [tp|dp|tp4]

The reference invocations need XLA_FLAGS=--xla_force_host_platform_device_count=4;
tp/dp workers need ...=2, tp4 workers ...=1. JAX_PLATFORMS=cpu for all.
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


def run_reference(out_path: str, n_data: int = 2, n_model: int = 2) -> None:
    """Single process, >= 4 local devices: run the (n_data, n_model)-mesh
    program and record tokens/result_len as the expectation for the
    cross-process run of the same program shape."""
    import jax

    from whisper_tpu.parallel import mesh as mesh_mod

    assert len(jax.devices()) >= n_data * n_model, "needs 4 virtual devices"
    ctx, consts, tids, mel_batch, seek_end = _setup()
    mesh = mesh_mod.make_mesh(n_data=n_data, n_model=n_model)
    res = _decode_under_mesh(ctx, consts, tids, mel_batch, seek_end, mesh)
    np.savez(out_path,
             tokens=np.asarray(res.tokens),
             result_len=np.asarray(res.result_len))
    print(f"REF_OK tokens={np.asarray(res.tokens).shape}", flush=True)


def _build_mesh(topology: str, n_procs: int):
    """Worker-side mesh for the given topology (module docstring)."""
    from whisper_tpu.parallel import mesh as mesh_mod

    if topology == "tp":
        mesh = mesh_mod.make_cross_host_mesh(n_data=2, n_model=n_procs)
        # every TP pair spans all processes by construction
        for row in mesh.devices:
            assert len({d.process_index for d in row}) == n_procs, mesh.devices
    elif topology == "dp":
        # PRODUCTION layout (mesh.py make_mesh row-major over
        # process-ordered devices): TP pairs intra-process, data axis
        # across processes
        mesh = mesh_mod.make_mesh(n_data=n_procs, n_model=2)
        for row in mesh.devices:            # row = one data index
            assert len({d.process_index for d in row}) == 1, mesh.devices
        procs_per_row = [row[0].process_index for row in mesh.devices]
        assert len(set(procs_per_row)) == n_procs, mesh.devices
    elif topology == "tp4":
        mesh = mesh_mod.make_cross_host_mesh(n_data=1, n_model=n_procs)
        for row in mesh.devices:
            assert len({d.process_index for d in row}) == n_procs, mesh.devices
    else:
        raise SystemExit(f"unknown topology {topology!r}")
    return mesh


def run_worker(coordinator: str, n_procs: int, proc_id: int,
               expected_npz: str, topology: str = "tp") -> None:
    """One process of the cross-process run: every locally-addressable
    output shard must equal the single-process reference (bit-for-bit —
    see the module docstring for why that is valid per topology)."""
    from whisper_tpu.parallel import distributed

    info = distributed.init_distributed(
        coordinator_address=coordinator, num_processes=n_procs,
        process_id=proc_id)
    assert info["process_count"] == n_procs, info

    ctx, consts, tids, mel_batch, seek_end = _setup()
    mesh = _build_mesh(topology, n_procs)
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
    print(f"TP_DIST_OK topology={topology} proc={proc_id} "
          f"shards_checked={checked}", flush=True)


def main(argv):
    mode = argv[0]
    if mode == "reference":
        run_reference(argv[1])
    elif mode == "reference4":
        run_reference(argv[1], n_data=1, n_model=4)
    elif mode == "worker":
        topology = argv[5] if len(argv) > 5 else "tp"
        run_worker(argv[1], int(argv[2]), int(argv[3]), argv[4], topology)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    import os

    # honor CPU forcing under the relay sitecustomize
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(sys.argv[1:])
