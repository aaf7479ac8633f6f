"""Worker for tests/test_distributed.py — one process of a 2-process
jax.distributed CPU run (SURVEY.md §4 implication (e): multi-host tests via
CPU device fakes).

Each process owns 2 virtual CPU devices (4 global). Both processes build
the SAME random model and the SAME 4-utterance batch, shard the mel batch
over a global ('data',) mesh, run one batched encode + windowed decode
(decoding/batch_loop.py), and compare the tokens of every locally-
addressable row against a single-process (unsharded) decode of the same
rows. Prints DIST_OK on success.

Invoked: python _distributed_worker.py <coordinator> <n_procs> <proc_id>
"""

import os
import sys

coordinator, n_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import whisper_tpu as wt  # noqa: E402
from whisper_tpu.checkpoint.init import tiny_test_hparams  # noqa: E402
from whisper_tpu.config import ContextParams, FullParams  # noqa: E402
from whisper_tpu.decoding import batch_loop, device_loop, filters  # noqa: E402
from whisper_tpu.models.whisper import KVCache  # noqa: E402
from whisper_tpu.parallel import distributed  # noqa: E402


def main():
    info = distributed.init_distributed(
        coordinator_address=coordinator, num_processes=n_procs,
        process_id=proc_id)
    assert info["process_count"] == n_procs, info
    assert info["global_devices"] == 2 * n_procs, info
    assert distributed.host_count() == n_procs

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    ctx = wt.WhisperContext.random(
        hp=tiny_test_hparams(), params=ContextParams(dtype="float32"), seed=3)
    hp = ctx.hparams

    # decisive config (CLAUDE.md): shrink candidates so argmax is robust to
    # program-shape reduction-order noise
    p = FullParams.default()
    p.no_timestamps = True
    p.max_tokens = 8
    p.suppress_regex = r"<syn\d\d\d+>"
    consts, tids = filters.build_filter_consts(ctx.vocab, hp, p)

    U = 4
    rng = np.random.default_rng(7)
    audios = [(0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
              for _ in range(U)]
    sts = [ctx.create_state() for _ in range(U)]
    for st, a in zip(sts, audios):
        st.pcm_to_mel(a)
    mel_batch = np.stack([np.asarray(st.mel_window(0)[0]) for st in sts])

    def run(mesh=None):
        from whisper_tpu.api import _cross_kv_jit, _encode_jit
        if mesh is not None:
            sh = NamedSharding(mesh, P("data"))
            mel = jax.make_array_from_callback(
                mel_batch.shape, sh, lambda idx: mel_batch[idx])
        else:
            mel = jnp.asarray(mel_batch)
        embed = _encode_jit(ctx.params, hp, mel, ctx.dtype, False)
        ck, cv = _cross_kv_jit(ctx.params, hp, embed)
        prompts = np.zeros((U, hp.n_text_ctx // 2 + 8), np.int32)
        prompts[:, 0] = ctx.vocab.token_sot
        seek_end = np.array([st.n_len_org for st in sts], np.int32)
        res = batch_loop.decode_windows_batch(
            ctx.params, hp, consts, ck, cv,
            jnp.asarray(prompts), jnp.ones(U, jnp.int32),
            jnp.float32(0.0), jnp.zeros(U, jnp.int32), jnp.asarray(seek_end),
            jnp.ones(U, bool), jax.random.PRNGKey(0),
            tids=tids, n_utt=U, n_per_utt=1,
            strategy=device_loop.GREEDY_BEST,
            max_tokens=p.max_tokens, no_timestamps=True, dtype=ctx.dtype)
        return res

    # single-process reference on this host's local devices (unsharded)
    ref = jax.tree_util.tree_map(np.asarray, run(mesh=None))

    mesh = Mesh(np.asarray(jax.devices()), ("data",))  # 4 global devices
    got = run(mesh=mesh)

    # compare every locally-addressable row with the unsharded reference
    checked = 0
    for shard in got.tokens.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      ref.tokens[rows])
        checked += np.asarray(shard.data).shape[0]
    for shard in got.result_len.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      ref.result_len[rows])
    assert checked >= U // n_procs, f"checked only {checked} rows"

    # DP x TP across hosts: 2-way tensor parallel over the 'model' axis
    # (Megatron specs from parallel/mesh.py; psum collectives cross the
    # process boundary), 2-way data parallel. Structural equality only is
    # asserted for tokens: TP reductions reorder sums, and on a random
    # near-uniform model an ulp can flip an argmax — result_len/completion
    # shapes still must match row counts.
    from whisper_tpu.parallel import mesh as mesh_mod
    mesh2 = mesh_mod.make_mesh(n_data=2, n_model=2)
    tp_params = mesh_mod.shard_params(ctx.params, mesh2, tp=True)
    saved = ctx.params
    try:
        ctx.params = tp_params
        with mesh2:
            got_tp = run(mesh=None)
        assert got_tp.tokens.shape == ref.tokens.shape
        assert int(got_tp.n_tokens) > 0
    finally:
        ctx.params = saved

    print(f"DIST_OK proc={proc_id} rows_checked={checked}", flush=True)


if __name__ == "__main__":
    main()
