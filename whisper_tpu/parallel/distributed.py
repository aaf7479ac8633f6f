"""Multi-host initialization + batch sharding helpers.

reference: the ONLY networked path in whisper.cpp is the ggml-rpc tensor
server (SURVEY.md §5.8); the TPU-native story is jax.distributed — ICI
collectives within a pod slice, DCN across slices. One process per host,
each seeing its local chips; GSPMD shards the global batch.

Typical pod-slice serving run (per host):

    from whisper_tpu.parallel import distributed, mesh
    distributed.init_distributed()            # env-driven on TPU pods
    m = mesh.make_mesh(n_data=jax.device_count() // TP, n_model=TP)
    params = mesh.shard_params(model.params, m)
    results = ctx.full_batch(p, my_host_audios, mesh=m)
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto_detect: bool = False,
) -> dict:
    """Initialize jax.distributed for a multi-host run.

    Supply the three parameters for manual CPU/GPU bring-up, or set
    auto_detect=True on a TPU pod to let jax.distributed.initialize()
    discover the topology from the TPU metadata environment (the bare
    no-argument form — do not use on single-host dev boxes, where it
    blocks looking for a coordinator). Returns a summary dict
    (process_index, process_count, device counts)."""
    # NB: probe initialization state WITHOUT jax.process_count() — that
    # would initialize the XLA backend and make jax.distributed.initialize
    # itself fail ("must be called before any JAX calls")
    already = jax.distributed.is_initialized()
    if not already and (auto_detect
                        or coordinator_address or num_processes
                        or process_id is not None
                        or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        if auto_detect and coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded utterance batch (each host
    feeds its own audio; GSPMD stitches the global array). Remainder
    utterances go one-each to the first `global_batch % P` hosts, so every
    input is assigned exactly once (a plain floor division silently
    dropped the tail — r3 review)."""
    p = max(1, jax.process_count())
    i = jax.process_index()
    per, rem = divmod(global_batch, p)
    start = i * per + min(i, rem)
    return slice(start, start + per + (1 if i < rem else 0))


def host_count() -> int:
    return jax.process_count()
