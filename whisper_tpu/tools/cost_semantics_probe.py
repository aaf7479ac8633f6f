"""Measure XLA:TPU HloCostAnalysis semantics with controlled programs.

Three questions decide how `cost_analysis()["bytes accessed"]` may be
read (tools/hbm_audit.py builds on the answers; see PERF.md "Reconciling
the cost model"):

  1. Are loop bodies multiplied by trip count?  -> NO (bytes identical
     for 2 vs 20 chained matmuls in fori/scan/while).
  2. Is an in-place dynamic-update-slice counted at the full buffer?
     -> YES: an 8-step loop DUS-updating a 512 MB carry counts ~1.09 GB
     while its memory analysis allocates ZERO temp bytes (the argument
     buffer is updated in place; the accounting is not).
  3. Does `conditional` sum all branches? -> NO (one branch).

Run:  python -m whisper_tpu.tools.cost_semantics_probe
Pure AOT compile + analysis — safe on the axon relay (no execution).
"""

from __future__ import annotations

import json


def probe() -> dict:
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = 1024
    x0 = jax.ShapeDtypeStruct((N, N), jnp.bfloat16)

    def cost(f, *args):
        c = jax.jit(f).lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        m = c.memory_analysis()
        return {"bytes_mb": round(ca.get("bytes accessed", 0) / 1e6, 1),
                "gflops": round(ca.get("flops", 0) / 1e9, 1),
                "temp_mb": round(m.temp_size_in_bytes / 1e6, 1)}

    def loop(n):
        def f(a):
            return lax.fori_loop(
                0, n, lambda i, a: (a @ a * 0.01).astype(a.dtype), a)
        return f

    BIG = jax.ShapeDtypeStruct((256, N, N), jnp.bfloat16)   # 512 MB

    def dusf(buf):
        def body(i, c):
            buf, a = c
            a = (a @ a * 0.01).astype(a.dtype)
            buf = lax.dynamic_update_index_in_dim(buf, a, i, 0)
            return buf, a
        return lax.fori_loop(0, 8, body, (buf, buf[0]))

    def condf(a, p):
        return lax.cond(p, lambda a: (a @ a * 0.01).astype(a.dtype),
                        lambda a: a * 2.0, a)

    return {
        "fori_n2": cost(loop(2), x0),
        "fori_n20": cost(loop(20), x0),
        "dus_512mb_carry": cost(dusf, BIG),
        "cond_matmul_or_mul": cost(
            condf, x0, jax.ShapeDtypeStruct((), jnp.bool_)),
        "reading": ("n2 == n20 -> bodies count once; dus bytes ~2x buffer "
                    "with temp ~1x buffer -> DUS counted full but aliased "
                    "in place; cond bytes ~ one matmul -> single branch"),
    }


if __name__ == "__main__":
    print(json.dumps(probe(), indent=1))
