"""Roofline micro-benchmarks: HBM copy bandwidth + matmul throughput.

TPU analogue of the reference's `whisper_bench_memcpy` and
`whisper_bench_ggml_mul_mat` (include/whisper.h:722-725, driven by
examples/bench/bench.cpp): instead of host memcpy and per-quant-type CPU
GEMMs, this measures what bounds THIS framework — HBM read/write bandwidth
(the decode step is bandwidth-bound) and MXU matmul TFLOPs in bf16 and the
int8 dequant-in-kernel path.

Timing uses the same chain-length-slope method as bench.py (the axon relay
makes single-call timing unreliable; slopes cancel per-call overhead), and
carries the same reliability probe.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

V5E_PEAK_TFLOPS = 197.0   # bf16
V5E_HBM_GBPS = 819.0


def _block(tree):
    import jax
    for leaf in jax.tree_util.tree_leaves(tree):
        leaf.block_until_ready()


def _slope_time(make_fn, args, n1, n2, min_delta_s=0.05, max_n2=512):
    """Per-iteration time from two chain lengths (overhead cancels).

    One timed call per executable, right after its warmup — on the axon
    relay only that first post-warmup call reliably waits.  The short
    chain's time then sizes the long chain so the extra work is at least
    `min_delta_s` of wall clock: on a fast CPU a fixed small n2 puts the
    t2-t1 delta below clock noise and the slope collapses to the 1e-9
    floor (implying absurd GB/s — caught by test_micro_bench_cpu)."""
    import jax
    f1 = jax.jit(make_fn(n1))
    _block(f1(*args))
    t0 = time.perf_counter(); _block(f1(*args)); t1 = time.perf_counter() - t0
    per_iter = max(t1 / n1, 1e-8)
    n2 = min(max(n2, n1 + int(min_delta_s / per_iter) + 1), max_n2)
    f2 = jax.jit(make_fn(n2))
    _block(f2(*args))
    t0 = time.perf_counter(); _block(f2(*args)); t2 = time.perf_counter() - t0
    return max((t2 - t1) / (n2 - n1), 1e-9)


def bench_membw(mib: int = 256) -> float:
    """HBM copy bandwidth (GB/s) via a chained on-device roundtrip
    (read + write of `mib` MiB per iteration)."""
    import jax.numpy as jnp

    n = mib * (1 << 20) // 4
    x = jnp.zeros((n,), jnp.float32)
    shift = jnp.int32(12345)

    def make(k):
        def f(a, s):
            for _ in range(k):
                # jnp.roll with a TRACED shift materializes the whole buffer
                # each iteration (one read + one write); elementwise chains
                # would be register-fused by XLA and measure FLOPs, not HBM
                a = jnp.roll(a, s)
                # data-dependent shift: roll(roll(a,s),s) cannot be folded
                # into roll(a,2s) because s differs per step (never true)
                s = s + (a[0] > 8e37).astype(jnp.int32)
            return a, s
        return f

    t = _slope_time(make, (x, shift), 2, 10)
    return 2 * n * 4 / t / 1e9


def bench_mul_mat(sizes=(512, 1024, 2048, 4096)) -> dict:
    """bf16 and int8-dequant matmul TFLOPs per square size (the reference
    sweeps every quant type on CPU; on TPU the two codepaths that exist are
    bf16 MXU and the Pallas int8 kernel)."""
    import jax.numpy as jnp
    import numpy as np

    from whisper_tpu.checkpoint import quant
    from whisper_tpu.ops.quant_matmul import quant_matmul, repack_for_tpu

    out = {}
    for s in sizes:
        x = jnp.ones((s, s), jnp.bfloat16)

        def make_bf16(k):
            def f(a):
                for _ in range(k):
                    a = a @ a * (1.0 / s)
                return a
            return f

        t = _slope_time(make_bf16, (x,), 2, 10)
        res = {"bf16_tflops": round(2 * s**3 / t / 1e12, 1)}

        w = np.random.default_rng(0).standard_normal((s, s)).astype(np.float32)
        raw = quant.quantize(w, quant.GGML_TYPE_Q8_0)
        qb, db, _m = quant.dequantize_to_int8_blocks(raw, quant.GGML_TYPE_Q8_0,
                                                     w.size)
        q, d = repack_for_tpu(qb, db, s, s)
        q, d = jnp.asarray(q), jnp.asarray(d)

        def make_q8(k):
            def f(a):
                for _ in range(k):
                    a = (quant_matmul(a, q, d) * (1.0 / s)).astype(jnp.bfloat16)
                return a
            return f

        try:
            t = _slope_time(make_q8, (x,), 2, 6)
            res["q8_tflops"] = round(2 * s**3 / t / 1e12, 1)
        except Exception as e:     # Pallas path may be unsupported on CPU
            res["q8_error"] = str(e)[:80]
        out[s] = res
    return out


def reliability_probe() -> float:
    import jax.numpy as jnp
    x = jnp.ones((4096, 4096), jnp.bfloat16)

    def make(k):
        def f(a):
            for _ in range(k):
                a = a @ a * (1.0 / 4096.0)
            return a
        return f

    t = _slope_time(make, (x,), 2, 22)
    return 2 * 4096**3 / t / 1e12


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="micro-bench")
    p.add_argument("--mib", type=int, default=256, help="copy buffer MiB")
    p.add_argument("--sizes", type=int, nargs="*", default=[512, 1024, 2048, 4096])
    args = p.parse_args(argv)

    import jax
    dev = jax.devices()[0]
    probe = reliability_probe()
    result = {
        "device": str(dev),
        "timing_reliable": bool(probe <= 2.0 * V5E_PEAK_TFLOPS),
        "probe_tflops": round(probe, 1),
        "membw_gbps": round(bench_membw(args.mib), 3),
        "membw_peak_gbps": V5E_HBM_GBPS,
        "mul_mat": bench_mul_mat(tuple(args.sizes)),
        "bf16_peak_tflops": V5E_PEAK_TFLOPS,
    }
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
