"""Fresh-relay one-shot timing probe (VERDICT r2 #1).

PERF.md "Relay timing" records that on the axon TPU relay every
host-observable completion signal lies (block_until_ready returns early,
D2H hangs) — EXCEPT one datum: a single scalar device->host fetch from a
fresh relay connection succeeded once with correct data before the channel
wedged. This tool exploits that one-shot window:

  - each MEASUREMENT runs in its own subprocess => its own fresh relay
    connection;
  - the worker AOT-compiles a jitted chain of n data-dependent 2048^3
    bf16 matmuls reduced to one scalar, dispatches ONCE, and times the
    process's FIRST-EVER device_get of that scalar (the fetch cannot
    return before the chain has executed — the value depends on it);
  - the orchestrator collects (n, fetch_seconds) across several chain
    lengths; the SLOPE is per-matmul execution time with dispatch/transfer
    constants cancelled, and >= 3 points give a linearity check.

Each 2048^3 matmul is 2*2048^3 = 17.18 GFLOP, so
implied_tflops = 17.18e9 / slope / 1e12. A physical value (<= 197 bf16
peak) is the first trustworthy wall-clock evidence this relay can produce;
workers that hang are killed by timeout and reported honestly.

Run: python -m whisper_tpu.tools.relay_probe            (orchestrator)
     python -m whisper_tpu.tools.relay_probe --worker N (one measurement)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

DIM = 2048
GFLOP_PER_MATMUL = 2 * DIM**3 / 1e9
CHAIN_LENGTHS = (256, 2048, 8192)       # ~0.05 s .. 1.5 s at ~100 TFLOPs
WORKER_TIMEOUT_S = 180


def worker(n: int) -> int:
    import jax
    import jax.numpy as jnp

    x = jnp.ones((DIM, DIM), jnp.bfloat16)

    def f(a):
        def body(i, a):
            return (a @ a) * (1.0 / DIM)

        a = jax.lax.fori_loop(0, n, body, a)
        return a[0, 0].astype(jnp.float32)

    compiled = jax.jit(f).lower(x).compile()   # compile outside the clock
    t0 = time.perf_counter()
    y = compiled(x)                            # one dispatch
    v = float(y)                               # FIRST D2H of this process
    dt = time.perf_counter() - t0
    print(json.dumps({"n": n, "fetch_s": dt, "value": v}), flush=True)
    return 0


def orchestrate(chain_lengths=CHAIN_LENGTHS) -> dict:
    results, failures = [], []
    for n in chain_lengths:
        try:
            res = subprocess.run(
                [sys.executable, "-m", "whisper_tpu.tools.relay_probe",
                 "--worker", str(n)],
                capture_output=True, text=True, timeout=WORKER_TIMEOUT_S,
                env=os.environ.copy())
            line = (res.stdout.strip().splitlines() or [""])[-1]
            rec = json.loads(line)
            results.append(rec)
            print(f"n={n}: fetch={rec['fetch_s']:.3f}s value={rec['value']}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            failures.append({"n": n, "error": "timeout (D2H hang)"})
            print(f"n={n}: WORKER HUNG (killed at {WORKER_TIMEOUT_S}s)",
                  file=sys.stderr, flush=True)
        except Exception as e:
            failures.append({"n": n, "error": str(e)[:200]})
            print(f"n={n}: failed: {e}", file=sys.stderr, flush=True)

    out = {"points": results, "failures": failures,
           "gflop_per_matmul": GFLOP_PER_MATMUL}
    if len(results) >= 2:
        # least-squares slope over (n, fetch_s)
        ns = [r["n"] for r in results]
        ts = [r["fetch_s"] for r in results]
        mean_n = sum(ns) / len(ns)
        mean_t = sum(ts) / len(ts)
        num = sum((a - mean_n) * (b - mean_t) for a, b in zip(ns, ts))
        den = sum((a - mean_n) ** 2 for a in ns)
        slope = num / den if den else float("nan")
        out["slope_s_per_matmul"] = slope
        if slope > 0:
            out["implied_tflops"] = round(GFLOP_PER_MATMUL / slope / 1e3, 1)
            out["physical"] = out["implied_tflops"] <= 197.0 * 1.1
        if len(results) >= 3:
            # linearity: max relative residual from the fit
            resid = [abs(t - (mean_t + slope * (a - mean_n)))
                     for a, t in zip(ns, ts)]
            out["max_resid_s"] = round(max(resid), 4)
    return out


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if argv[:1] == ["--worker"]:
        return worker(int(argv[1]))
    out = orchestrate()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
