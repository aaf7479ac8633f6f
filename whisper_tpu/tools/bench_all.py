"""Run bench.py across model presets and print a whisper.cpp-style table.

reference scripts/bench-all.sh + scripts/bench.py (output format of
bench-all-gg.txt: model | Enc. | Dec. | Bch5 | PP columns).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

DEFAULT_PRESETS = ["tiny", "base", "small"]


def run_one(preset: str, timeout: int = 900) -> dict:
    env = dict(os.environ, WHISPER_TPU_BENCH_PRESET=preset)
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "..", "bench.py")],
        env=env, capture_output=True, text=True, timeout=timeout)
    out = {"preset": preset}
    if proc.returncode != 0:
        out["error"] = (f"exit {proc.returncode}: "
                        + proc.stderr.strip().splitlines()[-1][:200]
                        if proc.stderr.strip() else f"exit {proc.returncode}")
    for line in proc.stderr.splitlines():
        m = re.match(r"(mel|encode|cross-kv|decode|bch5|pp): ([0-9.]+) ms", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    for line in proc.stdout.splitlines():
        try:
            doc = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(doc, dict):   # stray scalar JSON lines are not rows (r4)
            out.update(doc)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="whisper-tpu-bench-all")
    ap.add_argument("presets", nargs="*", default=DEFAULT_PRESETS)
    args = ap.parse_args(argv)
    presets = args.presets or DEFAULT_PRESETS

    rows = []
    for p in presets:
        print(f"benchmarking {p}...", file=sys.stderr, flush=True)
        try:
            rows.append(run_one(p))
        except subprocess.TimeoutExpired:
            rows.append({"preset": p, "error": "timeout"})

    print(f"{'model':>16} | {'Enc. ms':>8} | {'Dec. ms':>8} | {'Bch5 ms':>8} | "
          f"{'PP ms':>8} | {'Mel ms':>8} | {'RTF':>8}")
    print("-" * 84)
    for r in rows:
        print(f"{r['preset']:>16} | {r.get('encode', float('nan')):8.2f} | "
              f"{r.get('decode', float('nan')):8.3f} | "
              f"{r.get('bch5', float('nan')):8.3f} | "
              f"{r.get('pp', float('nan')):8.4f} | "
              f"{r.get('mel', float('nan')):8.2f} | "
              f"{r.get('value', float('nan')):8.1f}"
              + ("  [UNRELIABLE]" if r.get("timing_unreliable") else "")
              + (f"  ERROR: {r['error']}" if r.get("error") else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
