"""Two-parallelism scaling experiment (BASELINE.md protocol).

Runs the identical BEL pipeline input at local[N] and local[4N] in separate
JVMs (sequential subprocesses) and reports throughput + scaling efficiency
(throughput_4N / throughput_N) / 4, target >= 0.8.

Each run is CPU-pinned with `taskset -c 0..N-1` so the low-parallelism run
cannot borrow idle cores for JVM-side work (shuffle/parquet/arrow threads) —
otherwise local[N] on a 32-core box is NOT a faithful proxy for an N-core
cluster and the ratio is understated.

Usage: python scripts/scaling_bench.py [--low 8] [--high 32]
       [--files 4000] [--stmts 100] [--out BENCH.md] [--no-pin]
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tempfile


def run_one(cpus: int, files: int, stmts: int, pin: bool = True) -> dict:
    with tempfile.NamedTemporaryFile(suffix=".json") as tf:
        cmd = [
            sys.executable, "bench.py", "--bel-only",
            "--cpus", str(cpus), "--files", str(files),
            "--stmts", str(stmts), "--json-out", tf.name,
        ]
        if pin and shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        subprocess.run(cmd, check=True, capture_output=True)
        with open(tf.name) as fd:
            return json.load(fd)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--files", type=int, default=4000)
    ap.add_argument("--stmts", type=int, default=100)
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args(argv)

    pin = not args.no_pin
    lo = run_one(args.low, args.files, args.stmts, pin)["bel_pipeline"]
    hi = run_one(args.high, args.files, args.stmts, pin)["bel_pipeline"]

    tp_lo = lo["statements_per_sec"]
    tp_hi = hi["statements_per_sec"]
    ratio = args.high / args.low
    eff = (tp_hi / tp_lo) / ratio
    result = {
        "input": {"files": args.files, "statements": lo["statements"]},
        "cpu_pinned": pin,
        f"local[{args.low}]": lo,
        f"local[{args.high}]": hi,
        "throughput_ratio": round(tp_hi / tp_lo, 3),
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "meets_0.8_target": eff >= 0.8,
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fd:
            json.dump(result, fd, indent=2)


if __name__ == "__main__":
    main()
