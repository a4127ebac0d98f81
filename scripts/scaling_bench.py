"""Two-parallelism scaling experiment (BASELINE.md protocol).

Runs the identical BEL pipeline input at local[N] and local[4N] in separate
JVMs (sequential subprocesses) and reports throughput + scaling efficiency
(throughput_4N / throughput_N) / 4, target >= 0.8.

Protocol details that make the local-mode proxy faithful to an N-executor
cluster:

- **CPU pinning** (`taskset -c 0..N-1`): the low-parallelism run must not
  borrow idle cores for JVM-side work (shuffle/parquet/arrow threads).
- **Warmup**: a smaller pipeline run first, then two timed runs with the
  best taken.  A cluster amortizes JIT over hours; a 2-minute cold JVM
  spends a third of its time compiling the nested-parquet and codegen
  paths, which would be attributed to whichever parallelism ran it.
- **Throughput metric**: statements/sec over the full parse -> validate ->
  materialize -> link -> write pipeline on the same deterministic corpus.

Usage: python scripts/scaling_bench.py [--low 8] [--high 32]
       [--files 20000] [--stmts 250] [--out BENCH_SCALING.json] [--no-pin]
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import os


def run_one(cpus: int, files: int, stmts: int, warm: int, pin: bool,
            executors: int | None = None, exec_cores: int = 2) -> dict:
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "pipeline_scale_test.py")
    cmd = [sys.executable, script, "--cpus", str(cpus),
           "--files", str(files), "--stmts", str(stmts),
           "--warm-files", str(warm)]
    if executors:
        cmd += ["--executors", str(executors), "--exec-cores", str(exec_cores)]
        cpus = executors * exec_cores
    if pin and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"run at {cpus} cores failed rc={out.returncode}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--files", type=int, default=20000)
    ap.add_argument("--stmts", type=int, default=250)
    ap.add_argument("--warm-files", type=int, default=2000)
    ap.add_argument("--executors", action="store_true",
                    help="interpret --low/--high as EXECUTOR counts and run "
                         "each level on local-cluster[N, exec-cores, mem] — "
                         "N real executor JVMs (the literal N vs 4N "
                         "executors protocol); CPU pinning covers "
                         "N * exec-cores cores")
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args(argv)

    pin = not args.no_pin
    ex = args.executors
    hi = run_one(args.high, args.files, args.stmts, args.warm_files, pin,
                 executors=args.high if ex else None,
                 exec_cores=args.exec_cores)
    lo = run_one(args.low, args.files, args.stmts, args.warm_files, pin,
                 executors=args.low if ex else None,
                 exec_cores=args.exec_cores)

    tp_lo = lo["statements_per_sec"]
    tp_hi = hi["statements_per_sec"]
    ratio = args.high / args.low
    eff = (tp_hi / tp_lo) / ratio
    tag = (lambda n: f"local-cluster[{n},{args.exec_cores}]" if ex
           else f"local[{n}]")
    result = {
        "input": {"files": args.files, "statements": lo["statements"]},
        "cpu_pinned": pin,
        "mode": ("N vs 4N real executor JVMs (local-cluster)" if ex
                 else "local[N] threads"),
        "protocol": "warmup run + best of 2 timed full-pipeline runs",
        tag(args.low): lo,
        tag(args.high): hi,
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
