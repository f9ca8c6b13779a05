#!/usr/bin/env python
"""Two-parallelism scaling protocol (N vs 4N cores) -> BENCH/BASELINE.md.

BASELINE.json demands throughput scaling efficiency >= 0.8 between N and
4N *executor* cluster runs; no real cluster exists in this sandbox, so
per the driver's instruction the evidence is the same job at two local
parallelism levels (local[8] vs local[32]) on the SAME input snapshot:

    efficiency = (tput_4N / tput_N) / 4

Each level runs in a FRESH JVM (spark.master is fixed per JVM) via
subprocess on bench.py; one warm-up run is discarded (it also builds the
shared corpus cache), then BENCH_RUNS timed runs; median reported.

Usage: python bench_scaling.py [--sf-dir DIR] [--low 8] [--high 32]
       [--runs 3] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_bench(sf_dir: str, cpus: int, runs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_RUNS=str(runs),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmup", action="store_true", default=True)
    ap.add_argument("--out", default="BENCH/BASELINE.md")
    args = ap.parse_args()

    nproc = os.cpu_count()
    mem_kb = 0
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemTotal"):
                mem_kb = int(line.split()[1])

    # warm-up (discarded; also builds the shared corpus cache)
    print(f"warm-up at local[{args.low}] ...", file=sys.stderr)
    run_bench(args.sf_dir, args.low, 1)

    results = {}
    for cpus in (args.low, args.high):
        print(f"timed: local[{cpus}] x {args.runs} runs ...", file=sys.stderr)
        t0 = time.time()
        results[cpus] = run_bench(args.sf_dir, cpus, args.runs)
        print(f"  done in {time.time()-t0:.0f}s: {results[cpus]['value']}s "
              f"median wall", file=sys.stderr)

    lo, hi = results[args.low], results[args.high]
    ratio = args.high / args.low
    eff = (hi["clips_per_sec"] / lo["clips_per_sec"]) / ratio

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"""# BENCH/BASELINE — measured throughput & scaling evidence

Protocol (BASELINE.md): same binary, same config
(`{lo['config_id']}`), same input snapshot
({lo['n_clips']} clips derived from `{args.sf_dir}` documents x20,
planted audio dups); 1 discarded warm-up; {args.runs} timed runs per
parallelism level; median end-to-end wall-clock (source scan ->
committed clusters table). Cluster-size scaling (N -> 4N executors)
is evidenced by two local parallelism levels per the driver's
instruction -- no real cluster in this sandbox.

Machine: {nproc} cores, {mem_kb // 1024 // 1024} GiB RAM.

| parallelism | median wall (s) | clips/sec | sys loadavg around runs | per-stage (s) |
|---|---|---|---|---|
| local[{args.low}] (N) | {lo['value']} | {lo['clips_per_sec']} | {lo.get('loadavg')} | {json.dumps(lo['queries'])} |
| local[{args.high}] (4N) | {hi['value']} | {hi['clips_per_sec']} | {hi.get('loadavg')} | {json.dumps(hi['queries'])} |

**Scaling efficiency = (tput_4N / tput_N) / {ratio:.0f} = {eff:.3f}**
(target >= 0.8, BASELINE.json)

Command lines:

```
SPARK_GRAFT_SF_DIR={args.sf_dir} SPARK_GRAFT_CPUS={args.low} BENCH_RUNS={args.runs} python bench.py
SPARK_GRAFT_SF_DIR={args.sf_dir} SPARK_GRAFT_CPUS={args.high} BENCH_RUNS={args.runs} python bench.py
```
""")
    print(json.dumps({
        "low_cpus": args.low, "high_cpus": args.high,
        "tput_low": lo["clips_per_sec"], "tput_high": hi["clips_per_sec"],
        "efficiency": round(eff, 3), "out": args.out,
    }))


if __name__ == "__main__":
    main()
