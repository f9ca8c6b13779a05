#!/usr/bin/env python
"""Hardware scaling ceiling: pure-numpy multiprocessing, no Spark.

The sandbox substitutes "two local parallelism levels" for the N vs 4N
executor-cluster rule (BENCH/BASELINE.md). Threads against ONE kernel,
one memory bus, and noisy-neighbor VMs do not scale like added machines,
so this script measures what perfectly-parallel CPU work (the same numpy
flavor as the pipeline's kernels: hashing + matmul + sort per task, zero
coordination) actually achieves between the same two process counts.
That ceiling contextualizes the pipeline's measured efficiency: pipeline
efficiency / ceiling = the fraction attributable to the pipeline itself.

Prints ONE JSON line:
  {"pairs": {"2->8": {...}, "8->32": {...}}, "load_before": ..., ...}

Each level runs `procs` worker processes each doing IDENTICAL work, so
ideal scaling = equal wall at every level; efficiency = wall_low/wall_high
(work per proc fixed -> throughput ratio = procs ratio * wall ratio).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np


def _task(seed: int) -> int:
    rng = np.random.default_rng(seed)
    acc = 0
    for _ in range(60):
        a = rng.integers(0, 1 << 31, size=400_000, dtype=np.int64)
        h = (a * 0x9E3779B9 + 12345) % 2147483647
        m = rng.standard_normal((256, 256))
        acc += int((m @ m.T).trace()) + int(np.sort(h)[0])
    return acc


def _run_level(procs: int) -> float:
    """Best-of-3 wall for `procs` identical tasks on a pre-warmed pool
    (pool spawn + numpy import excluded -- we measure compute scaling,
    not process startup)."""
    with mp.get_context("spawn").Pool(procs) as pool:
        pool.map(_task, [0] * procs)  # warm workers
        walls = []
        for r in range(3):
            t0 = time.time()
            pool.map(_task, range(r * procs, (r + 1) * procs))
            walls.append(time.time() - t0)
    return min(walls)


def main() -> None:
    with open("/proc/loadavg") as f:
        load = f.read().split()[0]
    # CEILING_LEVELS="8,32" runs just one pair (the ~12 s in-window probe
    # bench_quiet --paired runs around every pipeline pair)
    levels = [int(x) for x in
              os.environ.get("CEILING_LEVELS", "2,8,32").split(",")]
    walls = {p: _run_level(p) for p in levels}
    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        # same work PER PROCESS at each level: ideal = equal walls;
        # efficiency = (tput_hi / tput_lo) / (hi / lo) = wall_lo / wall_hi
        pairs[f"{lo}->{hi}"] = {
            "wall_low": round(walls[lo], 2),
            "wall_high": round(walls[hi], 2),
            "ceiling": round(walls[lo] / walls[hi], 3),
        }
    print(json.dumps({
        "metric": "numpy_mp_scaling_ceiling",
        "pairs": pairs,
        "walls": {str(k): round(v, 2) for k, v in walls.items()},
        "load_before": float(load),
        "cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
