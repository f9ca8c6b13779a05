#!/usr/bin/env python
"""Wall-clock rows for the round-4 operator tiers (VERDICT r4 item 4).

The flagship bench (bench.py) covers the dedup DAG; the curation /
set-similarity / audio-content tiers had plan pins but no measured wall.
This harness times each named driver query end-to-end (plan build ->
full execution via count()) at SPARK_GRAFT_SF_DIR on
local[SPARK_GRAFT_CPUS], with the same own-vs-neighbor CPU accounting
as bench.py so a contaminated window is visible in the artifact.

Prints ONE JSON line:
    {"metric": "tier_walls", "sf": .., "cpus": .., "queries":
     {name: {"wall_sec": .., "rows": .., "neighbor_cores": ..}}, ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), TIER_QUERIES (comma list; default the
round-4 quartet), TIER_RUNS (default 3 timed runs per query, median).
Results land in BENCH/PLANS.md's "Measured tier walls" table.
"""

from __future__ import annotations

import json
import os
import statistics
import time

DEFAULT_QUERIES = (
    "semantic_dedup",
    "decontamination",
    "setsim_join_pairs",
    "audio_content_near_dups",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("TIER_RUNS", "3"))
    names = [
        n for n in os.environ.get(
            "TIER_QUERIES", ",".join(DEFAULT_QUERIES)).split(",") if n
    ]
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as E
    from bench_util import NeighborSampler
    from locality_sensitive_hashing_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", app_name="lsh-bench-tiers",
                      shuffle_partitions=max(cpus, 8))
    qs = E.queries()
    out: dict[str, dict] = {}
    for name in names:
        q = qs[name]
        # one discarded warm run per query: the aux-table commit +
        # JIT/codegen warm-up would otherwise be charged to run 1 only,
        # making the median depend on run ordering
        q(spark, sf_dir).count()
        walls, rows = [], 0
        ns = NeighborSampler()
        ns.start()
        for _ in range(runs):
            t0 = time.time()
            rows = q(spark, sf_dir).count()
            walls.append(time.time() - t0)
        ev = ns.stop()
        out[name] = {
            "wall_sec": round(statistics.median(walls), 2),
            "all_walls": [round(w, 2) for w in walls],
            "rows": rows,
            "neighbor_cores": ev["neighbor_cores_avg"],
            "own_cores": ev["own_cores_avg"],
        }
    print(json.dumps({
        "metric": "tier_walls",
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "runs": runs,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
