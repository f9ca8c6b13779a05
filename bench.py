#!/usr/bin/env python
"""Benchmark harness: full dedup pipeline throughput at one parallelism.

Runs the headline workload (clips_bench = sf documents replicated x20 with
planted audio dups, FIXTURES.md section 4) end-to-end (scan -> committed
clusters) and prints ONE JSON line:

    {"metric": "dedup_pipeline_wall", "value": <sec>, "unit": "sec",
     "queries": {<stage>: <sec>, ...}, "sf": <sf>, ...}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_REPLICATE (default 20),
BENCH_RUNS (default 3 timed runs, median reported -- VERDICT r4 item 6:
the per-round driver record should not be single-window noise),
BENCH_WARMUP ("sample" default = one discarded small-sample run to warm
JIT/codegen/Python workers; "1" = one discarded full-size run, used by
scaling epochs; "0" = none), BENCH_WARMUP_ROWS (default 5000).
The scaling-efficiency protocol (N vs 4N cores) is bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("BENCH_REPLICATE", "20"))
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    # The first pipeline execution in a fresh JVM pays JIT/codegen +
    # Python-worker warm-up (observed +30% on run 1 at local[32]).
    # BENCH_WARMUP: "sample" (default) = one discarded run over a small
    # sample corpus (~8 s, warms the code paths without a full-size run);
    # "1" = one discarded FULL run (scaling epochs use this so neither
    # parallelism level is charged the warm-up); "0" = none.
    warmup_mode = os.environ.get("BENCH_WARMUP", "sample")
    warmup_rows = int(os.environ.get("BENCH_WARMUP_ROWS", "5000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
    from locality_sensitive_hashing_spark.fixtures import bench_clips_df
    from locality_sensitive_hashing_spark.plans.pipeline import DedupPipeline
    from locality_sensitive_hashing_spark.session import get_spark
    from locality_sensitive_hashing_spark.sources.tables import TableIO

    spark = get_spark(f"local[{cpus}]", app_name="lsh-bench",
                      shuffle_partitions=max(cpus, 8))

    # ---- corpus: built once per (sf, replicate), cached as parquet -------
    cache_root = os.environ.get("BENCH_CACHE", "/tmp/lsh_bench_cache")
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_x{replicate}"
    clips_path = os.path.join(cache_root, f"clips_{tag}.parquet")
    if not os.path.exists(clips_path):
        os.makedirs(cache_root, exist_ok=True)
        tmp = clips_path + ".tmp"
        bench_clips_df(spark, sf_dir, replicate=replicate).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.rename(tmp, clips_path)
    clips = spark.read.parquet(clips_path)
    n_clips = clips.count()
    with open("/proc/loadavg") as f:
        load_before = float(f.read().split()[0])

    from bench_util import NeighborSampler

    sampler = NeighborSampler()  # this process + Spark JVM + py workers
    sampler.start()

    # ---- timed runs (fresh TableIO dir each -> no resume short-circuit) --
    walls: list[float] = []
    stage_walls: dict[str, float] = {}
    # stage tables on tmpfs when available: local-mode disk serializes an
    # otherwise-parallel workload (a cluster writes stages to distributed
    # storage); mirrors the spark.local.dir choice in session.py
    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    n_warm = 1 if warmup_mode in ("1", "sample") else 0
    for i in range(-n_warm, runs):
        warm = i < 0
        workdir = tempfile.mkdtemp(prefix="lsh_bench_run_", dir=work_root)
        io = TableIO(spark, workdir)
        t0 = time.time()
        pipe = DedupPipeline(spark, CFG, io, run_id="bench")
        src = (
            clips.limit(warmup_rows) if warm and warmup_mode == "sample"
            else clips
        )
        clusters = pipe.run(src)
        n_clusters = clusters.select("cluster_id").distinct().count()
        if not warm:
            walls.append(time.time() - t0)
            m = io.read("metrics").where("partition_id = -1").toPandas()
            stage_walls = {
                r.stage: round(float(r.wall_sec), 2) for r in m.itertuples()
            }
            # driver-side walls outside stage commits (cache
            # materialization, metrics drain): report them so no
            # wall-clock is unattributed
            stage_walls.update(pipe.aux_walls)
        shutil.rmtree(workdir, ignore_errors=True)

    walls.sort()
    wall = walls[len(walls) // 2]
    window = sampler.stop()
    with open("/proc/loadavg") as f:
        load_after = float(f.read().split()[0])
    result = {
        "metric": "dedup_pipeline_wall",
        "value": round(wall, 2),
        "unit": "sec",
        "queries": stage_walls,
        "sf": sf,
        "n_clips": n_clips,
        "n_clusters": n_clusters,
        "clips_per_sec": round(n_clips / wall, 1),
        "cpus": cpus,
        "runs": runs,
        "all_walls": [round(w, 2) for w in walls],
        "config_id": CFG.config_id,
        # noisy-VM honesty: 1-min system load sampled around the timed
        # runs (neighbor tenants routinely push this box to load 10-25,
        # which contaminates high-parallelism levels far more than low)
        "loadavg": [load_before, load_after],
        # MEASURED contamination over the whole timed window (VERDICT r3
        # item 8): /proc/stat busy CPU minus this bench's own subtree --
        # the same accounting bench_quiet.py gates its clean pairs on
        "neighbor_cores": window["neighbor_cores_avg"],
        "own_cores": window["own_cores_avg"],
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
