#!/usr/bin/env python
"""Maintenance-loop flatness bench: fold the SAME batch into two corpus
sizes; the fold wall must be ~corpus-independent.

The flagship bench (bench.py) times the BATCH pipeline; this times the
INCREMENTAL loop end-to-end -- ALL axes (MinHash + SimHash + winnowing
anchors + frame-energy audio), the real intake store, the real
spark-submit job main() -- on the 100k-clip bench corpus
(fixtures.bench_clips_df, reusing bench.py's cached parquet):

  for each committed-corpus size S in MAINTAIN_SPLITS (percent):
    1. ingest S% of the corpus as intake batch 0 (BatchIngestor:
       content keys + per-new-distinct-text signature/fingerprint/
       anchor rows + per-new-distinct-payload energy rows);
    2. bootstrap the standing assignment (maintain_clusters main,
       store-is-empty path);
    3. ingest the SAME held-out batch (the top MAINTAIN_BATCH percent
       by clip_id hash) as batch 1;
    4. fold it (incremental path: pairs only from blocks the batch
       touches, broadcast-endpoint screen, merge-on-read ClusterStore)
       -- the timed figure.

The 100 TB claim under test: fold wall is a function of the BATCH and
the blocks it touches, not of the committed corpus behind it --
`fold_ratio` (fold wall at the larger corpus / at the smaller) should
sit near 1.0 while the corpus doubles.  Bootstrap walls are reported
for context (they legitimately grow with S).  Results ->
BENCH/MAINTAIN.md.  One JSON line on stdout; loadavg + measured
neighbor cores recorded (bench_util).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (32), BENCH_REPLICATE (20), MAINTAIN_SPLITS ("45,90"),
MAINTAIN_BATCH (10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# run as `python jobs/bench_maintain.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("BENCH_REPLICATE", "20"))
    splits = [int(x) for x in
              os.environ.get("MAINTAIN_SPLITS", "45,90").split(",")]
    batch_pct = int(os.environ.get("MAINTAIN_BATCH", "10"))

    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
    from locality_sensitive_hashing_spark.fixtures import bench_clips_df
    from locality_sensitive_hashing_spark.session import get_spark
    from locality_sensitive_hashing_spark.streaming.incremental import (
        BatchIngestor,
    )

    import jobs.maintain_clusters as MJ

    spark = get_spark(f"local[{cpus}]", app_name="lsh-bench-maintain",
                      shuffle_partitions=max(cpus, 8))

    # same cached corpus as bench.py
    cache_root = os.environ.get("BENCH_CACHE", "/tmp/lsh_bench_cache")
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_x{replicate}"
    clips_path = os.path.join(cache_root, f"clips_{tag}.parquet")
    if not os.path.exists(clips_path):
        os.makedirs(cache_root, exist_ok=True)
        tmp = clips_path + ".tmp"
        bench_clips_df(spark, sf_dir, replicate=replicate).write.mode(
            "overwrite").parquet(tmp)
        os.rename(tmp, clips_path)
    clips = spark.read.parquet(clips_path)
    bucket = F.pmod(F.xxhash64("clip_id"), F.lit(100))
    batch = clips.where(bucket >= 100 - batch_pct)
    n_batch = batch.count()

    from bench_util import NeighborSampler

    with open("/proc/loadavg") as f:
        load_before = float(f.read().split()[0])
    sampler = NeighborSampler()
    sampler.start()

    def run_job(store, wd):
        argv = ["maintain_clusters", "--store", store, "--workdir", wd]
        old = sys.argv
        sys.argv = argv
        try:
            assert MJ.main() == 0
        finally:
            sys.argv = old

    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    results = []
    for s in splits:
        base = clips.where(bucket < s)
        n_base = base.count()
        root = tempfile.mkdtemp(prefix="lsh_bench_maintain_", dir=work_root)
        store = os.path.join(root, "intake")
        wd = os.path.join(root, "clusters")
        os.makedirs(wd)
        ing = BatchIngestor(spark, store, CFG)

        t0 = time.time()
        ing.process(base, 0)
        t_ingest0 = time.time() - t0
        t0 = time.time()
        run_job(store, wd)  # bootstrap: from-scratch over the committed S%
        t_bootstrap = time.time() - t0
        t0 = time.time()
        ing.process(batch, 1)
        t_ingest1 = time.time() - t0
        t0 = time.time()
        run_job(store, wd)  # fold: incremental, touched blocks only
        t_fold = time.time() - t0
        n_assigned = MJ.read_current(spark, wd).count()
        shutil.rmtree(root, ignore_errors=True)
        results.append({
            "split_pct": s, "n_base": n_base,
            "ingest_base_s": round(t_ingest0, 2),
            "bootstrap_s": round(t_bootstrap, 2),
            "ingest_batch_s": round(t_ingest1, 2),
            "fold_s": round(t_fold, 2),
            "n_assigned": n_assigned,
        })

    window = sampler.stop()
    with open("/proc/loadavg") as f:
        load_after = float(f.read().split()[0])
    out = {
        "metric": "maintain_fold_flatness",
        "unit": "sec",
        "sf_dir": sf_dir, "cpus": cpus, "replicate": replicate,
        "n_batch": n_batch,
        "levels": results,
        "fold_ratio": round(results[-1]["fold_s"] / results[0]["fold_s"], 3)
        if len(results) > 1 and results[0]["fold_s"] else None,
        "corpus_ratio": round(results[-1]["n_base"] / results[0]["n_base"], 3)
        if len(results) > 1 and results[0]["n_base"] else None,
        "loadavg": [load_before, load_after],
        "neighbor_cores": window["neighbor_cores_avg"],
        "own_cores": window["own_cores_avg"],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
