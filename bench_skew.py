#!/usr/bin/env python
"""Adversarial-skew bench: wall-boundedness under the two hot-spot shapes
(see fixtures.skew_clips_df / tests/test_skew_stress.py).

Runs the full dedup pipeline over SKEW_N_REP byte-identical repeats of
one clip plus SKEW_N_HOT near-identical distinct texts (one engineered
hot band bucket), and prints ONE JSON line with the wall, the chain-edge
count (must be n_rep - 1: linear star, not quadratic), and the
dropped-bucket accounting (drops must be counted, never silent).

Boundedness evidence = run at two n_rep values (e.g. 100k then 200k) and
compare clips_per_sec: a quadratic blowup would crater the per-clip rate;
the star-chain design holds it ~flat. Results recorded in BENCH/SKEW.md.

Env knobs: SKEW_N_REP (default 100000), SKEW_N_HOT (default 512),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    n_rep = int(os.environ.get("SKEW_N_REP", "100000"))
    n_hot = int(os.environ.get("SKEW_N_HOT", "512"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
    from locality_sensitive_hashing_spark.fixtures import skew_clips_df
    from locality_sensitive_hashing_spark.plans.pipeline import DedupPipeline
    from locality_sensitive_hashing_spark.session import get_spark
    from locality_sensitive_hashing_spark.sources.tables import TableIO

    spark = get_spark(f"local[{cpus}]", app_name="lsh-bench-skew",
                      shuffle_partitions=max(cpus, 8))

    # materialize the corpus first so synthesis cost is not in the timed
    # window (mirrors bench.py's cached-corpus protocol)
    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus_dir = tempfile.mkdtemp(prefix="lsh_skew_corpus_", dir=work_root)
    clips_raw, _, _ = skew_clips_df(spark, n_rep, n_hot)
    clips_path = os.path.join(corpus_dir, "clips.parquet")
    clips_raw.write.mode("overwrite").parquet(clips_path)
    clips = spark.read.parquet(clips_path)
    n_clips = clips.count()

    with open("/proc/loadavg") as f:
        load_before = float(f.read().split()[0])
    workdir = tempfile.mkdtemp(prefix="lsh_skew_run_", dir=work_root)
    io = TableIO(spark, workdir)
    t0 = time.time()
    pipe = DedupPipeline(spark, CFG, io, run_id="bench-skew")
    clusters = pipe.run(clips)
    n_clusters = clusters.select("cluster_id").distinct().count()
    wall = time.time() - t0

    chain_edges = io.read("verified").where(
        (F.col("kind") == "chain") & F.col("id2").startswith("rep")
    ).count()
    dropped = io.read("dropped_buckets").toPandas()
    rep_cluster_count = (
        clusters.where(F.col("clip_id").startswith("rep"))
        .select("cluster_id").distinct().count()
    )
    with open("/proc/loadavg") as f:
        load_after = float(f.read().split()[0])

    print(json.dumps({
        "metric": "skew_pipeline_wall",
        "value": round(wall, 2),
        "unit": "sec",
        "n_rep": n_rep,
        "n_hot": n_hot,
        "n_clips": n_clips,
        "n_clusters": n_clusters,
        "clips_per_sec": round(n_clips / wall, 1),
        "chain_edges": chain_edges,          # == n_rep - 1: linear star
        "rep_clusters": rep_cluster_count,   # == 1: all repeats merged
        "dropped_buckets": int(len(dropped)),
        "dropped_members_max": int(dropped.n_members.max()) if len(dropped) else 0,
        "cpus": cpus,
        "config_id": CFG.config_id,
        "loadavg": [load_before, load_after],
    }))
    shutil.rmtree(workdir, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
