#!/usr/bin/env python
"""A/B micro-bench: what the maintenance SUBSTRING axis costs
(throwaway experiment harness, not part of the pipeline).

The same corpus is ingested twice -- ``BatchIngestor(substring=True)``
vs ``substring=False`` (no winnowing-anchor kernel, no anchors table)
-- and the combined maintenance run (`jobs/maintain_clusters.py`)
executes against each store: substring-on adds anchor-block candidates
and upgrades the screen to the full text_ok (lazy exact-LCS for pairs
failing both cheap tests), substring-off takes the two-detector
fallback (absent ``anchors/`` dir).  Both variants run ``audio=False``
so the delta isolates the substring axis alone.  Reported per variant:
bootstrap-ingest wall, pending-ingest wall, bootstrap-job wall,
backlog-job wall, and the partition distance between the two final
clusterings (on `make_clips` corpora the planted near-dup classes are
already caught by est-Jaccard/Hamming, so extra merges -- if any -- are
organic substring overlaps; on corpora with embedded-republication
dups, substring-on finds MORE merges, which is the point of the axis).

A small warm-up ingest+job runs first so JVM/Arrow JIT is not billed to
the first variant.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jobs.maintain_clusters as MJ
from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG
from locality_sensitive_hashing_spark.fixtures import make_clips
from locality_sensitive_hashing_spark.session import get_spark
from locality_sensitive_hashing_spark.streaming.incremental import BatchIngestor


def run_combined(store_dir: str, workdir: str) -> None:
    argv = ["maintain_clusters", "--store", store_dir, "--workdir", workdir,
            "--config-json", "{}"]
    old = sys.argv
    sys.argv = argv
    try:
        assert MJ.main() == 0
    finally:
        sys.argv = old


def main() -> None:
    n_boot = int(os.environ.get("AB_BOOT", "1500"))
    n_pend_batches = int(os.environ.get("AB_PEND", "6"))
    per_batch = int(os.environ.get("AB_PER_BATCH", "250"))
    cores = os.environ.get("AB_CORES", "32")

    spark = get_spark(f"local[{cores}]", app_name="ab-substring-axis",
                      shuffle_partitions=int(cores))
    cfg = DEFAULT_CONFIG
    root = tempfile.mkdtemp(prefix="lsh_ab_sa_")

    n_total = n_boot + n_pend_batches * per_batch
    clips, _ = make_clips(n_total, seed=31)
    sdf_boot = spark.createDataFrame(clips.iloc[:n_boot])
    sdf_pend = [
        spark.createDataFrame(
            clips.iloc[n_boot + b * per_batch:n_boot + (b + 1) * per_batch])
        for b in range(n_pend_batches)
    ]

    # JIT warm-up: tiny corpus through ingest + both job phases
    warm_clips, _ = make_clips(120, seed=77)
    wstore, wwd = os.path.join(root, "w_store"), os.path.join(root, "w_wd")
    os.makedirs(wwd)
    wing = BatchIngestor(spark, wstore, cfg, audio=False)
    wing.process(spark.createDataFrame(warm_clips.iloc[:80]), 0)
    run_combined(wstore, wwd)
    wing.process(spark.createDataFrame(warm_clips.iloc[80:]), 1)
    run_combined(wstore, wwd)

    results, assigns = {}, {}
    for variant, substring in (("nosa", False), ("sa", True)):
        store = os.path.join(root, f"store_{variant}")
        wd = os.path.join(root, f"wd_{variant}")
        os.makedirs(wd)
        ing = BatchIngestor(spark, store, cfg, audio=False,
                            substring=substring)
        t0 = time.monotonic()
        ing.process(sdf_boot, 0)
        t1 = time.monotonic()
        run_combined(store, wd)
        t2 = time.monotonic()
        for b, sdf in enumerate(sdf_pend):
            ing.process(sdf, b + 1)
        t3 = time.monotonic()
        run_combined(store, wd)
        t4 = time.monotonic()
        results[variant] = {
            "ingest_boot_s": round(t1 - t0, 2),
            "job_boot_s": round(t2 - t1, 2),
            "ingest_pend_s": round(t3 - t2, 2),
            "job_backlog_s": round(t4 - t3, 2),
        }
        assigns[variant] = {
            r.clip_id: r.cluster_id
            for r in MJ.read_current(spark, wd).collect()
        }

    # partition distance (label values differ freely): count text_keys
    # whose co-cluster set changed
    def groups(a):
        g: dict = {}
        for k, v in a.items():
            g.setdefault(v, set()).add(k)
        return {k: frozenset(g[v]) for k, v in a.items()}

    gs, gn = groups(assigns["sa"]), groups(assigns["nosa"])
    n_moved = sum(1 for k in gs if gs[k] != gn[k])
    print(json.dumps({
        "n_boot": n_boot, "n_pend_batches": n_pend_batches,
        "per_batch": per_batch, "cores": int(cores),
        "wall_s": results,
        "n_assigned": len(assigns["sa"]),
        "assignments_identical": assigns["sa"] == assigns["nosa"],
        "n_keys_with_changed_co_cluster_set": n_moved,
        "n_clusters": {v: len(set(assigns[v].values())) for v in assigns},
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
