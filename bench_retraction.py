#!/usr/bin/env python
"""Retraction-cost bench: equality deletes must cost O(retracted +
affected-cluster members), NOT corpus size.

The merge-on-read retraction path (ClusterStore.retract,
operators/connected_components.py) claims the hard direction of the
incremental contract -- removing a cut vertex SPLITS its cluster via a
local CC recompute over the affected clusters only, with the
corpus-sized base untouched. This bench pins that cost claim the same
way BENCH/INCREMENTAL.md pins batch flatness: retract the SAME fixed
set of K cluster-bridging nodes from standing assignments of two corpus
sizes (default 200k and 400k rows) and require the retraction wall to
stay ~flat while the corpus doubles.

Construction (synthetic, deterministic): corpus = N/4 star clusters of
size 4 (center + 3 leaves; star edges center->leaf). Retraction = the
CENTERS of the first K clusters -- every retraction removes a cut
vertex, so each affected cluster must split into 3 singletons (the
direction no label remap can express). ``edges_fn`` restricts a
precomputed corpus edge table to the survivor set, exactly the
committed-feature-store recompute contract, so the measured wall covers
the full mechanics: affected-cluster location, survivor edge recompute,
local CC, tombstone + delta maintenance, and one full view read.

Reported per size: ``retract_wall`` (retract + materialize the store
state), ``view_read_wall`` (full scan of current()), and the resulting
split-correctness count. Summary: flatness ratio = retract_wall(2N) /
retract_wall(N) -- must stay far below 2.0.

A discarded warm-up pass (smallest size, untimed) absorbs first-JVM
JIT + codegen cost so the timed walls compare like-for-like; disable
with RETRACT_WARMUP=0.

Env knobs: RETRACT_SIZES ("200000,400000"), RETRACT_K (1000),
RETRACT_WARMUP (1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
    from locality_sensitive_hashing_spark.operators.connected_components import (
        ClusterStore,
    )
    from locality_sensitive_hashing_spark.session import get_spark

    sizes = [int(s) for s in os.environ.get(
        "RETRACT_SIZES", "200000,400000").split(",")]
    k = int(os.environ.get("RETRACT_K", "1000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", app_name="bench-retraction")
    spark.sparkContext.setLogLevel("ERROR")

    warmup = os.environ.get("RETRACT_WARMUP", "1") != "0"

    rows = []
    plan = ([min(sizes)] if warmup else []) + sizes
    for run_idx, n in enumerate(plan):
        is_warmup = warmup and run_idx == 0
        n_clusters = n // 4
        ids = spark.range(n).select(
            F.col("id").alias("i"),
            (F.col("id") / 4).cast("long").alias("c"),
            (F.col("id") % 4).alias("slot"),
        )
        key = F.format_string("clip%09d", F.col("i"))
        ckey = F.format_string("clip%09d", F.col("c") * 4)
        base = ids.select(
            key.alias("clip_id"), ckey.alias("cluster_id")
        ).repartition(cpus).localCheckpoint()
        # star edges center -> leaf (center = slot 0)
        edges_all = ids.where(F.col("slot") > 0).select(
            F.format_string("clip%09d", F.col("c") * 4).alias("id1"),
            key.alias("id2"),
        ).repartition(cpus).localCheckpoint()
        dead = spark.range(k).select(
            F.format_string("clip%09d", F.col("id") * 4).alias("clip_id")
        )

        def edges_fn(survivors, _edges=edges_all):
            s = survivors.select(F.col("clip_id"))
            return (
                _edges.join(F.broadcast(s.withColumnRenamed("clip_id", "id1")),
                            "id1", "left_semi")
                .join(F.broadcast(s.withColumnRenamed("clip_id", "id2")),
                      "id2", "left_semi")
            )

        store = ClusterStore(base)
        t0 = time.time()
        store.retract(dead, edges_fn, CFG)
        retract_wall = time.time() - t0

        t0 = time.time()
        cur = store.current()
        n_rows = cur.count()
        view_read_wall = time.time() - t0

        # correctness of the split: k clusters lost their center; the 3
        # surviving leaves become singletons (no surviving edges touch
        # them -- all star edges ran through the center)
        n_clusters_now = cur.select("cluster_id").distinct().count()
        expected = (n_clusters - k) + 3 * k
        if is_warmup:
            print(json.dumps({"warmup": True, "corpus_rows": n,
                              "retract_wall": round(retract_wall, 2)}),
                  flush=True)
            continue
        rows.append({
            "corpus_rows": n, "k_retracted": k,
            "retract_wall": round(retract_wall, 2),
            "view_read_wall": round(view_read_wall, 2),
            "rows_after": n_rows, "clusters_after": n_clusters_now,
            "clusters_expected": expected,
            "split_ok": n_clusters_now == expected and n_rows == n - k,
        })
        print(json.dumps(rows[-1]), flush=True)

    ratio = rows[-1]["retract_wall"] / max(rows[0]["retract_wall"], 1e-9)
    summary = {
        "metric": "retraction_flatness",
        "sizes": sizes, "k": k,
        "retract_walls": [r["retract_wall"] for r in rows],
        "flatness_ratio": round(ratio, 3),
        "all_splits_ok": all(r["split_ok"] for r in rows),
        "cpus": cpus,
        "loadavg": list(os.getloadavg())[:2],
    }
    print(json.dumps(summary), flush=True)
    if not summary["all_splits_ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
