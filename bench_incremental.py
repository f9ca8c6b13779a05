#!/usr/bin/env python
"""Incremental-dedup flatness bench (VERDICT r2 item 4): per-batch wall
must be ~independent of corpus size.

The 100 TB maintenance story rests on the incremental path
(operators/candidates.incremental_pairs_from_blocks +
connected_components.merge_clusters): ingesting a batch costs work
proportional to the BATCH (and the buckets it touches), not the corpus.
This bench ingests the SAME fixed batch of fresh texts into committed
corpora of two sizes (default 100k and 200k clips) and times the
per-batch core:

    batch signatures -> banding -> incremental pairs (touched-bucket
    semi-join) -> est-Jaccard verified edges -> contracted-graph CC
    (the old-label -> new-label mapping)

Reported separately (NOT in the core wall): `relabel_wall`, the
corpus-sized application of the mapping to the full assignment table --
linear in corpus size by design; a production deployment applies the
batch-sized mapping as a merge-on-read delta instead of rewriting the
table per batch.  That read path now EXISTS
(connected_components.ClusterStore, VERDICT r3 item 1), so this bench
also measures its overhead directly: `view_read_wall` (full scan of
ClusterStore.current() -- base relabeled through the broadcast mapping
+ delta union) vs `base_read_wall` (the same scan of the folded base
table); `read_overhead` is their ratio and must stay bounded (~1x)
independent of corpus size.

Prints one JSON line per corpus size plus a summary with the flatness
ratio. Results recorded in BENCH/INCREMENTAL.md.

Env knobs: INCR_REPLICATES (default "20,40" -> 100k/200k clips at
sf0.1), INCR_BATCH (default 10000), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
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
    replicates = [int(x) for x in
                  os.environ.get("INCR_REPLICATES", "20,40").split(",")]
    n_batch = int(os.environ.get("INCR_BATCH", "10000"))

    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
    from locality_sensitive_hashing_spark.functions.text import normalize_text
    from locality_sensitive_hashing_spark.operators.candidates import (
        incremental_pairs_from_blocks,
    )
    from locality_sensitive_hashing_spark.operators.connected_components import (
        ClusterStore,
        apply_mapping,
        cluster_delta,
    )
    from locality_sensitive_hashing_spark.operators.minhash import (
        estimated_jaccard_udf,
        explode_bands,
        with_signatures,
    )
    from locality_sensitive_hashing_spark.session import get_spark
    from locality_sensitive_hashing_spark.sources.tables import read_testdata

    spark = get_spark(f"local[{cpus}]", app_name="lsh-bench-incr",
                      shuffle_partitions=max(cpus, 8))
    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    cache_root = os.environ.get("BENCH_CACHE", "/tmp/lsh_bench_cache")
    os.makedirs(cache_root, exist_ok=True)

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")

    # ---- fixed batch: n_batch FRESH texts (variant suffix guarantees ----
    # they are new content; shared prefixes still collide into corpus
    # buckets, so the semi-join has real work to do)
    batch = (
        docs.where(F.col("doc_id") < n_batch)
        .select(
            F.concat(F.lit("newb"), F.col("doc_id").cast("string")).alias("text_key"),
            normalize_text(
                F.concat(F.col("text"), F.lit(" incremental batch marker "),
                         F.col("doc_id").cast("string"))
            ).alias("norm"),
        )
    )

    results = []
    for rep in replicates:
        tag = f"{os.path.basename(sf_dir.rstrip('/'))}_incr_x{rep}"
        sig_path = os.path.join(cache_root, f"sigs_{tag}.parquet")
        if not os.path.exists(sig_path):
            # corpus store build (untimed, cached): distinct texts with a
            # per-replica variant suffix -> rep x |docs| distinct texts
            reps = spark.range(rep).select(F.col("id").cast("int").alias("rep"))
            corpus_texts = docs.crossJoin(reps).select(
                F.concat(F.lit("c"), F.col("doc_id").cast("string"),
                         F.lit("r"), F.col("rep").cast("string")).alias("text_key"),
                normalize_text(
                    F.when(F.col("rep") == 0, F.col("text")).otherwise(
                        F.concat(F.col("text"), F.lit(" corpus variant "),
                                 F.col("rep").cast("string"))
                    )
                ).alias("norm"),
            )
            tmp = sig_path + ".tmp"
            with_signatures(
                corpus_texts, CFG, text_col="norm", id_col="text_key",
                pre_normalized=True,
            ).write.mode("overwrite").parquet(tmp)
            os.rename(tmp, sig_path)
        corpus_sigs = spark.read.parquet(sig_path)
        n_corpus = corpus_sigs.count()
        corpus_blocks = explode_bands(corpus_sigs, id_col="text_key")
        # previous assignment: committed identity labels (label == min id
        # convention; fresh corpus with no prior merges)
        prev = corpus_sigs.select(
            F.col("text_key").alias("clip_id"),
            F.col("text_key").alias("cluster_id"),
        )

        with open("/proc/loadavg") as f:
            load_before = float(f.read().split()[0])

        # ================= timed per-batch core =========================
        t0 = time.time()
        batch_sigs = with_signatures(
            batch, CFG, text_col="norm", id_col="text_key",
            pre_normalized=True,
        ).cache()
        batch_blocks = explode_bands(batch_sigs, id_col="text_key")
        pairs = incremental_pairs_from_blocks(
            batch_blocks, corpus_blocks, ["band_id", "band_hash"],
            CFG.bucket_cap, "mh", id_col="text_key",
        )
        est = estimated_jaccard_udf()
        s1 = corpus_sigs.unionByName(batch_sigs).select(
            F.col("text_key").alias("id1"), F.col("sig").alias("_s1"))
        s2 = corpus_sigs.unionByName(batch_sigs).select(
            F.col("text_key").alias("id2"), F.col("sig").alias("_s2"))
        edges = (
            pairs.join(s1, "id1").join(s2, "id2")
            .where(est(F.col("_s1"), F.col("_s2")) >= CFG.jaccard_threshold)
            .select("id1", "id2")
        )
        new_nodes = batch_sigs.select(F.col("text_key").alias("clip_id"))
        # the REAL operator: contracted-graph CC -> batch-sized
        # (mapping, new_assign) delta (connected_components.cluster_delta)
        mapping, new_assign = cluster_delta(prev, edges, new_nodes, CFG)
        mapping = mapping.localCheckpoint()
        new_assign = new_assign.localCheckpoint()
        n_pairs = pairs.count()
        n_mapping = mapping.count()
        core_wall = time.time() - t0

        # ============ corpus-sized relabel (reported separately) ========
        t1 = time.time()
        out_dir = tempfile.mkdtemp(prefix="lsh_incr_out_", dir=work_root)
        updated = apply_mapping(prev, mapping).unionByName(new_assign)
        updated.write.mode("overwrite").parquet(os.path.join(out_dir, "assign"))
        relabel_wall = time.time() - t1

        # ===== merge-on-read read path vs the folded table (r4) =========
        # same full-scan aggregate over (a) the folded parquet base and
        # (b) the ClusterStore view on top of it; the delta here is the
        # batch's new_assign and the mapping is the composed remap
        folded = spark.read.parquet(os.path.join(out_dir, "assign"))
        t2 = time.time()
        ref = folded.agg(
            F.count("*").alias("n"),
            F.count_distinct("cluster_id").alias("k"),
        ).collect()[0]
        base_read_wall = time.time() - t2
        store = ClusterStore(folded.where(~F.col("clip_id").startswith("newb")))
        store.mapping = mapping
        store.delta = new_assign
        t3 = time.time()
        got = store.current().agg(
            F.count("*").alias("n"),
            F.count_distinct("cluster_id").alias("k"),
        ).collect()[0]
        view_read_wall = time.time() - t3
        assert (got["n"], got["k"]) == (ref["n"], ref["k"]), (
            "merge-on-read view diverged from the folded table"
        )
        shutil.rmtree(out_dir, ignore_errors=True)
        batch_sigs.unpersist()

        with open("/proc/loadavg") as f:
            load_after = float(f.read().split()[0])
        row = {
            "metric": "incremental_batch_wall",
            "value": round(core_wall, 2),
            "unit": "sec",
            "n_corpus_texts": n_corpus,
            "n_batch": n_batch,
            "n_pairs": n_pairs,
            "n_mapping": n_mapping,
            "relabel_wall": round(relabel_wall, 2),
            "base_read_wall": round(base_read_wall, 2),
            "view_read_wall": round(view_read_wall, 2),
            "read_overhead": round(view_read_wall / max(base_read_wall, 1e-9), 3),
            "cpus": cpus,
            "config_id": CFG.config_id,
            "loadavg": [load_before, load_after],
        }
        results.append(row)
        print(json.dumps(row))

    if len(results) >= 2:
        flat = results[-1]["value"] / results[0]["value"]
        print(json.dumps({
            "metric": "incremental_flatness",
            "corpus_sizes": [r["n_corpus_texts"] for r in results],
            "core_walls": [r["value"] for r in results],
            "relabel_walls": [r["relabel_wall"] for r in results],
            "read_overheads": [r["read_overhead"] for r in results],
            "wall_ratio_largest_vs_smallest": round(flat, 3),
        }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
