#!/usr/bin/env python
"""A/B micro-bench: pairs_from_blocks kernel variants on the real bench
corpus bands (throwaway experiment harness, not part of the pipeline).

Variants:
  join   -- pre-r4 self-join emission (left/right projections of pruned)
  expand -- r4 groupBy + collect_set + in-array (i<j) expansion

Both run dedup=False + union_candidates-style groupBy count so the
timed work includes the downstream dedup shuffle shape.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
from locality_sensitive_hashing_spark.operators.minhash import (
    explode_bands,
    with_signatures,
)
from locality_sensitive_hashing_spark.operators.textgroup import (
    distinct_texts,
    with_content_keys,
)
from locality_sensitive_hashing_spark.session import get_spark


def emit_join(blocks, key_cols, cap, id_col):
    sizes = blocks.groupBy(*key_cols).agg(F.count("*").alias("n"))
    eligible = sizes.where((F.col("n") > 1) & (F.col("n") <= cap)).select(*key_cols)
    pruned = blocks.join(eligible, key_cols)
    left = pruned.select(*key_cols, F.col(id_col).alias("id1"))
    right = pruned.select(*key_cols, F.col(id_col).alias("id2"))
    return (
        left.join(right, key_cols)
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )


def emit_expand(blocks, key_cols, cap, id_col):
    sizes = blocks.groupBy(*key_cols).agg(F.count("*").alias("n"))
    eligible = sizes.where((F.col("n") > 1) & (F.col("n") <= cap)).select(*key_cols)
    pruned = blocks.join(eligible, key_cols)
    grouped = pruned.groupBy(*key_cols).agg(
        F.array_sort(F.collect_set(id_col)).alias("_ids")
    )
    return grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(_ids, (x, i) -> "
                "transform(slice(_ids, i + 2, size(_ids) - i - 1), "
                "y -> struct(x AS id1, y AS id2))))"
            )
        ).alias("_p")
    ).select("_p.id1", "_p.id2")


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", app_name="lsh-ab-pairs",
                      shuffle_partitions=max(cpus, 8))
    clips = spark.read.parquet("/tmp/lsh_bench_cache/clips_sf0.1_x20.parquet")
    texts = distinct_texts(with_content_keys(clips))
    sig_path = "/tmp/lsh_bench_cache/ab_sigs.parquet"
    if not os.path.exists(sig_path):
        with_signatures(
            texts, CFG, text_col="norm", id_col="text_key", pre_normalized=True
        ).write.mode("overwrite").parquet(sig_path)
    sigs = spark.read.parquet(sig_path)

    fns = {"join": emit_join, "expand": emit_expand}
    order = ["join", "expand", "join", "expand", "join", "expand"]
    for name in order:
        blocks = explode_bands(sigs, id_col="text_key")
        t0 = time.time()
        pairs = fns[name](blocks, ["band_id", "band_hash"], CFG.bucket_cap,
                          "text_key")
        n = pairs.groupBy("id1", "id2").agg(F.count("*")).count()
        print(f"{name}: {time.time() - t0:.2f}s n={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
