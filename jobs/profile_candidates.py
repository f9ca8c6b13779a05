#!/usr/bin/env python
"""Per-detector profile of the candidates stage (throwaway experiment
harness): times each detector subtree alone, then the full union, on the
cached bench corpus. Run at SPARK_GRAFT_CPUS=8 and =32 to see which
subtree limits 8->32 scaling.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
from locality_sensitive_hashing_spark.operators.candidates import (
    pairs_from_blocks,
    union_candidates,
)
from locality_sensitive_hashing_spark.operators.minhash import (
    explode_bands,
    with_signatures,
)
from locality_sensitive_hashing_spark.operators.simhash import (
    simhash_candidates,
    with_fingerprint,
)
from locality_sensitive_hashing_spark.operators.suffix_array import sa_anchor_pairs
from locality_sensitive_hashing_spark.operators.textgroup import (
    distinct_texts,
    with_content_keys,
)
from locality_sensitive_hashing_spark.session import get_spark


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", app_name="lsh-prof-cand",
                      shuffle_partitions=max(cpus, 8))
    clips = spark.read.parquet("/tmp/lsh_bench_cache/clips_sf0.1_x20.parquet")
    texts = distinct_texts(with_content_keys(clips))
    sig_path = "/tmp/lsh_bench_cache/ab_sigs.parquet"
    if not os.path.exists(sig_path):
        with_signatures(
            texts, CFG, text_col="norm", id_col="text_key", pre_normalized=True
        ).write.mode("overwrite").parquet(sig_path)
    fp_path = "/tmp/lsh_bench_cache/ab_fps.parquet"
    if not os.path.exists(fp_path):
        with_fingerprint(
            texts, text_col="norm", id_col="text_key"
        ).write.mode("overwrite").parquet(fp_path)
    sigs = spark.read.parquet(sig_path)
    fps = spark.read.parquet(fp_path)

    def mh():
        return pairs_from_blocks(
            explode_bands(sigs, id_col="text_key"),
            ["band_id", "band_hash"], CFG.bucket_cap, "minhash",
            id_col="text_key", dedup=False,
        )

    def sh():
        return simhash_candidates(fps, CFG, id_col="text_key", dedup=False)

    def sa():
        return sa_anchor_pairs(sigs, CFG, id_col="text_key", dedup=False)

    def union_bitmask2(tagged):
        # tagged: list of (df, name)
        names = sorted(n for _, n in tagged)
        bit = {n: 1 << i for i, n in enumerate(names)}
        u = None
        for d, n in tagged:
            p = d.select("id1", "id2", F.lit(bit[n]).alias("_f"))
            u = p if u is None else u.unionByName(p)
        agg = u.groupBy("id1", "id2").agg(F.bit_or("_f").alias("_m"))
        arr = F.array(*[
            F.struct(F.lit(n).alias("n"), F.lit(bit[n]).alias("b"))
            for n in names
        ])
        return agg.select(
            "id1", "id2",
            F.transform(
                F.filter(arr, lambda s: F.col("_m").bitwiseAND(s["b"]) != 0),
                lambda s: s["n"],
            ).alias("detectors"),
        )

    subtrees = {"minhash": mh, "simhash": sh, "sa": sa}
    for rep in range(2):
        for name, fn in subtrees.items():
            t0 = time.time()
            n = fn().count()
            print(f"rep{rep} {name}: {time.time() - t0:.2f}s n={n}",
                  flush=True)
        t0 = time.time()
        n = union_candidates(mh(), sh(), sa()).count()
        print(f"rep{rep} union_all: {time.time() - t0:.2f}s n={n}", flush=True)
        t0 = time.time()
        n = union_bitmask2([(mh(), "minhash"), (sh(), "simhash"),
                            (sa(), "sa")]).count()
        print(f"rep{rep} union_bitmask: {time.time() - t0:.2f}s n={n}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
