"""Key-index membership bench: per-batch probe cost vs corpus growth.

Builds intake stores at corpus sizes N, 2N, 4N (distinct transcripts),
then measures the membership step for ONE fixed probe batch two ways:

- legacy: left_anti against the corpus key column (what the ingest path
  did before streaming/keyindex.py) -- the build side grows linearly
  with the corpus;
- index: key_index_probe over the folded base + pending deltas -- the
  scan is bounded by the probe's touched kb buckets.

Reported per corpus size: wall seconds for both paths and the exact
index rows matching the touched-bucket filter (`idx_rows`, the rows the
anti-join build side actually receives) vs the corpus key count
(`corpus_keys`, what the legacy path feeds).  idx_rows/corpus_keys ~
touched/P by uniform hashing; wall at this tiny scale is overhead-bound
and reported for honesty, the structural evidence is the row ratio.

Usage: SPARK_GRAFT_CPUS=8 python bench_keyindex.py
Writes one JSON line; prose summary in BENCH/KEYINDEX.md.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.fixtures import make_clips
from locality_sensitive_hashing_spark.operators.textgroup import with_content_keys
from locality_sensitive_hashing_spark.session import get_spark
from locality_sensitive_hashing_spark.streaming.incremental import (
    BatchIngestor,
    read_store,
)
from locality_sensitive_hashing_spark.streaming.keyindex import (
    _kb,
    _read_manifest,
    fold_key_index,
    key_index_probe,
)


def build_store(spark, cfg, n_clips: int, n_batches: int = 4) -> str:
    out = tempfile.mkdtemp(prefix=f"lsh_kidx_bench_{n_clips}_")
    ing = BatchIngestor(spark, out, cfg, audio=False, substring=False)
    per = n_clips // n_batches
    for b in range(n_batches):
        clips, _ = make_clips(per, seed=7000 + b)
        clips["clip_id"] = [f"b{b}_{c}" for c in clips["clip_id"]]
        ing.process(spark.createDataFrame(clips), b)
    fold_key_index(spark, out, "text", cfg.key_index_buckets)
    return out


def measure(spark, cfg, store: str, probe_df) -> dict:
    corpus_keys_df = read_store(spark, store, "signatures").select("text_key")
    t0 = time.monotonic()
    legacy_new = probe_df.join(corpus_keys_df, "text_key", "left_anti").count()
    legacy_wall = time.monotonic() - t0

    t0 = time.monotonic()
    idx_new = key_index_probe(
        spark, store, "text", probe_df, cfg.key_index_buckets
    ).count()
    idx_wall = time.monotonic() - t0
    assert idx_new == legacy_new, (idx_new, legacy_new)

    # exact build-side row counts: what each anti-join scans
    corpus_keys = corpus_keys_df.count()
    touched = [
        r[0]
        for r in probe_df.select(
            _kb(F.col("text_key"), cfg.key_index_buckets).alias("kb")
        ).distinct().collect()
    ]
    base, _ = _read_manifest(store, "text")
    idx_rows = (
        spark.read.parquet(os.path.join(store, "keyidx_text", base))
        .where(F.col("kb").isin(touched))
        .count()
    )
    return {
        "corpus_keys": corpus_keys,
        "idx_rows": idx_rows,
        "scan_ratio": round(idx_rows / max(1, corpus_keys), 4),
        "touched_buckets": len(touched),
        "legacy_wall_s": round(legacy_wall, 3),
        "index_wall_s": round(idx_wall, 3),
        "new_keys": idx_new,
    }


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n0 = int(os.environ.get("KIDX_N0", "4000"))
    probe_n = int(os.environ.get("KIDX_PROBE", "64"))
    buckets = int(os.environ.get("KIDX_BUCKETS", "4096"))
    spark = get_spark(f"local[{cpus}]", shuffle_partitions=cpus)
    cfg = Config(key_index_buckets=buckets)

    probe_clips, _ = make_clips(probe_n, seed=9999)
    probe = (
        with_content_keys(spark.createDataFrame(probe_clips))
        .groupBy("text_key").agg(F.min("norm").alias("norm"))
        .localCheckpoint()
    )

    sizes, results = [n0, 2 * n0, 4 * n0], {}
    stores = []
    try:
        for n in sizes:
            store = build_store(spark, cfg, n)
            stores.append(store)
            results[str(n)] = measure(spark, cfg, store, probe)
    finally:
        for s in stores:
            shutil.rmtree(s, ignore_errors=True)
    print(json.dumps({
        "metric": "keyindex_probe",
        "unit": "rows+sec",
        "buckets": buckets,
        "probe_keys": probe_n,
        "cpus": cpus,
        "sizes": results,
    }))


if __name__ == "__main__":
    main()
