"""Structured Streaming: incremental signature intake + windowed events."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from locality_sensitive_hashing_spark import hashing as H
from locality_sensitive_hashing_spark.fixtures import make_clips
from locality_sensitive_hashing_spark.streaming.incremental import (
    incremental_signatures,
    streaming_event_counts,
)


_CLIPS_PA_SCHEMA = pa.schema([
    ("clip_id", pa.string()), ("bytes", pa.binary()),
    ("sr_hz", pa.int32()), ("dur_ms", pa.int32()),
    ("codec", pa.string()), ("transcript", pa.string()),
])


def _write_batch(pdf, path):
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=_CLIPS_PA_SCHEMA, preserve_index=False),
        path,
    )


def test_incremental_signatures(spark, cfg):
    root = tempfile.mkdtemp(prefix="lsh_stream_")
    in_dir = os.path.join(root, "in")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(in_dir)

    clips, _ = make_clips(60, seed=11)
    half = len(clips) // 2
    _write_batch(clips.iloc[:half], os.path.join(in_dir, "batch0.parquet"))

    q = incremental_signatures(spark, in_dir, out_dir, cfg, checkpoint_dir=ckpt)
    q.awaitTermination(120)

    sigs1 = spark.read.parquet(os.path.join(out_dir, "signatures")).toPandas()
    n_first = len(sigs1)
    assert n_first > 0

    # second micro-batch file: 10 repeated clips (same texts -> NO new
    # signatures for them) + the remaining 30 new ones
    second = clips.iloc[half - 10 :]
    _write_batch(second, os.path.join(in_dir, "batch1.parquet"))
    q2 = incremental_signatures(spark, in_dir, out_dir, cfg, checkpoint_dir=ckpt)
    q2.awaitTermination(120)

    sigs2 = spark.read.parquet(os.path.join(out_dir, "signatures")).toPandas()
    # one row per distinct text overall; no duplicate text_keys
    assert sigs2.text_key.is_unique
    assert len(sigs2) >= n_first
    keyed = spark.read.parquet(os.path.join(out_dir, "keyed")).toPandas()
    assert len(keyed) == half + len(second)  # one row per ingested file row
    # all distinct texts of the corpus are covered exactly once
    assert set(keyed.text_key) == set(sigs2.text_key)

    # signatures computed through the stream match the shared kernel
    a, b = H.hash_family(cfg)
    row = sigs2.iloc[0]
    expect = H.minhash_signature(
        H.shingle_set(row["norm"], cfg.shingle_k), a, b, cfg.modulo_prime
    )
    assert list(row["sig"]) == expect.tolist()


def test_streaming_event_counts(spark):
    # file-source streams need a DIRECTORY; stage the driver file into one
    d = tempfile.mkdtemp(prefix="lsh_events_")
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                os.path.join(d, "events.parquet"))
    q = streaming_event_counts(spark, d, watermark="1 hour", window="1 hour")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM event_counts").toPandas()
    assert len(out) > 0
    assert set(out.columns) == {"window_start", "event_type", "n_events", "sum_value"}
    # cross-check total counts against a batch read (append mode emits only
    # windows closed by the watermark, so stream <= batch)
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy("event_type").count().toPandas()
    )
    got_totals = out.groupby("event_type").n_events.sum()
    for et, n in got_totals.items():
        assert n <= int(batch[batch.event_type == et]["count"].iloc[0])
