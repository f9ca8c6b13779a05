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
    BatchIngestor,
    committed_batch_ids,
    compact_batches,
    incremental_signatures,
    read_batch,
    read_store,
    streaming_dup_counts,
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

    sigs1 = read_store(spark, out_dir, "signatures").toPandas()
    n_first = len(sigs1)
    assert n_first > 0

    # second micro-batch file: 10 repeated clips (same texts -> NO new
    # signatures for them) + the remaining 30 new ones
    second = clips.iloc[half - 10 :]
    _write_batch(second, os.path.join(in_dir, "batch1.parquet"))
    q2 = incremental_signatures(spark, in_dir, out_dir, cfg, checkpoint_dir=ckpt)
    q2.awaitTermination(120)

    sigs2 = read_store(spark, out_dir, "signatures").toPandas()
    # one row per distinct text overall; no duplicate text_keys
    assert sigs2.text_key.is_unique
    assert len(sigs2) >= n_first
    keyed = read_store(spark, out_dir, "keyed").toPandas()
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


def test_batch_replay_is_idempotent(spark, cfg):
    """A replayed micro-batch (same batch_id) must not duplicate rows --
    neither after a clean commit nor after a simulated mid-batch crash
    that left partial output (ADVICE round 1)."""
    out_dir = tempfile.mkdtemp(prefix="lsh_replay_")
    clips, _ = make_clips(30, seed=3)
    df = spark.createDataFrame(clips)
    ing = BatchIngestor(spark, out_dir, cfg)

    ing.process(df, 0)
    keyed0 = read_store(spark, out_dir, "keyed").toPandas()
    sigs0 = read_store(spark, out_dir, "signatures").toPandas()

    ing.process(df, 0)  # clean replay: marker no-op
    assert read_store(spark, out_dir, "keyed").count() == len(keyed0)

    # simulated crash replay of batch 1: partial subdir written (keyed +
    # signatures), NO marker -> reprocess must overwrite, not duplicate,
    # and must still emit batch-1 signatures (its own partial subdir must
    # not suppress them via the anti-join)
    clips2, _ = make_clips(20, seed=4)
    df2 = spark.createDataFrame(clips2)
    marker = ing._marker(1)
    ing.process(df2, 1)
    assert os.path.exists(marker)
    os.remove(marker)  # pretend the crash hit before the commit point
    ing.process(df2, 1)
    keyed = read_store(spark, out_dir, "keyed").toPandas()
    sigs = read_store(spark, out_dir, "signatures").toPandas()
    assert len(keyed) == len(keyed0) + len(clips2)
    assert sigs.text_key.is_unique
    assert set(sigs.text_key) == set(keyed.text_key)
    assert len(sigs) > len(sigs0)
    shutil.rmtree(out_dir, ignore_errors=True)


def test_manifest_compaction_preserves_commit_protocol(spark, cfg):
    """compact_batches folds marker files into _batches/MANIFEST; after
    compaction (a) the committed set is unchanged, (b) read_store /
    read_batch see the same rows, (c) a replay of a compacted batch still
    no-ops, and (d) an UNCOMMITTED batch stays invisible even though its
    data subdir exists."""
    out_dir = tempfile.mkdtemp(prefix="lsh_compact_")
    ing = BatchIngestor(spark, out_dir, cfg)
    clips0, _ = make_clips(20, seed=5)
    clips1, _ = make_clips(15, seed=6)
    ing.process(spark.createDataFrame(clips0), 0)
    ing.process(spark.createDataFrame(clips1), 1)
    before = read_store(spark, out_dir, "keyed").toPandas()

    n = compact_batches(out_dir)
    assert n == 2
    markers = os.path.join(out_dir, "_batches")
    assert sorted(os.listdir(markers)) == ["MANIFEST"]  # markers folded
    assert committed_batch_ids(out_dir) == {0, 1}

    after = read_store(spark, out_dir, "keyed").toPandas()
    assert len(after) == len(before)
    assert read_batch(spark, out_dir, "keyed", 0).count() > 0

    # replay of a compacted batch: marker file is gone, manifest must
    # still make it a no-op (row count unchanged)
    ing.process(spark.createDataFrame(clips0), 0)
    assert read_store(spark, out_dir, "keyed").count() == len(before)

    # crash-partial batch 2: subdirs exist, no marker -> invisible
    marker2 = ing._marker(2)
    clips2, _ = make_clips(10, seed=7)
    ing.process(spark.createDataFrame(clips2), 2)
    os.remove(marker2)
    assert committed_batch_ids(out_dir) == {0, 1}
    assert read_store(spark, out_dir, "keyed").count() == len(before)
    try:
        read_batch(spark, out_dir, "keyed", 2)
        raise AssertionError("uncommitted batch must not be readable")
    except FileNotFoundError:
        pass
    # a second compaction keeps the uncommitted batch out of the manifest
    assert compact_batches(out_dir) == 2
    shutil.rmtree(out_dir, ignore_errors=True)


def test_auto_compaction_bounds_marker_dir(spark, cfg):
    """The ingest commit path auto-folds markers every cfg.compact_every
    commits (VERDICT r3 item 3): after ingesting > K batches the marker
    dir holds < K per-batch files, every batch stays committed, reads see
    every row, and replays of folded batches still no-op."""
    import dataclasses

    out_dir = tempfile.mkdtemp(prefix="lsh_autocompact_")
    small = dataclasses.replace(cfg, compact_every=3)
    ing = BatchIngestor(spark, out_dir, small)
    n_rows = 0
    for b in range(7):
        clips, _ = make_clips(6, seed=100 + b)
        # distinct ids per batch so keyed rows are disjoint
        clips["clip_id"] = [f"b{b}_{c}" for c in clips["clip_id"]]
        ing.process(spark.createDataFrame(clips), b)
        markers = os.path.join(out_dir, "_batches")
        n_markers = sum(1 for d in os.listdir(markers) if d.isdigit())
        assert n_markers < small.compact_every  # never grows past K
        n_rows += len(clips)
    assert committed_batch_ids(out_dir) == set(range(7))
    assert read_store(spark, out_dir, "keyed").count() == n_rows
    # replay of a folded batch must no-op via the manifest
    clips, _ = make_clips(6, seed=100)
    clips["clip_id"] = [f"b0_{c}" for c in clips["clip_id"]]
    ing.process(spark.createDataFrame(clips), 0)
    assert read_store(spark, out_dir, "keyed").count() == n_rows
    shutil.rmtree(out_dir, ignore_errors=True)


def test_compaction_concurrent_commit_survives(spark, cfg, monkeypatch):
    """ADVICE r3 (medium): a batch committed between compact_batches'
    marker snapshot and its unlink loop must KEEP its marker -- unlinking
    it would permanently drop a committed batch from reads, because the
    new manifest was written before the late commit existed."""
    from locality_sensitive_hashing_spark.streaming import incremental as inc

    out_dir = tempfile.mkdtemp(prefix="lsh_concurrent_")
    ing = BatchIngestor(spark, out_dir, cfg)
    clips, _ = make_clips(5, seed=9)
    ing.process(spark.createDataFrame(clips), 0)
    markers = os.path.join(out_dir, "_batches")

    real = inc.committed_batch_ids

    def racy(path):
        ids = real(path)  # runs AFTER the marker snapshot in compact_batches
        open(os.path.join(markers, "99"), "w").close()  # concurrent commit
        return ids

    monkeypatch.setattr(inc, "committed_batch_ids", racy)
    inc.compact_batches(out_dir)
    monkeypatch.undo()

    # the late marker survived the unlink loop and the batch stays visible
    assert os.path.exists(os.path.join(markers, "99"))
    assert committed_batch_ids(out_dir) == {0, 99}


def test_compact_batches_empty_store_noop(tmp_path):
    """ADVICE r3 (low): compacting a store with no batches yet must be a
    0-returning no-op, not a FileNotFoundError."""
    assert compact_batches(str(tmp_path)) == 0


def test_streaming_dup_counts_stateful(spark, cfg):
    """applyInPandasWithState keeps per-text_key counts ACROSS
    micro-batches: a transcript seen in batch 0 and again in batch 1 must
    report n_seen=2 with the batch-0 clip as first_clip_id."""
    root = tempfile.mkdtemp(prefix="lsh_state_")
    in_dir, out_dir = os.path.join(root, "in"), os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(in_dir)

    import pandas as pd

    def clip(cid, text):
        return {"clip_id": cid, "bytes": b"\x00" * 8, "sr_hz": 8000,
                "dur_ms": 10, "codec": "pcm_s16le", "transcript": text}

    # batch file 0: a, b; batch file 1: a again (exact dup) + c
    _write_batch(pd.DataFrame([clip("c0", "alpha beta"), clip("c1", "gamma")]),
                 os.path.join(in_dir, "f0.parquet"))
    _write_batch(pd.DataFrame([clip("c2", "alpha beta"), clip("c3", "delta")]),
                 os.path.join(in_dir, "f1.parquet"))

    q = streaming_dup_counts(spark, in_dir, out_dir, checkpoint_dir=ckpt,
                             max_files_per_trigger=1)
    q.awaitTermination(120)

    upd = spark.read.parquet(os.path.join(out_dir, "dup_counts")).toPandas()
    latest = upd.groupby("text_key").n_seen.max()
    from locality_sensitive_hashing_spark import hashing as H
    import hashlib

    tk = hashlib.sha256(H.normalize_text("alpha beta").encode()).hexdigest()[:32]
    assert latest[tk] == 2  # state crossed the micro-batch boundary
    assert (upd[(upd.text_key == tk) & (upd.n_seen == 2)]
            .first_clip_id == "c0").all()
    assert set(latest.index) == set(upd.text_key)
    assert sorted(latest) == [1, 1, 2]
    shutil.rmtree(root, ignore_errors=True)


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
