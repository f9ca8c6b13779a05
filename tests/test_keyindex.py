"""Intake key index: batch-scale membership (streaming/keyindex.py).

The contract under test: the index-backed probe is EXACTLY the legacy
corpus-scan anti-join (same new-key sets, store invariants unchanged),
while its scan is bounded by touched kb buckets + pending batch-scale
deltas, survives crash replay, folds crash-safely, and backfills legacy
(pre-index) stores.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.fixtures import make_clips
from locality_sensitive_hashing_spark.streaming.incremental import (
    BatchIngestor,
    committed_batch_ids,
    read_store,
)
from locality_sensitive_hashing_spark.streaming.keyindex import (
    KeyIndexUnavailable,
    _kb,
    _read_manifest,
    fold_key_index,
    key_index_probe,
)


def _texts_df(spark, clips):
    from locality_sensitive_hashing_spark.operators.textgroup import (
        with_content_keys,
    )

    return (
        with_content_keys(spark.createDataFrame(clips))
        .groupBy("text_key")
        .agg(F.min("norm").alias("norm"))
    )


def test_probe_equals_legacy_antijoin(spark, cfg):
    """Index probe == corpus-scan anti-join on the same committed store,
    for a probe batch mixing dup and new texts."""
    out = tempfile.mkdtemp(prefix="lsh_kidx_")
    ing = BatchIngestor(spark, out, cfg)
    c0, _ = make_clips(30, seed=21)
    c1, _ = make_clips(24, seed=22)
    ing.process(spark.createDataFrame(c0), 0)
    ing.process(spark.createDataFrame(c1), 1)

    # probe batch: 8 texts repeated from batch 0 + 12 brand-new
    import pandas as pd

    cn, _ = make_clips(12, seed=23)
    probe_clips = pd.concat([c0.iloc[:8], cn], ignore_index=True)
    probe = _texts_df(spark, probe_clips)

    got = key_index_probe(
        spark, out, "text", probe, cfg.key_index_buckets
    ).toPandas()
    legacy_keys = read_store(spark, out, "signatures").select("text_key")
    want = probe.join(legacy_keys, "text_key", "left_anti").toPandas()
    assert set(got.text_key) == set(want.text_key)
    assert len(want) > 0 and len(want) < len(probe.toPandas())
    shutil.rmtree(out, ignore_errors=True)


def test_ingest_through_index_preserves_store_invariants(spark, cfg):
    """Batches ingested THROUGH the index-backed membership path keep the
    one-row-per-distinct-key contract for both the text and audio
    stores, including a crash replay whose partial index delta must not
    feed its own probe."""
    out = tempfile.mkdtemp(prefix="lsh_kidx_ing_")
    ing = BatchIngestor(spark, out, cfg)
    c0, _ = make_clips(30, seed=31)
    half = c0.iloc[:15]
    ing.process(spark.createDataFrame(half), 0)
    # batch 1 repeats 5 of batch 0's clips + 15 new
    import pandas as pd

    b1 = pd.concat([c0.iloc[10:]], ignore_index=True)
    ing.process(spark.createDataFrame(b1), 1)

    sigs = read_store(spark, out, "signatures").toPandas()
    keyed = read_store(spark, out, "keyed").toPandas()
    assert sigs.text_key.is_unique
    assert set(sigs.text_key) == set(keyed.text_key)
    energy = read_store(spark, out, "energy").toPandas()
    assert energy.audio_key.is_unique
    assert set(energy.audio_key) == set(keyed.audio_key)

    # crash replay of batch 2: full run, strip the marker, re-run -- the
    # orphaned keyidx delta of batch 2 must not suppress its own keys
    c2, _ = make_clips(10, seed=32)
    ing.process(spark.createDataFrame(c2), 2)
    os.remove(ing._marker(2))
    ing.process(spark.createDataFrame(c2), 2)
    sigs2 = read_store(spark, out, "signatures").toPandas()
    keyed2 = read_store(spark, out, "keyed").toPandas()
    assert sigs2.text_key.is_unique
    assert set(sigs2.text_key) == set(keyed2.text_key)
    assert len(sigs2) > len(sigs)
    shutil.rmtree(out, ignore_errors=True)


def test_fold_compacts_deltas_and_probe_stays_exact(spark, cfg):
    """Auto-fold (ingest > compact_every batches): deltas fold into a
    versioned base, the manifest records coverage, pending dirs shrink,
    and the probe result is unchanged."""
    out = tempfile.mkdtemp(prefix="lsh_kidx_fold_")
    small = dataclasses.replace(cfg, compact_every=3)
    ing = BatchIngestor(spark, out, small)
    all_clips = []
    for b in range(5):
        clips, _ = make_clips(8, seed=300 + b)
        clips["clip_id"] = [f"b{b}_{c}" for c in clips["clip_id"]]
        all_clips.append(clips)
        ing.process(spark.createDataFrame(clips), b)

    base, covered = _read_manifest(out, "text")
    assert base is not None and base.startswith("base_v")
    assert covered  # at least the first fold's batches
    # folded deltas are gone; pending dirs bounded by compact_every
    pending_dirs = [
        d for d in os.listdir(os.path.join(out, "keyidx_text"))
        if d.startswith("b")
    ]
    assert len(pending_dirs) < 2 * small.compact_every

    # probe across base + pending == legacy anti-join
    import pandas as pd

    new, _ = make_clips(6, seed=399)
    probe_clips = pd.concat([all_clips[0].iloc[:4], new], ignore_index=True)
    probe = _texts_df(spark, probe_clips)
    got = key_index_probe(
        spark, out, "text", probe, small.key_index_buckets
    ).toPandas()
    want = probe.join(
        read_store(spark, out, "signatures").select("text_key"),
        "text_key", "left_anti",
    ).toPandas()
    assert set(got.text_key) == set(want.text_key)
    # index contents == committed signature keys exactly (both kinds)
    for kind, table, col in (("text", "signatures", "text_key"),
                             ("audio", "energy", "audio_key")):
        b, cov = _read_manifest(out, kind)
        prefix = f"keyidx_{kind}"
        dirs = [os.path.join(out, prefix, b)] if b else []
        dirs += [
            os.path.join(out, prefix, f"b{i}")
            for i in committed_batch_ids(out) - cov
            if os.path.isdir(os.path.join(out, prefix, f"b{i}"))
        ]
        idx = spark.read.parquet(*dirs).toPandas()
        store = read_store(spark, out, table).toPandas()
        assert sorted(idx.key) == sorted(store[col])

    # base grace: each fold keeps exactly one superseded base (in-flight
    # external readers of the just-replaced manifest), clears older
    fold_key_index(spark, out, "text", small.key_index_buckets)
    fold_key_index(spark, out, "text", small.key_index_buckets)
    bases = sorted(
        d for d in os.listdir(os.path.join(out, "keyidx_text"))
        if d.startswith("base_v")
    )
    cur, _ = _read_manifest(out, "text")
    vcur = int(cur.rsplit("_v", 1)[1])
    assert cur in bases and len(bases) <= 2
    assert all(int(b.rsplit("_v", 1)[1]) >= vcur - 1 for b in bases)
    shutil.rmtree(out, ignore_errors=True)


def test_legacy_store_backfill(spark, cfg):
    """A store ingested before the index existed: the probe refuses
    (falls back to legacy inside BatchIngestor), one fold backfills
    coverage from the feature stores, and the probe then works and is
    exact."""
    out = tempfile.mkdtemp(prefix="lsh_kidx_legacy_")
    ing = BatchIngestor(spark, out, cfg)
    c0, _ = make_clips(20, seed=41)
    ing.process(spark.createDataFrame(c0), 0)
    # simulate a pre-index store: drop the index dirs the ingest wrote
    shutil.rmtree(os.path.join(out, "keyidx_text"), ignore_errors=True)
    shutil.rmtree(os.path.join(out, "keyidx_audio"), ignore_errors=True)

    probe = _texts_df(spark, c0.iloc[:5])
    try:
        key_index_probe(spark, out, "text", probe, cfg.key_index_buckets)
        raise AssertionError("uncovered legacy store must refuse the probe")
    except KeyIndexUnavailable:
        pass

    # ...but the INGEST path still works (falls back to the corpus scan):
    import pandas as pd

    c1, _ = make_clips(10, seed=42)
    b1 = pd.concat([c0.iloc[:5], c1], ignore_index=True)
    ing.process(spark.createDataFrame(b1), 1)
    sigs = read_store(spark, out, "signatures").toPandas()
    assert sigs.text_key.is_unique

    # fold backfills batch 0's keys from the signature/energy stores
    assert fold_key_index(spark, out, "text", cfg.key_index_buckets) == 2
    assert fold_key_index(spark, out, "audio", cfg.key_index_buckets) == 2
    got = key_index_probe(
        spark, out, "text", probe, cfg.key_index_buckets
    ).toPandas()
    assert len(got) == 0  # all 5 are batch-0 dups
    shutil.rmtree(out, ignore_errors=True)


def test_probe_scan_is_bucket_pruned(spark, cfg):
    """The structural claim: with P buckets, a 1-key probe consults only
    the index rows sharing that key's bucket -- about corpus/P of the
    base, not the corpus (plus the kb IN filter is pushed to parquet,
    where kb-sorted row groups prune)."""
    out = tempfile.mkdtemp(prefix="lsh_kidx_prune_")
    big = dataclasses.replace(cfg, key_index_buckets=32)
    ing = BatchIngestor(spark, out, big, audio=False, substring=False)
    c0, _ = make_clips(200, seed=51)
    ing.process(spark.createDataFrame(c0), 0)
    ing.process(spark.createDataFrame(c0.iloc[:1]), 1)  # force index use
    fold_key_index(spark, out, "text", big.key_index_buckets)

    probe = _texts_df(spark, c0.iloc[:1])
    kb_val = probe.select(
        _kb(F.col("text_key"), big.key_index_buckets).alias("kb")
    ).collect()[0][0]
    base, _ = _read_manifest(out, "text")
    base_df = spark.read.parquet(os.path.join(out, "keyidx_text", base))
    n_total = base_df.count()
    n_touched = base_df.where(F.col("kb") == kb_val).count()
    assert n_total >= 150  # ~200 clips minus planted dup classes
    assert n_touched <= n_total // 4  # one bucket of 32
    # and the pushed filter appears in the scan plan
    plan = base_df.where(F.col("kb").isin([kb_val]))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PushedFilters" in plan and "kb" in plan
    shutil.rmtree(out, ignore_errors=True)
