"""Non-default Config end-to-end: parameters actually thread through.

The reference exposes shingle type/size, num_hashes = bands x rows, and
the hash modulus as user parameters (SURVEY.md section 1.1); a config
value silently ignored somewhere (UDF closure, oracle, banding) would
still pass the default-config suite, so this sweeps one alternative
config through the full pipeline vs the oracle.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.fixtures import make_clips
from locality_sensitive_hashing_spark.oracle import run_oracle
from locality_sensitive_hashing_spark.plans.pipeline import DedupPipeline
from locality_sensitive_hashing_spark.sources.tables import CLIPS_SCHEMA, TableIO

ALT = Config(
    shingle_k=4,
    num_hashes=64,
    bands=16,
    rows_per_band=4,
    seed=7,
    jaccard_threshold=0.4,
    bucket_cap=32,
    hamming_t=2,
    sa_min_len=24,
)


@pytest.fixture(scope="module")
def alt_run(spark):
    clips_pd, _ = make_clips(80, seed=13)
    oracle = run_oracle(clips_pd, ALT)
    tmp = tempfile.mkdtemp(prefix="lsh_alt_")
    io = TableIO(spark, tmp)
    clusters = DedupPipeline(
        spark, ALT, io, run_id="alt"
    ).run(spark.createDataFrame(clips_pd, schema=CLIPS_SCHEMA))
    yield io, clusters, oracle
    shutil.rmtree(tmp, ignore_errors=True)


def test_alt_config_signatures(alt_run):
    io, _, oracle = alt_run
    got = io.read("signatures").toPandas().sort_values("text_key").reset_index(drop=True)
    exp = oracle.signatures.sort_values("text_key").reset_index(drop=True)
    assert list(got.text_key) == list(exp.text_key)
    for g, e in zip(got.sig, exp.sig):
        assert len(g) == ALT.num_hashes
        assert list(g) == list(e)
    # band arrays sized by the alt banding
    assert all(len(b) == ALT.bands for b in got.band_hashes)


def test_alt_config_clusters(alt_run):
    _, clusters, oracle = alt_run
    got = clusters.toPandas().sort_values("clip_id").reset_index(drop=True)
    exp = oracle.clusters.sort_values("clip_id").reset_index(drop=True)
    assert (got.cluster_id.values == exp.cluster_id.values).all()


WORD = Config(shingle_type="word", shingle_k=3)


@pytest.fixture(scope="module")
def word_run(spark):
    """Full pipeline WORD-shingled (the reference's shingle_type switch)."""
    clips_pd, _ = make_clips(80, seed=13)
    oracle = run_oracle(clips_pd, WORD)
    tmp = tempfile.mkdtemp(prefix="lsh_word_")
    io = TableIO(spark, tmp)
    clusters = DedupPipeline(
        spark, WORD, io, run_id="word"
    ).run(spark.createDataFrame(clips_pd, schema=CLIPS_SCHEMA))
    yield io, clusters, oracle
    shutil.rmtree(tmp, ignore_errors=True)


def test_word_shingle_signatures_match_oracle(word_run):
    io, _, oracle = word_run
    got = io.read("signatures").toPandas().sort_values("text_key").reset_index(drop=True)
    exp = oracle.signatures.sort_values("text_key").reset_index(drop=True)
    assert list(got.text_key) == list(exp.text_key)
    for g, e in zip(got.sig, exp.sig):
        assert list(g) == list(e)


def test_word_shingle_clusters_match_oracle(word_run):
    _, clusters, oracle = word_run
    got = clusters.toPandas().sort_values("clip_id").reset_index(drop=True)
    exp = oracle.clusters.sort_values("clip_id").reset_index(drop=True)
    assert (got.cluster_id.values == exp.cluster_id.values).all()


def test_word_shingles_differ_from_char():
    from locality_sensitive_hashing_spark import hashing as H

    t = "the quick brown fox jumps over the lazy dog"
    w = H.shingle_set(t, 3, "word")
    c = H.shingle_set(t, 3, "char")
    assert len(w) == 7  # 9 tokens -> 7 distinct trigrams
    assert set(w.tolist()).isdisjoint(set(c.tolist()))
    # shorter than n tokens -> sentinel {0}
    assert H.shingle_set("one two", 3, "word").tolist() == [0]


def test_alt_config_distinct_from_default(alt_run):
    """Different config -> different config_id -> separate snapshots."""
    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG

    assert ALT.config_id != DEFAULT_CONFIG.config_id


def test_salted_repartition_spreads(spark):
    """O24: salting splits one hot key across multiple partitions."""
    import pandas as pd
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG
    from locality_sensitive_hashing_spark.operators.candidates import (
        salted_repartition,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"key": ["hot"] * 1000, "clip_id": [f"c{i}" for i in range(1000)]})
    )
    plain = df.repartition(8, "key").select(
        F.spark_partition_id().alias("p")
    ).distinct().count()
    salted = salted_repartition(
        df, DEFAULT_CONFIG, "key", salt_from="clip_id", n_partitions=8
    ).select(
        F.spark_partition_id().alias("p")
    ).distinct().count()
    assert plain == 1  # the skew problem
    assert salted > 4  # the fix
