"""Training-data curation operators (operators/curation.py):
decontamination, SemDeDup, deterministic stratified sampling."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
from locality_sensitive_hashing_spark.operators.curation import (
    benchmark_ngrams,
    contamination_report,
    sample_uniform,
    semantic_dedup,
    semantic_dup_pairs,
    stratified_sample,
)


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def test_contamination_counts_distinct_overlap(spark):
    """Hit count = DISTINCT shared n-grams; zero-hit and too-short docs
    survive with 0 / not contaminated."""
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    docs = _docs(spark, [
        # full containment: 3 distinct 3-grams, all in the benchmark
        (1, "the quick brown fox jumps"),
        # repeated contaminated gram counts ONCE
        (2, "the quick brown ... the quick brown"),
        # clean
        (3, "entirely different words here now"),
        # shorter than n -> no grams at all
        (4, "two words"),
        # empty
        (5, ""),
    ])
    grams = benchmark_ngrams(bench, 3)
    got = (
        contamination_report(docs, grams, 3, min_hits=1)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.loc[1, "n_hit_ngrams"] == 3 and bool(got.loc[1, "contaminated"])
    assert got.loc[2, "n_hit_ngrams"] == 1 and bool(got.loc[2, "contaminated"])
    assert got.loc[3, "n_hit_ngrams"] == 0 and not got.loc[3, "contaminated"]
    assert got.loc[4, "n_hit_ngrams"] == 0 and not got.loc[4, "contaminated"]
    assert got.loc[5, "n_hit_ngrams"] == 0 and not got.loc[5, "contaminated"]
    assert len(got) == 5  # every input doc reported exactly once


def test_contamination_min_hits_threshold(spark):
    """min_hits raises the bar without changing the counts."""
    bench = _docs(spark, [(100, "a b c d e f")])
    docs = _docs(spark, [(1, "a b c d"), (2, "a b c x y z")])
    grams = benchmark_ngrams(bench, 3)
    got = (
        contamination_report(docs, grams, 3, min_hits=2)
        .toPandas().set_index("doc_id")
    )
    assert got.loc[1, "n_hit_ngrams"] == 2 and bool(got.loc[1, "contaminated"])
    assert got.loc[2, "n_hit_ngrams"] == 1 and not got.loc[2, "contaminated"]


def test_contamination_normalizes_before_matching(spark):
    """Case/punctuation noise must not hide a verbatim benchmark leak."""
    bench = _docs(spark, [(100, "Answer: forty two exactly!")])
    docs = _docs(spark, [(1, "...ANSWER   forty TWO exactly")])
    grams = benchmark_ngrams(bench, 4)
    got = contamination_report(docs, grams, 4).toPandas()
    assert got.n_hit_ngrams.iloc[0] >= 1 and bool(got.contaminated.iloc[0])


# --------------------------------------------------------------------------
# SemDeDup
# --------------------------------------------------------------------------

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id: long, embedding: array<double>",
    )


def test_semantic_dedup_groups_and_keep(spark):
    """Two tight semantic groups + a singleton: components labeled by min
    vec_id, exactly one keep per group, singleton keeps itself."""
    rng = np.random.default_rng(7)
    a = rng.standard_normal(16)
    b = rng.standard_normal(16)
    vecs = [
        a, a + 0.001 * rng.standard_normal(16),        # group {0,1}
        b, b + 0.001 * rng.standard_normal(16),
        b + 0.001 * rng.standard_normal(16),           # group {2,3,4}
        -a + 0.5 * b,                                  # singleton
    ]
    emb = _emb_df(spark, vecs)
    # one cell: the pair graph alone must separate the groups
    cells = emb.select("vec_id", F.lit(0).alias("cell"))
    got = (
        semantic_dedup(emb, cells, 0.99, CFG)
        .toPandas().set_index("vec_id").sort_index()
    )
    assert got.sem_group.tolist() == [0, 0, 2, 2, 2, 5]
    assert got.keep.tolist() == [True, False, True, False, False, True]


def test_semantic_dedup_cells_bound_candidacy(spark):
    """Identical vectors in DIFFERENT cells never pair: the cell
    partition is the SemDeDup contract (quadratic work stays in-cell)."""
    v = [1.0] + [0.0] * 7
    emb = _emb_df(spark, [v, v, v])
    cells = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "vec_id: long, cell: int"
    )
    pairs = semantic_dup_pairs(emb, cells, 0.9).toPandas()
    assert sorted(map(tuple, pairs[["id1", "id2"]].values.tolist())) == [(0, 1)]
    got = semantic_dedup(emb, cells, 0.9, CFG).toPandas().set_index("vec_id")
    assert got.loc[2, "sem_group"] == 2 and bool(got.loc[2, "keep"])


def test_semantic_dedup_transitive_within_cell(spark):
    """A chain a~b~c (a!~c directly) collapses into ONE group -- the
    connected-components semantics SemDeDup needs (pair-local keep rules
    would keep both endpoints)."""
    # unit vectors at 0, ~20 and ~40 degrees: cos(20deg)=.94, cos(40deg)=.77
    def at(deg):
        r = np.deg2rad(deg)
        return [float(np.cos(r)), float(np.sin(r))] + [0.0] * 6

    emb = _emb_df(spark, [at(0), at(20), at(40)])
    cells = emb.select("vec_id", F.lit(0).alias("cell"))
    got = semantic_dedup(emb, cells, 0.9, CFG).toPandas().sort_values("vec_id")
    assert got.sem_group.tolist() == [0, 0, 0]
    assert got.keep.tolist() == [True, False, False]


# --------------------------------------------------------------------------
# stratified sampling
# --------------------------------------------------------------------------

def _sample_docs(spark, n=3000):
    langs = ["en", "es", "zh"]
    return spark.createDataFrame(
        pd.DataFrame({
            "doc_id": range(n),
            "lang": [langs[i % 3] for i in range(n)],
        })
    )


def test_stratified_sample_matches_hashlib_exactly(spark):
    """The keep decision is a pure function of (salt, id, rate):
    recompute it row-by-row with hashlib and require EXACT agreement --
    the reproducibility contract a 100 TB sample depends on."""
    rates = {"en": 0.25, "es": 0.5}
    docs = _sample_docs(spark, 600)
    got = (
        stratified_sample(docs, rates, 1.0, "mix-v1:")
        .toPandas().set_index("doc_id").sort_index()
    )
    for doc_id, row in got.iterrows():
        u = int(hashlib.sha256(f"mix-v1:{doc_id}".encode()).hexdigest()[:8], 16)
        rate = rates.get(row["lang"], 1.0)
        assert bool(row["sampled"]) == (u < rate * 2**32), doc_id


def test_stratified_sample_rates_and_determinism(spark):
    """Per-stratum empirical rates land near the targets; default-rate
    strata are kept whole; two runs select the identical row set."""
    rates = {"en": 0.25, "es": 0.5}
    docs = _sample_docs(spark)
    r1 = stratified_sample(docs, rates, 1.0, "s:").toPandas()
    r2 = stratified_sample(docs, rates, 1.0, "s:").toPandas()
    pd.testing.assert_frame_equal(
        r1.sort_values("doc_id").reset_index(drop=True),
        r2.sort_values("doc_id").reset_index(drop=True),
    )
    frac = r1.groupby("lang").sampled.mean()
    assert abs(frac["en"] - 0.25) < 0.06
    assert abs(frac["es"] - 0.50) < 0.06
    assert frac["zh"] == 1.0


def test_sample_uniform_range_and_salt_independence(spark):
    """u lies in [0, 2^32); changing the salt reshuffles the draw (two
    salted samples are independent -- the property that lets a pipeline
    take non-overlapping splits)."""
    docs = _sample_docs(spark, 500)
    got = docs.select(
        sample_uniform("doc_id", "a:").alias("ua"),
        sample_uniform("doc_id", "b:").alias("ub"),
    ).toPandas()
    assert (got.ua >= 0).all() and (got.ua < 2**32).all()
    corr = np.corrcoef(got.ua, got.ub)[0, 1]
    assert abs(corr) < 0.15


# --------------------------------------------------------------------------
# BPE-ish token counting (functions/text.py::bpe_token_count)
# --------------------------------------------------------------------------

def test_bpe_token_count_matches_python_regex(spark):
    """Java regexp_extract_all must tokenize exactly like the Python re
    module on the same pattern (the DuckDB oracle already pins RE2):
    three engines, one count."""
    import re

    from locality_sensitive_hashing_spark.functions.text import (
        BPE_REGEX,
        bpe_token_count,
    )

    texts = [
        "Hello, world! it's 42.5 degrees",
        "", "  ", "don't--stop", "a1b2", "ALL CAPS!!!",
        "tab\tnewline\nmix", "'s at start", "cafe au lait... 99 + 1 = 100",
        "a" * 500, "!?!?!?", "word " * 50,
    ]
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(texts)), "t": texts}))
    got = (
        df.select("i", bpe_token_count("t").alias("n"))
        .toPandas().set_index("i")["n"]
    )
    for i, t in enumerate(texts):
        assert got[i] == len(re.findall(BPE_REGEX, t)), repr(t)
