"""Evaluation & reporting (O27-O28): recall/precision + top-k pair report.

The reference exposed a results/eval page comparing found duplicates
against the expected set (REF?main.py report handler, UNVERIFIED -- empty
mount); here the same comparisons are semi/anti-joins over the pipeline's
verified table vs an expected-pairs table (the oracle fixtures or any
labeled set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_pairs(df: DataFrame) -> DataFrame:
    return df.select(
        F.least("id1", "id2").alias("id1"), F.greatest("id1", "id2").alias("id2")
    ).distinct()


def pair_metrics(found: DataFrame, expected: DataFrame) -> dict:
    """Dup-pair recall/precision of `found` vs `expected` (both (id1,id2)).

    recall = |found AND expected| / |expected| -- the BASELINE.json >= 0.99
    gate; missed/spurious counts come from anti-joins so the numbers are
    auditable, not just ratios.
    """
    f = _norm_pairs(found)
    e = _norm_pairs(expected)
    n_expected = e.count()
    n_found = f.count()
    hit = f.join(e, ["id1", "id2"], "left_semi").count()
    missed = e.join(f, ["id1", "id2"], "left_anti").count()
    spurious = n_found - hit
    return {
        "n_expected": n_expected,
        "n_found": n_found,
        "n_hit": hit,
        "n_missed": missed,
        "n_spurious": spurious,
        "recall": hit / n_expected if n_expected else 1.0,
        "precision": hit / n_found if n_found else 1.0,
    }


def cluster_agreement(got: DataFrame, expected: DataFrame) -> dict:
    """Fraction of clips whose cluster assignment matches the expected
    (clip_id, cluster_id) table exactly (min-id labels on both sides)."""
    j = got.alias("g").join(expected.alias("e"), "clip_id")
    n = j.count()
    eq = j.where(F.col("g.cluster_id") == F.col("e.cluster_id")).count()
    return {"n_clips": n, "n_agree": eq, "agreement": eq / n if n else 1.0}


def topk_pairs_report(verified: DataFrame, k: int = 20) -> DataFrame:
    """k most-similar verified pairs for inspection (O28): deterministic
    order (est_jaccard desc, ids) -- Spark plans this as
    TakeOrderedAndProject, no full sort."""
    return (
        verified.where("is_dup")
        .select("id1", "id2", "kind", "est_jaccard", "snr_db")
        .orderBy(F.desc("est_jaccard"), "id1", "id2")
        .limit(k)
    )


def cluster_size_histogram(clusters: DataFrame) -> DataFrame:
    """(cluster_size, n_clusters) -- the dedup yield report."""
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("cluster_size")
    )
