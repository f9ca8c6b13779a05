"""Similarity search over embedding columns (training-data pipeline ops).

Two paths over an (id, array<float>) table:

- :func:`brute_force_topk` -- exact cosine top-k per query vector, pure
  JVM (zip_with/aggregate dot products + window rank). The baseline and
  the small-N answer.
- :func:`lsh_ann_topk` -- random-hyperplane LSH (sign-bit signatures,
  banded into buckets -- Charikar 2002 rounding scheme, the same banding
  machinery as the text detectors) -> exact cosine only within shared
  buckets -> top-k per query. The scale path: candidate generation is
  linear + per-bucket bounded, reusing pairs_from_blocks' caps.

Hyperplanes are seeded numpy, embedded as literal JVM arrays -- no Python
in the scoring path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.operators.candidates import pairs_from_blocks


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    """JVM cosine similarity of two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _prep(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )


def brute_force_topk(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k neighbors per vector: (query_id, neighbor_id,
    cosine, rank). O(N^2) -- baseline / verification oracle for the LSH
    path."""
    e1 = _prep(emb, id_col, vec_col).withColumnRenamed("_id", "query_id")
    e2 = (
        _prep(emb, id_col, vec_col)
        .withColumnRenamed("_id", "neighbor_id")
        .withColumnRenamed("_v", "_w")
    )
    scored = (
        e1.crossJoin(e2)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("_v"), F.col("_w")))
        .drop("_v", "_w")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Seeded Gaussian hyperplanes (n_planes, dim) for sign-bit LSH."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def with_sign_buckets(
    emb: DataFrame,
    planes: np.ndarray,
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band_id, bucket) -- sign bits of hyperplane projections,
    grouped into `bands` integer bucket keys. Pure JVM: each projection is
    a zip_with/aggregate against a literal plane array."""
    n_planes, _dim = planes.shape
    assert n_planes % bands == 0
    rb = n_planes // bands
    v = F.col(vec_col).cast("array<double>")
    bits = [
        (_dot(v, F.array(*[F.lit(float(x)) for x in planes[i]])) > 0).cast("int")
        for i in range(n_planes)
    ]
    buckets = F.array(
        *[
            sum(bits[b * rb + j] * F.lit(2**j) for j in range(rb)).alias(f"b{b}")
            for b in range(bands)
        ]
    )
    return emb.select(
        F.col(id_col).alias("_id"), F.posexplode(buckets).alias("band_id", "bucket")
    ).withColumnRenamed("_id", id_col)


def lsh_ann_topk(
    emb: DataFrame,
    k: int,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    bucket_cap: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH buckets -> exact cosine on
    co-bucketed candidates -> top-k per query.

    Recall knob: more bands (OR-amplification) raises candidate recall;
    rows-per-band (n_planes/bands) controls precision (angle ~ fraction of
    differing sign bits, Charikar 2002).
    """
    dim = len(emb.select(vec_col).head()[0])
    planes = hyperplanes(dim, n_planes, seed)
    blocks = with_sign_buckets(emb, planes, bands, id_col, vec_col)
    cand = pairs_from_blocks(
        blocks, ["band_id", "bucket"], bucket_cap, "ann", id_col=id_col
    ).drop("detector")
    # candidates are unordered pairs; score once, emit both directions
    e1 = _prep(emb, id_col, vec_col).withColumnRenamed("_id", "id1")
    e2 = (
        _prep(emb, id_col, vec_col)
        .withColumnRenamed("_id", "id2")
        .withColumnRenamed("_v", "_w")
    )
    scored = (
        cand.join(e1, "id1").join(e2, "id2")
        .withColumn("cosine", cosine(F.col("_v"), F.col("_w")))
        .select("id1", "id2", "cosine")
    )
    both = scored.select(
        F.col("id1").alias("query_id"), F.col("id2").alias("neighbor_id"), "cosine"
    ).unionByName(
        scored.select(
            F.col("id2").alias("query_id"), F.col("id1").alias("neighbor_id"), "cosine"
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    bucket_cap: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1, id2, cosine >= threshold)
    via the LSH candidate path -- the embedding leg of a multi-detector
    dedup sweep."""
    dim = len(emb.select(vec_col).head()[0])
    planes = hyperplanes(dim, n_planes, seed)
    blocks = with_sign_buckets(emb, planes, bands, id_col, vec_col)
    cand = pairs_from_blocks(
        blocks, ["band_id", "bucket"], bucket_cap, "ann", id_col=id_col
    )
    e1 = _prep(emb, id_col, vec_col).withColumnRenamed("_id", "id1")
    e2 = (
        _prep(emb, id_col, vec_col)
        .withColumnRenamed("_id", "id2")
        .withColumnRenamed("_v", "_w")
    )
    return (
        cand.join(e1, "id1").join(e2, "id2")
        .withColumn("cosine", F.round(cosine(F.col("_v"), F.col("_w")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )
