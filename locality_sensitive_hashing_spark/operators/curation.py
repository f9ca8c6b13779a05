"""Training-data curation operators: benchmark decontamination, semantic
(embedding-space) dedup, and deterministic stratified sampling.

Three ops every large-scale training-data pipeline runs downstream of the
dedup detectors, each expressed so the heavy side never shuffles more than
it must:

- **Decontamination** (n-gram overlap vs an eval/benchmark set): the
  benchmark side is tiny by construction (eval sets are thousands of
  docs, the corpus is billions), so its distinct n-gram set is BROADCAST
  and the corpus side is one map-side semi-scan + a partial-aggregated
  groupBy(doc).  Published practice: GPT-3 appendix C / PaLM section 8
  style 8-gram collision screens.

- **Semantic dedup** (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
  k-means-style cells over embeddings, exact cosine only WITHIN a cell,
  duplicate groups = connected components of the >= tau pair graph, keep
  the lowest id per group.  Cells bound the quadratic term exactly like
  the LSH band buckets bound the text path (cap + loud drop accounting
  via the shared pairs_from_blocks kernel).

- **Stratified sampling / data mixing**: per-stratum Bernoulli keep
  decisions from a salted sha256 of the row id -- deterministic across
  runs, engines, and partitionings (no RNG state, no shuffle at all: a
  pure Column expression that survives any repartitioning and can be
  replayed relationally by the DuckDB oracle bit-for-bit).

REF? singhj/locality-sensitive-hashing has no curation layer (UNVERIFIED
-- mount empty, SURVEY.md section 0.1); these extend the task rubric's
training-data operator set, not the reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.functions.text import (
    normalize_text,
    word_shingles,
)
from locality_sensitive_hashing_spark.operators.candidates import pairs_from_blocks
from locality_sensitive_hashing_spark.operators.connected_components import (
    connected_components,
)


# --------------------------------------------------------------------------
# Decontamination
# --------------------------------------------------------------------------

def benchmark_ngrams(
    bench: DataFrame, n: int, text_col: str = "text"
) -> DataFrame:
    """Distinct normalized word n-grams of a benchmark/eval set.

    One column ``ngram``.  Meant to be broadcast: eval suites are a few
    MB of n-grams even for large benchmark batteries.
    """
    return (
        bench.select(
            F.explode(word_shingles(normalize_text(text_col), n)).alias("ngram")
        )
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench_grams: DataFrame,
    n: int,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark-overlap report: (id, n_hit_ngrams,
    contaminated).

    ``n_hit_ngrams`` counts the document's DISTINCT normalized word
    n-grams that also occur in the benchmark set; ``contaminated`` is
    ``n_hit_ngrams >= min_hits``.  The join is corpus x broadcast(bench):
    the corpus side is scanned once, the only shuffle is the
    partial-aggregated groupBy(id) of the (rare) hits, and docs with no
    hits never enter it (restored by the final left join against the
    id-only projection).
    """
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_shingles(normalize_text(text_col), n))
        ).alias("ngram"),
    )
    hit_counts = (
        doc_grams.join(F.broadcast(bench_grams), "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hit_counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hit_ngrams"), F.lit(0)).alias("n_hit_ngrams"),
            (F.coalesce(F.col("n_hit_ngrams"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup)
# --------------------------------------------------------------------------

def semantic_dup_pairs(
    emb: DataFrame,
    cells: DataFrame,
    tau: float,
    cell_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id1, id2, cosine) pairs with 6dp-rounded cosine >= tau, candidacy
    restricted to vectors sharing a cell.

    ``cells`` is an (id, cell) assignment (e.g. ``with_ivf_cells`` at
    nprobe=1 -- the SemDeDup clustering step).  Cells bound the quadratic:
    the self-join runs per cell, blocks over ``cell_cap`` are dropped by
    the shared capped-pair kernel (surfaced by ``dropped_blocks`` like
    every other detector).  Rounding before the threshold keeps a
    borderline pair from flipping between engines.
    """
    cand = pairs_from_blocks(
        cells.select(F.col(id_col), "cell"), ["cell"], cell_cap, "semdedup",
        id_col=id_col,
    ).drop("detector")
    from locality_sensitive_hashing_spark.operators.ann import _prep, cosine

    e1 = _prep(emb, id_col, vec_col).withColumnRenamed("_id", "id1")
    e2 = (
        _prep(emb, id_col, vec_col)
        .withColumnRenamed("_id", "id2")
        .withColumnRenamed("_v", "_w")
    )
    return (
        cand.join(e1, "id1")
        .join(e2, "id2")
        .withColumn("cosine", F.round(cosine(F.col("_v"), F.col("_w")), 6))
        .where(F.col("cosine") >= tau)
        .select("id1", "id2", "cosine")
    )


def semantic_dedup(
    emb: DataFrame,
    cells: DataFrame,
    tau: float,
    cfg: Config,
    cell_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup keep-list: (id, sem_group, keep).

    ``sem_group`` is the min id of the vector's semantic-duplicate
    component (connected components over the within-cell >= tau pair
    graph -- cells partition the graph, so components never span cells
    and the label propagation converges in O(log max-cell-diameter)
    rounds); ``keep`` marks the group representative.  Everything not in
    any >= tau pair keeps itself.
    """
    pairs = semantic_dup_pairs(
        emb, cells, tau, cell_cap, id_col=id_col, vec_col=vec_col
    )
    nodes = emb.select(F.col(id_col).alias("clip_id"))
    labels = connected_components(
        pairs.select(F.col("id1"), F.col("id2")), nodes, cfg
    )
    return labels.select(
        F.col("clip_id").alias(id_col),
        F.col("cluster_id").alias("sem_group"),
        (F.col("clip_id") == F.col("cluster_id")).alias("keep"),
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling
# --------------------------------------------------------------------------

def sample_uniform(id_col: str, salt: str) -> F.Column:
    """Deterministic uniform u in [0, 2^32) from a salted sha256 of the id.

    Pure Column expression (JVM sha2 + hex slice): no RNG state, no
    shuffle, identical on every engine that has sha256 -- the property
    that makes a 100 TB sample REPRODUCIBLE (re-running the job, or
    running it on a different partitioning, selects the same rows).
    """
    h = F.sha2(F.concat(F.lit(salt), F.col(id_col).cast("string")), 256)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    salt: str,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum Bernoulli sampling: (id, stratum, sampled).

    ``rates`` maps stratum value -> keep probability (the data-mixing
    knob: e.g. downsample dominant languages, keep all of rare ones);
    strata not in the map get ``default_rate``.  The decision is
    ``u / 2^32 < rate`` with ``u`` from :func:`sample_uniform` --
    per-row, deterministic, and embarrassingly parallel (the plan is a
    single Project over the scan; no exchange anywhere).
    """
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    u = sample_uniform(id_col, salt)
    return docs.select(
        F.col(id_col),
        F.col(stratum_col),
        (u.cast("double") < rate * F.lit(4294967296.0)).alias("sampled"),
    )
