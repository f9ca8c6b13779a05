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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.functions.text import (
    normalize_text,
    word_shingles,
    word_tokens,
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


# --------------------------------------------------------------------------
# Repetition & boilerplate filters (Gopher / C4 / RefinedWeb style)
# --------------------------------------------------------------------------

def ngram_doc_freq(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(ngram, doc_freq): corpus document frequency of distinct
    normalized word n-grams.

    The corpus-frequency table behind boilerplate detection (C4's
    three-sentence dedup, RefinedWeb's repeated-line screens, operate on
    exactly this statistic at their own granularities).  One explode +
    one partial-aggregated groupBy -- the same shuffle shape as
    ``shingle_counts``: map-side combine bounds shuffle rows by the
    per-partition DISTINCT gram count, and the result is linear in
    corpus n-gram volume.  ``array_distinct`` before the explode makes
    the count a true DOCUMENT frequency (a gram repeated inside one doc
    counts once).
    """
    return (
        docs.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles(normalize_text(text_col), n))
            ).alias("ngram"),
        )
        .groupBy("ngram")
        .agg(F.count("*").alias("doc_freq"))
    )


def boilerplate_coverage(
    docs: DataFrame,
    n: int,
    min_df: int,
    heavy_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document boilerplate coverage: (id, n_grams, n_common,
    common_frac, boilerplate_heavy).

    ``common_frac`` is the fraction of the document's DISTINCT word
    n-grams whose corpus document frequency is >= ``min_df`` -- the
    template/boilerplate screen a web-scale pipeline runs to drop pages
    that are mostly navigation chrome, license headers, or mirrored
    templates.  Scale shape: the common-gram set is bounded by
    (total distinct-gram occurrences) / min_df, so at a production
    ``min_df`` it is tiny relative to the corpus and is BROADCAST back
    for the per-doc count (the same corpus-never-shuffles-into-the-join
    property as decontamination); the corpus pays one groupBy(ngram)
    for the frequency table and one partial-aggregated groupBy(id) of
    the (rare) common hits.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_shingles(normalize_text(text_col), n))
        ).alias("ngram"),
    )
    common = (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("doc_freq"))
        .where(F.col("doc_freq") >= min_df)
        .select("ngram")
    )
    per_doc = (
        grams.join(F.broadcast(common), "ngram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_common"))
    )
    totals = docs.select(
        F.col(id_col),
        F.size(
            F.array_distinct(word_shingles(normalize_text(text_col), n))
        ).cast("int").alias("n_grams"),
    )
    n_common = F.coalesce(F.col("n_common"), F.lit(0)).cast("int")
    frac = F.when(
        F.col("n_grams") > 0,
        F.round(n_common.cast("double") / F.col("n_grams"), 6),
    ).otherwise(F.lit(0.0))
    return (
        totals.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_grams"),
            n_common.alias("n_common"),
            frac.alias("common_frac"),
            (frac >= heavy_frac).alias("boilerplate_heavy"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    n: int,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document maximal corpus-repeated spans -- the CUT-LIST of
    exact substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", at word-n-gram
    granularity): (id, n_tokens, n_spans, covered_tokens, covered_frac).

    A token position i is *repeated* when the document's n-gram starting
    there occurs in >= ``min_df`` DISTINCT documents; the token
    intervals [i, i+n) of repeated positions merge into maximal spans
    (overlap-merge, gaps-and-islands).  Where :func:`boilerplate_coverage`
    reports a per-doc FRACTION of common grams, this operator reports
    the positional spans themselves -- the thing a dedup pass actually
    cuts: span count and exact covered-token mass per document.

    Scale shape: one corpus groupBy(ngram) for document frequencies
    (map-side combined; count_distinct over (ngram, id) pairs that a
    prior distinct bounds); the repeated-gram set is bounded by
    (gram occurrences) / min_df and is BROADCAST back onto the
    positional gram stream, so the corpus never shuffles into that
    join; the island merge is one window per document over its HIT
    positions only (hits are rare at production min_df), then one
    hash aggregate.  Equal interval lengths make the running-max end
    monotone in position, so the island test is a single lag
    comparison inside one window sort.
    """
    toks = word_tokens(normalize_text(text_col))
    grams = docs.select(
        F.col(id_col),
        F.posexplode(word_shingles(normalize_text(text_col), n)).alias(
            "pos", "ngram"
        ),
    )
    rep = (
        grams.select(id_col, "ngram").distinct()
        .groupBy("ngram").agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .select("ngram")
    )
    hits = grams.join(F.broadcast(rep), "ngram", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    # intervals [pos, pos+n-1] all have length n, so ordered by pos the
    # running max end is the previous pos + n - 1: a new span starts
    # exactly when this hit's interval clears the previous one
    new_span = F.when(
        F.lag("pos").over(w).isNull()
        | (F.col("pos") > F.lag("pos").over(w) + F.lit(n - 1)),
        F.lit(1),
    ).otherwise(F.lit(0))
    spans = (
        hits.withColumn("_ns", new_span)
        .withColumn(
            "_sid",
            F.sum("_ns").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(id_col, "_sid")
        .agg((F.max("pos") - F.min("pos") + F.lit(n)).alias("_len"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_spans"),
            F.sum("_len").cast("int").alias("covered_tokens"),
        )
    )
    base = docs.select(
        F.col(id_col), F.size(toks).cast("int").alias("n_tokens")
    )
    cov = F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("int")
    frac = F.when(
        F.col("n_tokens") > 0,
        F.round(cov.cast("double") / F.col("n_tokens"), 6),
    ).otherwise(F.lit(0.0))
    return base.join(spans, id_col, "left").select(
        F.col(id_col),
        F.col("n_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("int").alias("n_spans"),
        cov.alias("covered_tokens"),
        frac.alias("covered_frac"),
    )


def repetition_metrics(
    docs: DataFrame,
    top_n: int = 2,
    dup_n: int = 3,
    top_frac_max: float = 0.2,
    dup_frac_max: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style WITHIN-document repetition screens (Rae et al. 2021
    table A1 analogues at word granularity): (id, n_words,
    top_ngram_frac, dup_ngram_frac, repetitive).

    - ``top_ngram_frac``: words covered by the single most frequent
      ``top_n``-gram, ``least(1, count * top_n / n_words)`` (overlapping
      occurrences can cover more than the doc, hence the cap).  Only the
      modal COUNT is needed, so there is no tie-break hazard.
    - ``dup_ngram_frac``: fraction of ``dup_n``-gram POSITIONS whose
      gram occurs more than once in the document,
      ``(positions - distinct) / positions`` -- 0 for docs shorter than
      ``dup_n`` words.
    - ``repetitive``: either fraction over its threshold -- the discard
      flag a pretraining pipeline applies before dedup.

    Scale shape: ``dup_ngram_frac`` and ``n_words`` are pure Column
    expressions over the scan (zero exchange); the modal count is one
    partial-aggregated groupBy(id, gram) -> max per id -- shuffle rows
    bounded by per-partition distinct (id, gram) pairs, i.e. corpus
    token volume, never pairs.
    """
    norm = docs.select(F.col(id_col), normalize_text(text_col).alias("_nrm"))
    toks = word_tokens(F.col("_nrm"))
    base = norm.select(
        F.col(id_col),
        F.size(toks).cast("int").alias("n_words"),
        F.greatest(F.size(toks) - F.lit(dup_n - 1), F.lit(0)).alias("_t"),
        F.size(
            F.array_distinct(word_shingles(F.col("_nrm"), dup_n))
        ).alias("_d"),
    )
    top = (
        norm.select(
            F.col(id_col),
            F.explode(word_shingles(F.col("_nrm"), top_n)).alias("g"),
        )
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_c"))
    )
    top_frac = F.round(
        F.least(
            F.lit(1.0),
            F.coalesce(F.col("top_c"), F.lit(0)).cast("double")
            * top_n / F.col("n_words"),
        ),
        6,
    )
    dup_frac = F.when(
        F.col("_t") > 0,
        F.round((F.col("_t") - F.col("_d")).cast("double") / F.col("_t"), 6),
    ).otherwise(F.lit(0.0))
    return base.join(top, id_col, "left").select(
        F.col(id_col),
        F.col("n_words"),
        top_frac.alias("top_ngram_frac"),
        dup_frac.alias("dup_ngram_frac"),
        ((top_frac > top_frac_max) | (dup_frac > dup_frac_max)).alias(
            "repetitive"
        ),
    )


# --------------------------------------------------------------------------
# corpus assembly: output sharding + token-budget selection
# --------------------------------------------------------------------------

def shard_assignment(
    docs: DataFrame, n_shards: int, salt: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic output-shard assignment: (id, shard) with
    shard = u mod n_shards, u the salted-sha256 uniform of
    :func:`sample_uniform`.

    The sink-side partner of the dedup keep-list: a 100 TB training
    corpus is written as N fixed shards, and hashing the DOCUMENT id
    (not the partition id, not monotonically_increasing_id) makes the
    layout reproducible across runs/engines/partitionings and
    statistically balanced regardless of input order or skew.  Pure
    Column expression -- the write becomes repartition(n_shards,
    "shard") with no extra pass over the data.
    """
    u = sample_uniform(id_col, salt)
    return docs.select(
        F.col(id_col), (u % n_shards).cast("int").alias("shard")
    )


def budget_select(
    docs: DataFrame,
    budget_tokens: int,
    salt: str,
    bin_div: int = 10_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-ranked selection under a token budget: keep the
    highest-quality documents whose token counts sum to ~``budget_tokens``
    (the data-mixing step that assembles a training set of a target size
    from a larger curated pool).

    A global quality sort + running sum does not scale (single ordered
    cumsum over the corpus), so selection is BIN-granular two-pass:

    1. aggregate token counts by quality bin (``quality_score`` micro
       units // bin_div, <= ~101 bins) -- one map-side-combined shuffle
       to a tiny table;
    2. a window cumsum over the bins (tiny, driver-scale) marks each bin
       TAKE (fits entirely), PARTIAL (the boundary bin: straddles the
       budget), or DROP, and the boundary bin keeps each doc with
       probability (budget - tokens_above) / bin_tokens via the same
       deterministic salted-sha256 Bernoulli as :func:`stratified_sample`
       -- so the result is reproducible and each pass is one scan.

    Returns (id, q_bin, n_tokens, selected).  Expected selected tokens =
    budget up to boundary-bin sampling variance (documented contract; an
    EXACT cut would need the global sort this avoids).
    """
    from locality_sensitive_hashing_spark.functions.text import (
        normalize_text,
        quality_score,
        token_count,
    )
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col),
        # explicit floor: Spark double->int casts truncate but DuckDB's
        # round -- floor() keeps the bin edge identical on both engines
        F.floor(quality_score("text") / F.lit(bin_div)).cast("int").alias("q_bin"),
        token_count("text").alias("n_tokens"),
    )
    bins = base.groupBy("q_bin").agg(
        F.sum("n_tokens").alias("bin_tokens")
    )
    w = (
        Window.orderBy(F.desc("q_bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = bins.select(
        "q_bin", "bin_tokens",
        F.coalesce(F.sum("bin_tokens").over(w), F.lit(0)).alias("above"),
    ).select(
        "q_bin",
        F.when(
            F.col("above") + F.col("bin_tokens") <= budget_tokens, F.lit(1.0)
        )
        .when(F.col("above") >= budget_tokens, F.lit(0.0))
        .otherwise(
            (F.lit(float(budget_tokens)) - F.col("above"))
            / F.col("bin_tokens")
        )
        .alias("keep_rate"),
    )
    u = sample_uniform(id_col, salt)
    return base.join(F.broadcast(binned), "q_bin").select(
        F.col(id_col), "q_bin", "n_tokens",
        (u.cast("double") < F.col("keep_rate") * F.lit(4294967296.0)).alias(
            "selected"
        ),
    )


# --------------------------------------------------------------------------
# Unigram-LM quality scoring (CCNet-style proxy)
# --------------------------------------------------------------------------

def unigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram language-model score: average bits per token,
    -1/n * sum log2 p(w), with p(w) the corpus maximum-likelihood unigram.

    The LM-perplexity quality signal of CCNet/Gopher with the model the
    corpus itself trains in one aggregate: gibberish and rare-token noise
    score HIGH bits/token, boilerplate scores LOW — the two tails a
    curation pass trims.  Fully deterministic (no external model, no
    smoothing: every scored token is in the corpus, so p(w) > 0).

    Shape at scale: tf aggregate (one shuffle by (doc, token)), corpus
    counts (map-side-combined shuffle by token), tf x counts join by
    token, final per-doc aggregate — the standard TF-IDF relational
    template, every stage linear.  The single corpus-total row is
    broadcast.  Returns (id, n_tokens, bits_per_token) for ALL docs;
    token-less docs score 0.0.  bits_per_token is rounded to 6 dp: the
    per-token log2 values may differ by ULPs across engines' libm and
    the per-doc sum order is engine-private (same contract as the audio
    rms column).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(word_tokens(normalize_text(text_col))).alias("w"),
    ).where(F.col("w") != "")
    tf = toks.groupBy(id_col, "w").agg(F.count("*").alias("tf"))
    cnt = toks.groupBy("w").agg(F.count("*").alias("c"))
    tot = toks.agg(F.count("*").alias("t_total"))
    sc = (
        tf.join(cnt, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(
                F.col("tf") * (F.log2("t_total") - F.log2("c"))
            ).alias("bits"),
        )
    )
    return (
        docs.select(id_col)
        .join(sc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round(
                F.coalesce(F.col("bits") / F.col("n_tokens"), F.lit(0.0)), 6
            ).alias("bits_per_token"),
        )
    )


def doc_top_terms(
    docs: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document distinctive-term extraction: the ``top_n`` terms
    ranked by (tf DESC, df ASC, term ASC) — "most frequent, most
    document-specific" — the integer-exact form of TF-IDF keyword
    extraction (the log in idf is monotone in 1/df, so ranking by df
    ascending at equal tf picks the same winners without a single
    float: no libm, no rounding contract, hash-exact on any engine).
    Stopwords need no list: their df ~ corpus size demotes them at any
    tie.

    Shape at scale: the standard TF-IDF relational template — tf
    aggregate (shuffle by (doc, term)), document frequency from the tf
    table itself (map-side-combined shuffle by term; tf rows are
    distinct (doc, term) so count(*) IS df), tf x df join by term, and
    a per-doc top-k window. Every stage linear; the window's partial
    sort is bounded by per-doc vocabulary.  Returns (id, rank, term,
    tf, df).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(word_tokens(normalize_text(text_col))).alias("w"),
    ).where(F.col("w") != "")
    tf = toks.groupBy(id_col, "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("w")
    )
    return (
        tf.join(dfreq, "w")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(F.col(id_col), "rank", F.col("w").alias("term"), "tf", "df")
    )


def weighted_sample_keys(
    docs: DataFrame,
    weight: F.Column,
    salt: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Efraimidis–Spirakis A-ES keys for weighted sampling WITHOUT
    replacement (Efraimidis & Spirakis 2006, "Weighted random sampling
    with a reservoir"), carried in the DOUBLE-LOG domain:
    ``es_key = ln(-ln(u)) - ln(w)`` with u uniform in (0, 1) — a
    monotone transform of the classic u^(1/w), so the k rows with the
    SMALLEST keys are an exact PPSWOR sample of size k.

    Why double-log (ADVICE r4): the classic key u^(1/w) saturates at
    1.000000 under 6-dp rounding once w exceeds ~10^6, silently
    de-weighting every heavy row at corpus-stats scale; 6 dp in the
    double-log domain is RELATIVE resolution, scale-free in w (adding
    ln(10^6) merely shifts the key by ~13.8).

    u derives from the same salted-sha256 uniform as every sampler here
    (``(uh + 0.5) / 2^32`` — the +0.5 keeps u strictly inside (0, 1) so
    neither ln sees 0; Spark's ``log`` returns NULL at 0 where DuckDB
    returns -inf, so the open interval is also the cross-engine
    contract).  Keys are rounded to 6 dp (libm log may differ by ULPs
    across engines; ties at the rounded key break by id).  Rows with
    weight <= 0 are excluded (they can never be sampled).

    Returns (id, weight, es_key).  Selecting the k SMALLEST by
    (es_key ASC, id) plans as TakeOrderedAndProject — per-partition
    partial top-k then a k-row merge, NO corpus shuffle — and the keys
    are MERGEABLE: top-k of a union equals top-k over the per-shard
    top-k's (the distributed-reservoir property; pinned by test).
    """
    u = (sample_uniform(id_col, salt) + F.lit(0.5)).cast("double") / F.lit(
        4294967296.0
    )
    w = weight.cast("double")
    return (
        docs.select(F.col(id_col), w.alias("weight"))
        .where(F.col("weight") > 0)
        .withColumn(
            "es_key",
            F.round(F.log(-F.log(u)) - F.log(F.col("weight")), 6),
        )
    )


def weighted_sample(
    docs: DataFrame,
    weight: F.Column,
    k: int,
    salt: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """The k-row PPSWOR sample itself: the k SMALLEST rows of
    :func:`weighted_sample_keys` by (es_key ASC, id ASC)."""
    return (
        weighted_sample_keys(docs, weight, salt, id_col)
        .orderBy(F.asc("es_key"), F.asc(id_col))
        .limit(k)
    )


def zorder_key(d1: F.Column, d2: F.Column, bits: int = 10) -> F.Column:
    """Morton / Z-order key: interleave the low ``bits`` bits of two
    integer dimensions (d1 on even positions, d2 on odd).

    The multi-dimensional CLUSTERING key behind data-layout optimization
    (Delta/Iceberg OPTIMIZE ZORDER): writing a 100 TB table ordered by
    zorder_key(dim_a, dim_b) makes a range predicate on EITHER dimension
    prune to a bounded set of contiguous files, instead of choosing one
    sort dimension and scanning everything for the other.  Pure integer
    Column arithmetic (shift/and/or of 2*bits terms inside whole-stage
    codegen), exactly replayable in any engine -- no UDF, no floats.
    Inputs are masked to ``bits`` bits (callers cap/bucket their
    dimensions first; the mask keeps an out-of-range value from
    corrupting neighbors' bit positions).
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(d1.cast("long"), i).bitwiseAND(F.lit(1)),
                        2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(d2.cast("long"), i).bitwiseAND(F.lit(1)),
                        2 * i + 1)
        )
    return z


def zorder_key_sql(e1: str, e2: str, bits: int = 10) -> str:
    """The identical interleave as a SQL expression string (single
    source of truth with :func:`zorder_key` -- same loop, same bit
    positions), for the DuckDB oracle."""
    terms = []
    for i in range(bits):
        # every term fully parenthesized: DuckDB gives << and | the same
        # precedence (left-assoc), so a bare `a << 0 | b << 1` compounds
        # the shifts instead of OR-ing the terms
        terms.append(f"(((({e1}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({e2}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
