"""Streaming sketches: deterministic HyperLogLog and Count-Min.

The 100 TB questions these answer in one bounded-memory pass: "how many
distinct shingles (or keys, or n-grams) does the corpus have?" (HLL —
the input LSH band/row planning and storage sizing need) and "how often
does this token/key occur?" (Count-Min — point-frequency estimates with
a one-sided >= guarantee, no per-key state).  The exact answers cost a
full shuffle of every distinct value; each sketch reads the stream ONCE,
keeps a few KB of state, and merges associatively (HLL: register-wise
max; CMS: cell-wise sum) — so the corpus-scale plan is a map-side
partial-aggregate to sketch-sized partials followed by one sketch-sized
shuffle, constant memory at any input size.

HyperLogLog (Flajolet et al. 2007) keeps m = 2^p registers; Count-Min
(Cormode & Muthukrishnan 2005) keeps d x w counters.

This implementation is DETERMINISTIC end-to-end (unlike Spark's built-in
`approx_count_distinct`, whose estimate is engine-private): registers are
derived from the repo's seed-pinned uint64 shingle hashes (top p bits =
register index, rank = leading zeros of the remaining 64-p bits + 1),
and the estimator is kept in INTEGER arithmetic (sum of 2^(S-M) at scale
S = 65-p) until a single literal-by-integer double division — so DuckDB
replays the whole sketch bit-for-bit and the driver hash-checks it.

The raw Flajolet estimator only (no small-range linear counting): the
corpus regime this targets has cardinality >> 2.5*m, and the correction's
`ln` is libm-dependent across engines.  Accuracy (~1.04/sqrt(m)) and
mergeability are pinned by unit tests against numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_P = 10  # 2^10 = 1024 registers -> ~3.3% standard error


def hll_alpha(m: int) -> float:
    """Bias-correction constant alpha_m (Flajolet et al. 2007, m >= 128)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(values: DataFrame, value_col: str, p: int = HLL_P) -> DataFrame:
    """(idx, M): the HLL register table of a uint64-hash column.

    idx = top p bits of the unsigned view; rank of one value = leading
    zeros of the remaining w = 64-p bits plus 1 (w == 0 ranks wbits+1);
    M = max rank per register.  Pure Column expressions — the aggregate
    is map-side combined to <= 2^p rows per partition, so the shuffle is
    O(m * partitions) regardless of input size, and two register tables
    merge by the same groupBy-max (the distributed-sketch property).
    """
    wbits = 64 - p
    mask = (1 << wbits) - 1
    w = F.col(value_col).bitwiseAND(F.lit(mask))
    rank = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        values.select(
            F.shiftrightunsigned(F.col(value_col), wbits).cast("int").alias("idx"),
            rank.cast("int").alias("rank"),
        )
        .groupBy("idx")
        .agg(F.max("rank").alias("M"))
    )


def hll_cardinality(
    values: DataFrame, value_col: str, p: int = HLL_P
) -> DataFrame:
    """One-row HLL cardinality report over a uint64-hash column.

    Returns (m, n_present, z_scaled, est_cardinality, exact_distinct,
    rel_err).  `z_scaled` is the estimator denominator kept exact in
    integers: sum over all m registers of 2^(S - M) with S = wbits+1 and
    absent registers at M = 0 — every term is a power of two <= 2^S, so
    the decimal sum is order-independent and cross-engine exact; the only
    float op is the final literal/integer division.  `exact_distinct` is
    the full-shuffle answer the sketch replaces, carried here as accuracy
    evidence (rel_err ~ 1.04/sqrt(m)); at production scale one runs the
    sketch alone.  `z_scaled` rides as a STRING of digits: it exceeds
    int64 (up to m * 2^S ~ 2^65) and pandas narrows DECIMAL columns
    lossily on some engines, so the exact digits are the only
    cross-engine-stable carrier.
    """
    m = 1 << p
    wbits = 64 - p
    s_max = wbits + 1
    two_s = 1 << s_max
    k_lit = hll_alpha(m) * m * m * two_s  # alpha * m^2, prescaled by 2^S

    regs = hll_registers(values, value_col, p)
    present = regs.agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {s_max} - M) AS DECIMAL(38,0))")
        ).alias("z_present"),
    )
    exact = values.agg(F.countDistinct(value_col).alias("exact_distinct"))
    z = (
        F.col("z_present")
        + (F.lit(m) - F.col("n_present")).cast("decimal(38,0)")
        * F.lit(two_s).cast("decimal(38,0)")
    ).alias("z_scaled")
    est = (F.lit(float(k_lit)) / F.col("z_scaled").cast("double")).alias(
        "est_cardinality"
    )
    return (
        present.crossJoin(exact)
        .select(F.lit(m).alias("m"), "n_present", z, "exact_distinct")
        .select(
            "m", "n_present", "z_scaled", est, "exact_distinct",
        )
        .select(
            "m", "n_present",
            F.col("z_scaled").cast("string").alias("z_scaled"),
            "est_cardinality", "exact_distinct",
            (
                (F.col("est_cardinality") - F.col("exact_distinct"))
                / F.col("exact_distinct")
            ).alias("rel_err"),
        )
    )


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # counters per row


def _sha_bucket(col: F.Column, salt: str, w: int) -> F.Column:
    """Deterministic bucket in [0, w) from a salted sha256 of the value —
    the same engine-portable uniform as curation.sample_uniform, so the
    DuckDB oracle replays it with string sha256 arithmetic."""
    h = F.sha2(F.concat(F.lit(salt), col.cast("string")), 256)
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % w).cast("int")


def cms_counters(
    values: DataFrame,
    value_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    salt: str = "cms-v1:",
) -> DataFrame:
    """(r, bucket, c): the Count-Min counter table of a value stream.

    ONE scan: each row explodes to its d (row, bucket) cells and the
    aggregate map-side combines down to <= d*w groups — so the shuffle
    is O(d*w * partitions) regardless of input size and the whole
    sketch is a few KB at any corpus scale.  Two counter tables built
    with the same (d, w, salt) merge by cell-wise SUM (the distributed
    property; point queries then take min over rows as usual).
    """
    col = F.col(value_col)
    cells = F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            _sha_bucket(col, f"{salt}{r}:", w).alias("bucket"),
        )
        for r in range(d)
    ])
    return (
        values.select(F.explode(cells).alias("rb"))
        .select(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    values: DataFrame,
    probes: DataFrame,
    value_col: str,
    probe_col: str = None,
    d: int = CMS_D,
    w: int = CMS_W,
    salt: str = "cms-v1:",
) -> DataFrame:
    """Point-frequency estimates for ``probes`` against the Count-Min
    sketch of ``values``: (probe, cms_est) with the one-sided guarantee
    cms_est >= true count (never under).

    The counter table is tiny (<= d*w rows) so it BROADCASTS onto the
    probe side — estimating any number of keys costs no shuffle of the
    sketch.  A probe hashing to cells no value touched estimates 0.
    """
    probe_col = probe_col or value_col
    counters = cms_counters(values, value_col, d, w, salt)
    col = F.col(probe_col)
    cells = F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            _sha_bucket(col, f"{salt}{r}:", w).alias("bucket"),
        )
        for r in range(d)
    ])
    probe_cells = probes.select(
        col.alias(probe_col), F.explode(cells).alias("rb")
    ).select(
        probe_col, F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probe_cells.join(F.broadcast(counters), ["r", "bucket"], "left")
        .groupBy(probe_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


# --------------------------------------------------------------------------
# Bottom-k (KMV) set signatures + corpus-level Jaccard
# --------------------------------------------------------------------------

BOTTOMK_K = 256


def _unsigned_order(value_col: str) -> list:
    """Sort keys giving UNSIGNED uint64 order over the int64 carrier:
    non-negative carriers (uint64 < 2^63) first, then negative ones —
    within each half, signed ascending == unsigned ascending."""
    c = F.col(value_col)
    return [F.when(c < 0, F.lit(1)).otherwise(F.lit(0)).asc(), c.asc()]


def bottomk_signature(
    values: DataFrame,
    group_col: str,
    value_col: str,
    k: int = BOTTOMK_K,
) -> DataFrame:
    """Per-group bottom-k signature: the k smallest DISTINCT uint64 hash
    values of each group (Bar-Yossef et al. 2002 KMV).

    MinHash keeps the single minimum under H different hash functions;
    bottom-k keeps the k minima under ONE — a fixed-size set summary
    whose pairwise union/intersection supports unbiased Jaccard and
    distinct-count estimates between whole corpora or strata.  One
    shuffle by group (the distinct + windowed top-k); the signature is
    k rows per group regardless of group size, so every downstream
    comparison is sketch-sized.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*_unsigned_order(value_col))
    return (
        values.select(group_col, value_col)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def _pair_flags(
    values: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(g1, g2, value, ina, inb) for every group pair g1 < g2: the
    deduped union of the two groups' value sets with membership flags.
    Two equi-joins against the tiny pair list (no OR-join, no cross
    product of values)."""
    groups = values.select(group_col).distinct()
    pairs = (
        groups.alias("ga")
        .join(groups.alias("gb"),
              F.col(f"ga.{group_col}") < F.col(f"gb.{group_col}"))
        .select(
            F.col(f"ga.{group_col}").alias("g1"),
            F.col(f"gb.{group_col}").alias("g2"),
        )
    )
    left = pairs.join(
        values.withColumnRenamed(group_col, "g1"), "g1"
    ).select("g1", "g2", value_col, F.lit(1).alias("ina"), F.lit(0).alias("inb"))
    right = pairs.join(
        values.withColumnRenamed(group_col, "g2"), "g2"
    ).select("g1", "g2", value_col, F.lit(0).alias("ina"), F.lit(1).alias("inb"))
    return (
        left.unionByName(right)
        .groupBy("g1", "g2", value_col)
        .agg(F.max("ina").alias("ina"), F.max("inb").alias("inb"))
    )


def pairwise_set_overlap(
    values: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Exact all-pairs set overlap: (g1, g2, n_inter, n_union) over the
    full distinct value sets — the full-shuffle ground truth the bottom-k
    estimate replaces at scale (carried alongside it as accuracy
    evidence at test scale)."""
    f = _pair_flags(values, group_col, value_col)
    return f.groupBy("g1", "g2").agg(
        F.sum(F.col("ina") * F.col("inb")).alias("n_inter"),
        F.count("*").alias("n_union"),
    )


def bottomk_jaccard(
    sig: DataFrame,
    group_col: str,
    value_col: str,
    k: int = BOTTOMK_K,
) -> DataFrame:
    """All-pairs Jaccard estimates between group signatures:
    (g1, g2, sketch_hits, sketch_denom, est_jaccard) for every g1 < g2.

    KMV estimator: est = |{v in bottom-k(sigA u sigB) : v in A and in
    B}| / min(k, |sigA u sigB|) — exact when the union fits inside k
    (the sketch degenerates to the sets themselves), unbiased with
    stderr ~ 1/sqrt(k) otherwise.  est is one int/int double division,
    so the whole report is cross-engine exact.  Joins are
    signature-sized: the group list is tiny and each signature is k
    rows, so the pair table never touches the corpus.
    """
    u = _pair_flags(sig, group_col, value_col)
    from pyspark.sql import Window

    w = Window.partitionBy("g1", "g2").orderBy(*_unsigned_order(value_col))
    bk = u.withColumn("rn", F.row_number().over(w))
    return (
        bk.groupBy("g1", "g2")
        .agg(
            F.sum(
                F.when(F.col("rn") <= k, F.col("ina") * F.col("inb"))
                .otherwise(F.lit(0))
            ).alias("sketch_hits"),
            F.least(F.lit(k), F.count("*")).alias("sketch_denom"),
        )
        .select(
            "g1", "g2", "sketch_hits", "sketch_denom",
            (
                F.col("sketch_hits").cast("double") / F.col("sketch_denom")
            ).alias("est_jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic hash-sample quantiles
# --------------------------------------------------------------------------

QUANTILE_SAMPLE_K = 256
QUANTILE_SALT = "qsample-r4"
QUANTILE_PS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def hash_sample(
    df: DataFrame,
    id_col: str,
    k: int = QUANTILE_SAMPLE_K,
    salt: str = QUANTILE_SALT,
) -> DataFrame:
    """Deterministic uniform k-sample: the k rows whose salted-sha256
    id hash is smallest (ties broken by id).

    Content-addressed bottom-k sampling: reproducible across runs,
    partitionings, and engines (same property as ``sample_uniform``'s
    Bernoulli, but with an EXACT sample size).  Spark plans the global
    bottom-k as TakeOrderedAndProject — per-partition partial top-k then
    a k-row merge, no corpus shuffle and no single-partition sort.
    """
    from locality_sensitive_hashing_spark.operators.curation import (
        sample_uniform,
    )

    u = sample_uniform(id_col, salt)
    return df.withColumn("_uh", u).orderBy("_uh", id_col).limit(k)


def rank_quantiles(
    df: DataFrame,
    value_col: str,
    ps=QUANTILE_PS,
    out_col: str = "q",
) -> DataFrame:
    """Type-1 (inverse-CDF) quantiles of an integer column, computed
    relationally: per-distinct-value counts -> cumulative rank over the
    DISTINCT-value table -> smallest value whose cumulative count
    reaches p*N.

    The window runs over distinct values, not rows — bounded by the
    value domain (document lengths, not documents), so there is no
    corpus-sized single-partition sort; the corpus itself is touched by
    exactly one map-side-combined groupBy.  Integer values + integer
    cumulative counts: the only cross-engine arithmetic is the
    ``cum >= p * N`` comparison of an integer against a literal*integer
    double — identical everywhere.
    """
    from pyspark.sql import Window

    cnt = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.count("*").alias("_c")
    )
    # both windows share the one ordering, so Spark plans ONE sort over
    # the distinct-value table and the corpus is scanned exactly once
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cnt.select(
        "_v",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(wall).alias("_n"),
    )
    pdf = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    )
    return (
        pdf.join(
            F.broadcast(cum),
            F.col("_cum") >= F.col("p") * F.col("_n"),
        )
        .groupBy("p", "_n")
        .agg(F.min("_v").alias(out_col))
        .select("p", F.col("_n").alias("n_rows"), out_col)
    )


# --------------------------------------------------------------------------
# Bloom filter (Bloom 1970; Broder & Mitzenmacher 2004 survey)
# --------------------------------------------------------------------------

BLOOM_M = 8192  # bits
BLOOM_K = 3     # hash functions


def bloom_bits(
    values: DataFrame,
    value_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    salt: str = "bloom-v1:",
) -> DataFrame:
    """The SET bit positions of a Bloom filter over a value column:
    one ``pos`` column, <= m rows.

    The relational form of the bitmap: each value explodes to its k
    salted-sha256 positions (the same engine-portable uniform as the
    Count-Min buckets) and a distinct aggregate map-side combines down
    to <= m rows — so the shuffle is O(m * partitions) regardless of
    input size and the sketch is a few KB at any corpus scale.  Two
    filters built with the same (m, k, salt) merge by UNION of their
    bit sets (= bitwise OR), the property that lets every partition
    build its shard independently.
    """
    col = F.col(value_col)
    poss = F.array(*[
        _sha_bucket(col, f"{salt}{r}:", m) for r in range(k)
    ])
    return (
        values.select(F.explode(poss).alias("pos"))
        .distinct()
    )


def bloom_probe(
    values: DataFrame,
    probes: DataFrame,
    value_col: str,
    probe_col: str | None = None,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    salt: str = "bloom-v1:",
) -> DataFrame:
    """Membership screen of ``probes`` against the Bloom filter of
    ``values``: (probe, bloom_maybe) with the one-sided guarantee
    bloom_maybe = true for EVERY probe actually present (no false
    negatives, ever); false positives occur at the classic
    (1 - e^(-kn/m))^k rate.

    The bit table is tiny (<= m rows) so it BROADCASTS onto the probe
    side — at production scale this is the cheap pre-screen that lets
    the shuffle-heavy EXACT membership join run only over the maybes
    (the same sketch-ahead-of-exact shape as Spark's own runtime Bloom
    join pruning, but as a first-class, engine-replayable operator).
    """
    probe_col = probe_col or value_col
    bits = bloom_bits(values, value_col, m, k, salt)
    col = F.col(probe_col)
    poss = F.array(*[
        _sha_bucket(col, f"{salt}{r}:", m) for r in range(k)
    ])
    # Dedupe probe VALUES before exploding (ADVICE r4): a value probed d
    # times would otherwise accumulate _hits = d*k and fail the == k test
    # -- a false NEGATIVE, violating the one-sided guarantee. Duplicate
    # positions WITHIN one value's k hashes must still count to k (two of
    # the k hash functions may collide on a position), so the explode
    # keeps all k rows per value rather than array_distinct-ing them.
    uprobes = probes.select(col.alias(probe_col)).distinct()
    probe_pos = uprobes.select(
        F.col(probe_col), F.explode(poss).alias("pos")
    )
    return (
        probe_pos.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy(probe_col)
        .agg(F.count("*").alias("_hits"))
        .join(uprobes, probe_col, "right")
        .select(
            probe_col,
            (F.coalesce(F.col("_hits"), F.lit(0)) == k).alias("bloom_maybe"),
        )
    )
