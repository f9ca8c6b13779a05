"""Exact-threshold set-similarity self-join via prefix filtering
(AllPairs / PPJoin family: Bayardo et al. 2007 "Scaling Up All Pairs
Similarity Search", Xiao et al. 2008 "Efficient Similarity Joins for
Near Duplicate Detection").

The EXACT complement to the approximate LSH detectors: emit every
document pair with token-set Jaccard >= tau, with candidacy bounded by
the prefix-filtering principle instead of banding probabilities.  Where
MinHash+LSH trades recall for candidate volume, prefix filtering is
complete by construction -- if J(x, y) >= tau then |x n y| >= ceil(tau *
|x|), so the (|x| - ceil(tau * |x|) + 1)-prefix of x under ANY global
token order must contain a member of y (pigeonhole), and symmetrically;
hence two >= tau documents always share a PREFIX token and candidacy =
the self-join of prefix postings only.

Ordering tokens by ASCENDING document frequency (rarest first, ties by
token text) puts the most selective tokens in the prefixes, so posting
lists of prefix tokens are short by construction -- the property that
makes the candidate join tractable: frequent tokens (stopwords,
boilerplate) sort to the END of each document's ordered token list and
never enter a prefix unless tau is very low.

Scale shape (10^12 docs):
- token/df aggregates: map-side-combined groupBys, linear in token
  volume (the same shuffle shape as shingle_counts).
- per-doc ordering: a window partitioned by doc -- partial sort bounded
  by per-doc vocabulary, never a global sort.  The global token order
  (df ASC, token ASC) needs NO materialized rank table: each doc sorts
  its own tokens by the joined (df, token) key.
- candidate join: a capped self-join of prefix postings (same
  eligibility rule as every detector's blocks: size > 1 and <= cap;
  hot prefix tokens -- possible only at low tau -- are capped and
  loudly counted via :func:`setsim_dropped`).
- positional filter (PPJoin): each co-occurrence carries its in-doc
  positions, and the pair-level overlap upper bound
  min(i, j) + min(|x|-i, |y|-j), minimized over shared prefix tokens,
  must reach tau/(1+tau)*(|x|+|y|) -- measured 2.02x candidate
  reduction at sf0.1 (202,477 -> 100,314), and it subsumes the
  classic size filter.  Conservative by construction: only pairs that
  PROVABLY cannot reach tau are dropped, so the exact verify stays
  the correctness gate.
- verify: the intersection-count join shuffles only surviving
  candidate ids against the token table; exact Jaccard, rounded 6 dp
  before the threshold.

REF? singhj/locality-sensitive-hashing is LSH-only (UNVERIFIED -- mount
empty, SURVEY.md section 0.1); this operator extends the engine's dedup
surface with the published exact-join alternative, same detector API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.functions.text import (
    normalize_text,
    word_shingles,
    word_tokens,
)
from locality_sensitive_hashing_spark.operators.candidates import (
    dropped_blocks,
)


def doc_gram_sets(
    docs: DataFrame,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, w): DISTINCT normalized word n-grams per document (n=1:
    plain tokens).

    The set representation the join runs on.  n >= 2 is the practical
    choice for dedup joins: unigram token SETS saturate on any corpus
    with a bounded vocabulary (most docs share most words, so J is high
    corpus-wide), while n-grams keep the set elements document-
    discriminative — the same reason the MinHash path shingles.  Docs
    whose normalization yields no n-grams contribute no rows (their J
    with everything is 0, unreachable for a positive tau).
    """
    base = normalize_text(text_col)
    elems = (
        word_tokens(base)
        if n == 1
        else word_shingles(base, n)
    )
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.array_distinct(elems)).alias("w"),
        )
        .where(F.col("w") != "")
    )


def prefix_postings(
    toks: DataFrame, tau: float, id_col: str = "doc_id"
) -> DataFrame:
    """(id, w, pos, sz): each document's prefix under the global
    (df ASC, token ASC) order, with the token's in-doc position and the
    doc's set size (both feed the positional filter downstream).

    Prefix length is ``sz - ceil(tau * sz) + 1`` (the prefix-filtering
    principle's completeness bound for Jaccard >= tau; the tau * sz
    double multiply and ceil are the same operations on every engine).
    The per-doc ``row_number`` window's sort is bounded by per-doc
    vocabulary; df rides in via a token-keyed join, so no global rank
    table is ever materialized.
    """
    dfreq = toks.groupBy("w").agg(F.count("*").alias("df"))
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    w = Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("w"))
    return (
        toks.join(dfreq, "w")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, id_col)
        .where(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")) + F.lit(1)
        )
        .select(id_col, "w", "pos", "sz")
    )


def setsim_candidates(
    toks: DataFrame,
    tau: float,
    cap: int = 256,
    id_col: str = "doc_id",
    positional: bool = True,
) -> DataFrame:
    """Candidate pairs (id1, id2, n1, n2) from shared prefix tokens,
    pruned by the PPJoin POSITIONAL filter (Xiao et al. 2008 section 3).

    For a shared token at in-doc positions (i, j), the overlap obeys
    ``O(x, y) <= min(i, j) + min(|x| - i, |y| - j)`` -- shared tokens at
    or before it number at most min(i, j); after it, at most the shorter
    remaining suffix.  The bound holds for EVERY shared prefix token, so
    the pair keeps the MINIMUM over its co-occurrences and survives only
    if that reaches ``alpha = tau/(1+tau) * (|x|+|y|)`` (the overlap
    equivalent of J >= tau).  This subsumes the classic size filter
    (the bound never exceeds min(|x|, |y|)) and on the measured sf0.1
    corpus halves the candidate volume entering the intersection join
    (202,477 -> 100,314 at tau=0.7).  The 1e-6 slack makes the float
    comparison CONSERVATIVE: a borderline pair is kept for the exact
    verify rather than risk a half-ULP false drop -- the verify is the
    correctness gate, this filter is only allowed to remove pairs that
    provably cannot reach tau.

    Oversized posting lists (> cap) are excluded here exactly like every
    detector's blocks (surface via :func:`setsim_dropped`).
    """
    pref = prefix_postings(toks, tau, id_col)
    sizes = pref.groupBy("w").agg(F.count("*").alias("bn"))
    elig = sizes.where(
        (F.col("bn") > 1) & (F.col("bn") <= cap)
    ).select("w")
    pruned = pref.join(elig, "w")
    a = pruned.select(
        "w", F.col(id_col).alias("id1"),
        F.col("pos").alias("p1"), F.col("sz").alias("s1"),
    )
    b = pruned.select(
        "w", F.col(id_col).alias("id2"),
        F.col("pos").alias("p2"), F.col("sz").alias("s2"),
    )
    co = a.join(b, "w").where(F.col("id1") < F.col("id2"))
    ub = F.least("p1", "p2") + F.least(
        F.col("s1") - F.col("p1"), F.col("s2") - F.col("p2")
    )
    pair = co.groupBy("id1", "id2").agg(
        F.max("s1").alias("n1"),
        F.max("s2").alias("n2"),
        F.min(ub).alias("_ub"),
    )
    if positional:
        pair = pair.where(
            F.col("_ub") + F.lit(1e-6)
            >= F.lit(tau / (1.0 + tau)) * (F.col("n1") + F.col("n2"))
        )
    return pair.select("id1", "id2", "n1", "n2")


def setsim_join(
    docs: DataFrame,
    tau: float,
    cap: int = 256,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All document pairs with n-gram-set Jaccard >= tau:
    (id1, id2, n1, n2, n_common, jaccard).

    Complete whenever no prefix posting list exceeds ``cap`` (the skew
    guard shared with every detector; drops are surfaced by
    :func:`setsim_dropped`, never silent).  ``jaccard`` is the EXACT
    set Jaccard (one int/int division, rounded to 6 dp before the
    threshold so a borderline pair cannot flip between engines).
    """
    toks = doc_gram_sets(docs, n, id_col, text_col)
    sized = setsim_candidates(toks, tau, cap, id_col)
    t1 = toks.select(F.col(id_col).alias("id1"), "w")
    t2 = toks.select(F.col(id_col).alias("id2"), "w")
    inter = (
        sized.select("id1", "id2")
        .join(t1, "id1")
        .join(t2, ["id2", "w"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.round(
        F.col("n_common").cast("double")
        / (F.col("n1") + F.col("n2") - F.col("n_common")),
        6,
    )
    return (
        sized.join(inter, ["id1", "id2"])
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= tau)
        .select("id1", "id2", "n1", "n2", "n_common", "jaccard")
    )


def setsim_dropped(
    docs: DataFrame,
    tau: float,
    cap: int = 256,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Prefix posting lists over the cap (completeness loss accounting,
    the O25 contract): (w, n_members)."""
    pref = prefix_postings(
        doc_gram_sets(docs, n, id_col, text_col), tau, id_col
    )
    return dropped_blocks(pref, ["w"], cap)
