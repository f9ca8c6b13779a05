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
- candidate join: the shared capped-block kernel
  (:func:`pairs_from_blocks`) over prefix postings -- hot prefix tokens
  (possible only at low tau) are capped and loudly counted like every
  other detector's blocks.
- verify: a size filter (tau * |y| <= |x| for |x| <= |y|, a necessary
  condition for J >= tau, so pruning by it never loses a result pair)
  cuts candidates BEFORE the intersection-count join, which shuffles
  only surviving candidate ids against the token table.

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
    pairs_from_blocks,
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
    """(id, w) restricted to each document's prefix under the global
    (df ASC, token ASC) order.

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
        .select(id_col, "w")
    )


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
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    pref = prefix_postings(toks, tau, id_col)
    cand = pairs_from_blocks(
        pref, ["w"], cap, "setsim", id_col=id_col
    ).drop("detector")
    # size filter: J >= tau forces min(sz)/max(sz) >= tau -- prune
    # before the intersection join ever sees the token table.
    sized = (
        cand.join(sizes.select(F.col(id_col).alias("id1"),
                               F.col("sz").alias("n1")), "id1")
        .join(sizes.select(F.col(id_col).alias("id2"),
                           F.col("sz").alias("n2")), "id2")
        .where(
            # same 6-dp rounding contract as the final Jaccard test:
            # J <= min/max always, and round is monotone, so a pair whose
            # ROUNDED J reaches tau can never be dropped here -- no
            # half-ULP boundary hazard between the filter and the verify
            F.round(
                F.least("n1", "n2").cast("double") / F.greatest("n1", "n2"),
                6,
            )
            >= F.lit(tau)
        )
    )
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
