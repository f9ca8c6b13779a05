"""JVM-side text Column expressions (no Python in the hot path).

Everything here is pure ``pyspark.sql.functions`` composition, so it stays
inside whole-stage codegen and is ANSI-SQL-expressible for the DuckDB
oracle harness.  ``normalize_text`` MUST stay equivalent to
:func:`locality_sensitive_hashing_spark.hashing.normalize_text` (shared
regex) -- MMDS section 3.2.1 shingle prep; the reference normalized text
inside its shingler (REF?lsh_matrix.py, UNVERIFIED -- empty mount).

Also hosts the training-data text-analysis helpers (language-ID heuristic,
quality scoring, token counting, document fingerprinting) that a 100 TB
pretraining pipeline runs next to dedup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword lists for the n-gram/stopword language-ID heuristic.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "be", "this", "that", "are",
)
ES_STOPWORDS = (
    "el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es",
    "por", "con", "para", "del", "se", "no", "su", "al", "lo",
)


def normalize_text(col: Column | str) -> Column:
    """lower -> collapse non-[a-z0-9] runs to single spaces -> trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def char_shingles(col: Column | str, k: int) -> Column:
    """Array of ALL character k-grams (with duplicates) of a string column.

    SQL higher-order form: transform(sequence(1, len-k+1), i ->
    substring(s, i, k)). Empty array when len < k. Follow with
    ``F.array_distinct`` for the shingle *set* (MMDS section 3.2.1).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c) - F.lit(k - 1)
    return F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k))),
    ).otherwise(F.array().cast("array<string>"))


def word_tokens(col: Column | str) -> Column:
    """Whitespace tokens of a normalized string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def word_shingles(col: Column | str, n: int) -> Column:
    """Array of word n-grams (space-joined) -- the reference's word-shingle
    variant (`shingle_type` word-n vs char-k; public knowledge, UNVERIFIED).
    """
    toks = word_tokens(col)
    cnt = F.size(toks) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_count(col: Column | str) -> Column:
    """Whitespace token count of normalized text (pretraining accounting)."""
    return F.size(word_tokens(normalize_text(col)))


# GPT-2-style pre-tokenizer shape (contractions, space-prefixed word /
# number / punctuation runs, whitespace runs), restricted to ASCII classes
# so Java regex (Spark) and RE2 (DuckDB) agree alternative-for-alternative
# -- both engines use leftmost-FIRST alternation, so the order below is
# part of the contract (contractions before the punctuation run).
BPE_REGEX = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count over RAW text (pretraining cost accounting).

    Counts matches of the GPT-2-style pre-tokenization regex -- the
    piece boundaries a byte-pair tokenizer refines, which tracks real
    token counts far better than whitespace splitting on noisy text
    (punctuation runs, contractions, digit groups each count). JVM-side
    regexp_extract_all: one Project over the scan, no Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), 0))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are in `stopwords` (0.0 for empty text)."""
    toks = word_tokens(normalize_text(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def lang_id(col: Column | str) -> Column:
    """Stopword-ratio language guess: 'en' / 'es' / 'unknown'.

    Deterministic heuristic (n-gram/stopword family); real models plug in
    behind the same column contract.
    """
    en = stopword_ratio(col, EN_STOPWORDS)
    es = stopword_ratio(col, ES_STOPWORDS)
    return (
        F.when((en >= es) & (en > 0.05), F.lit("en"))
        .when((es > en) & (es > 0.05), F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] doc-quality score: length, alpha ratio, stopwords.

    score = 0.4*min(1, n_chars/500) + 0.3*alpha_ratio + 0.3*min(1, 5*sw)
    -- the standard cheap pretraining quality gates (length, punctuation
    density, stopword presence) as one JVM-side expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z ]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    sw = stopword_ratio(col, EN_STOPWORDS)
    len_term = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    sw_term = F.least(F.lit(1.0), sw * 5.0)
    # floor-scaled to micro-units: round() tie-breaking differs across
    # engines at exact .5 boundaries; floor on identical doubles doesn't.
    return F.floor((0.4 * len_term + 0.3 * alpha_ratio + 0.3 * sw_term) * 1e6).cast(
        "long"
    )


def doc_fingerprint(col: Column | str, modulus: int = 1_000_000_007) -> Column:
    """Deterministic rolling-hash document fingerprint (SQL-expressible).

    fp = sum over positions i (1-based) of ascii(char_i) * i, mod m --
    order-sensitive (a permutation changes it), cheap, and expressible in
    both Spark SQL and DuckDB for the oracle harness. Production variant
    would be xxhash64(text); this one exists to be cross-engine checkable.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    per_pos = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.ascii(c.substr(i, F.lit(1))).cast("long") * i.cast("long"),
    )
    total = F.aggregate(
        F.when(n >= 1, per_pos).otherwise(F.array().cast("array<long>")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.pmod(total, F.lit(modulus)).alias("fingerprint")
