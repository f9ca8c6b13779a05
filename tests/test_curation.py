"""Training-data curation operators (operators/curation.py):
decontamination, SemDeDup, deterministic stratified sampling."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
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


# --------------------------------------------------------------------------
# repetition & boilerplate filters
# --------------------------------------------------------------------------

def test_ngram_doc_freq_is_document_frequency(spark):
    """A gram repeated inside one doc counts ONCE; across docs it counts
    per doc."""
    from locality_sensitive_hashing_spark.operators.curation import (
        ngram_doc_freq,
    )

    docs = _docs(spark, [
        (1, "a b c a b c"),     # "a b c" twice IN-doc -> df contribution 1
        (2, "a b c x y z"),
        (3, "p q r s"),
    ])
    got = (
        ngram_doc_freq(docs, 3).toPandas()
        .set_index("ngram")["doc_freq"].to_dict()
    )
    assert got["a b c"] == 2
    assert got["b c a"] == 1          # only doc 1
    assert got["p q r"] == 1 and got["q r s"] == 1


def test_boilerplate_coverage_fractions_and_edges(spark):
    """Coverage = common distinct grams / distinct grams; zero-gram docs
    report 0 / not heavy; the heavy flag compares the ROUNDED fraction."""
    from locality_sensitive_hashing_spark.operators.curation import (
        boilerplate_coverage,
    )

    docs = _docs(spark, [
        (1, "a b c d"),        # grams {a b c, b c d}: both common -> 1.0
        (2, "a b c x y"),      # {a b c, b c x, c x y}: 1/3 common
        (3, "a b c d e"),      # {a b c, b c d, c d e}: 2/3 common
        (4, "zz"),             # shorter than n -> 0 grams
        (5, ""),               # empty -> 0 grams
    ])
    got = (
        boilerplate_coverage(docs, 3, min_df=2, heavy_frac=0.5)
        .toPandas().set_index("doc_id").sort_index()
    )
    # common set: "a b c" (df 3), "b c d" (df 2)
    assert got.loc[1, "n_grams"] == 2 and got.loc[1, "n_common"] == 2
    assert got.loc[1, "common_frac"] == 1.0 and bool(got.loc[1, "boilerplate_heavy"])
    assert got.loc[2, "n_grams"] == 3 and got.loc[2, "n_common"] == 1
    assert got.loc[2, "common_frac"] == round(1 / 3, 6)
    assert not got.loc[2, "boilerplate_heavy"]
    assert got.loc[3, "common_frac"] == round(2 / 3, 6)
    assert bool(got.loc[3, "boilerplate_heavy"])
    for d in (4, 5):
        assert got.loc[d, "n_grams"] == 0 and got.loc[d, "n_common"] == 0
        assert got.loc[d, "common_frac"] == 0.0
        assert not got.loc[d, "boilerplate_heavy"]
    assert len(got) == 5


def test_repetition_metrics_hand_computed(spark):
    """Modal-2-gram coverage (capped at 1) and duplicated-3-gram-position
    fraction against hand counts, including the degenerate shapes."""
    from locality_sensitive_hashing_spark.operators.curation import (
        repetition_metrics,
    )

    docs = _docs(spark, [
        # "a b" x3, "b a" x2; n_words 6 -> top = min(1, 3*2/6) = 1.0
        # trigrams: 4 positions, 2 distinct -> dup = 0.5
        (1, "a b a b a b"),
        # all distinct: top 2-gram count 1 -> 2/5; dup 3-gram 0
        (2, "v w x y z"),
        # shorter than 3 words: dup positions 0 -> 0.0; top = 2/2 = 1.0
        (3, "m m"),
        # single word: no bigrams -> top_c NULL -> 0.0; n_words 1
        (4, "solo"),
        # empty: split('') = [''] -> n_words 1, everything 0
        (5, ""),
    ])
    got = (
        repetition_metrics(docs, 2, 3, 0.2, 0.05)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.loc[1, "n_words"] == 6
    assert got.loc[1, "top_ngram_frac"] == 1.0
    assert got.loc[1, "dup_ngram_frac"] == 0.5
    assert bool(got.loc[1, "repetitive"])
    assert got.loc[2, "top_ngram_frac"] == 0.4
    assert got.loc[2, "dup_ngram_frac"] == 0.0
    assert bool(got.loc[2, "repetitive"])  # 0.4 > 0.2: tiny docs flag high
    assert got.loc[3, "top_ngram_frac"] == 1.0
    assert got.loc[3, "dup_ngram_frac"] == 0.0
    assert got.loc[4, "n_words"] == 1 and got.loc[4, "top_ngram_frac"] == 0.0
    assert got.loc[5, "top_ngram_frac"] == 0.0
    assert got.loc[5, "dup_ngram_frac"] == 0.0
    assert not got.loc[5, "repetitive"]


# --------------------------------------------------------------------------
# corpus assembly: shard_assignment + budget_select
# --------------------------------------------------------------------------

def test_shard_assignment_hashlib_and_partition_invariance(spark):
    """shard = sha256-uniform mod N: exact hashlib replay per row, all
    shards in range and populated, and the assignment is identical after
    an adversarial repartition (the reproducible-layout contract)."""
    from locality_sensitive_hashing_spark.operators.curation import (
        shard_assignment,
    )

    docs = _sample_docs(spark, 800)
    got = shard_assignment(docs, 16, "sh:").toPandas().set_index("doc_id")
    for doc_id, row in got.iterrows():
        u = int(hashlib.sha256(f"sh:{doc_id}".encode()).hexdigest()[:8], 16)
        assert int(row["shard"]) == u % 16, doc_id
    assert set(got["shard"]) == set(range(16))
    again = (
        shard_assignment(docs.repartition(7, "lang"), 16, "sh:")
        .toPandas().set_index("doc_id")
    )
    pd.testing.assert_frame_equal(got.sort_index(), again.sort_index())


def _budget_docs(spark, n=400):
    """Docs with a controlled quality spread: longer text -> higher
    quality-score length term, so bins split non-degenerately."""
    rows = [(i, ("the quick brown fox " * (1 + i % 40)).strip())
            for i in range(n)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def test_budget_select_semantics(spark):
    """Bin monotonicity (at most ONE mixed bin; everything above it fully
    kept, everything below fully dropped), the selected token mass lands
    within one boundary-bin width of the budget, the boundary decision
    replays exactly with hashlib, and the selection is deterministic."""
    from locality_sensitive_hashing_spark.operators.curation import (
        budget_select,
    )

    docs = _budget_docs(spark)
    budget = 3600
    got = budget_select(docs, budget, "b:").toPandas()
    assert len(got) == 400

    by_bin = got.groupby("q_bin").agg(
        sel=("selected", "sum"), n=("selected", "size"),
        toks=("n_tokens", "sum"),
    ).sort_index(ascending=False)
    mixed = by_bin[(by_bin.sel > 0) & (by_bin.sel < by_bin.n)]
    assert len(mixed) <= 1, "more than one partially-selected bin"
    if len(mixed):
        b = mixed.index[0]
        assert (by_bin.loc[by_bin.index > b, "sel"]
                == by_bin.loc[by_bin.index > b, "n"]).all()
        assert (by_bin.loc[by_bin.index < b, "sel"] == 0).all()
        slack = int(by_bin.loc[b, "toks"])
    else:
        slack = int(by_bin.toks.max())
    sel_toks = int(got.loc[got.selected, "n_tokens"].sum())
    assert abs(sel_toks - budget) <= slack, (sel_toks, budget, slack)

    # hashlib replay of the boundary-bin Bernoulli: recompute keep_rate
    # per bin from the pandas frame and re-derive every decision
    above = 0
    rates = {}
    for b, row in by_bin.iterrows():  # descending q_bin
        t = int(row.toks)
        rates[b] = (1.0 if above + t <= budget
                    else 0.0 if above >= budget
                    else (budget - above) / t)
        above += t
    for _, r in got.iterrows():
        u = int(hashlib.sha256(f"b:{r.doc_id}".encode()).hexdigest()[:8], 16)
        assert bool(r.selected) == (u < rates[int(r.q_bin)] * 2**32), r.doc_id

    again = budget_select(docs.repartition(5), budget, "b:").toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )


def test_budget_select_degenerate_budgets(spark):
    """budget >= corpus keeps everything; budget 0 keeps nothing."""
    from locality_sensitive_hashing_spark.operators.curation import (
        budget_select,
    )

    docs = _budget_docs(spark, 50)
    allin = budget_select(docs, 10**9, "b:").toPandas()
    assert allin.selected.all()
    none = budget_select(docs, 0, "b:").toPandas()
    assert not none.selected.any()


# --------------------------------------------------------------------------
# unigram_lm_score
# --------------------------------------------------------------------------

def test_unigram_lm_hand_computed(spark):
    """Exact bits-per-token on a 5-token corpus, empty-doc zero row, and
    the directional property (boilerplate < gibberish)."""
    import math

    from locality_sensitive_hashing_spark.operators.curation import (
        unigram_lm_score,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["a a b", "b c", ""],
        })
    )
    got = unigram_lm_score(docs).toPandas().set_index("doc_id")
    l2 = math.log2
    # T=5; counts a=2 b=2 c=1
    exp1 = (2 * (l2(5) - l2(2)) + (l2(5) - l2(2))) / 3
    exp2 = ((l2(5) - l2(2)) + (l2(5) - l2(1))) / 2
    assert got.loc[1, "n_tokens"] == 3
    assert got.loc[1, "bits_per_token"] == pytest.approx(exp1, abs=1e-6)
    assert got.loc[2, "bits_per_token"] == pytest.approx(exp2, abs=1e-6)
    assert got.loc[3, "n_tokens"] == 0
    assert got.loc[3, "bits_per_token"] == 0.0
    # common-token doc scores LOWER than the rare-token doc
    assert got.loc[1, "bits_per_token"] < got.loc[2, "bits_per_token"]


def test_unigram_lm_partition_invariance(spark):
    from locality_sensitive_hashing_spark.operators.curation import (
        unigram_lm_score,
    )

    docs = _budget_docs(spark, 300)
    a = unigram_lm_score(docs).toPandas().sort_values("doc_id")
    b = (
        unigram_lm_score(docs.repartition(11))
        .toPandas().sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# doc_top_terms
# ---------------------------------------------------------------------------

from locality_sensitive_hashing_spark.operators.curation import (  # noqa: E402
    doc_top_terms,
)


def _terms_df(spark, texts: dict[str, str]):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )


def test_doc_top_terms_hand_computed(spark):
    """tf DESC, then df ASC (distinctive beats common), then term ASC."""
    docs = _terms_df(spark, {
        "d1": "apple apple banana common",
        "d2": "banana common zebra",
        "d3": "common common",
    })
    got = (
        doc_top_terms(docs, top_n=3)
        .toPandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )
    # df: apple 1, banana 2, common 3, zebra 1
    want = [
        ("d1", 1, "apple", 2, 1),    # tf 2 wins
        ("d1", 2, "banana", 1, 2),   # tf 1 tie -> df 2 < df 3
        ("d1", 3, "common", 1, 3),
        ("d2", 1, "zebra", 1, 1),    # all tf 1 -> df then term
        ("d2", 2, "banana", 1, 2),
        ("d2", 3, "common", 1, 3),
        ("d3", 1, "common", 2, 3),   # only term; no rank-2/3 rows
    ]
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_doc_top_terms_normalizes_and_is_partition_invariant(spark):
    docs = _terms_df(spark, {
        "a": "Hello, WORLD!! hello-world",
        "b": "world peace; peace NOW: now now",
        "c": "",
    })
    one = doc_top_terms(docs, top_n=2).toPandas()
    many = doc_top_terms(docs.repartition(7), top_n=2).toPandas()
    key = lambda d: sorted(map(tuple, d.values.tolist()))
    assert key(one) == key(many)
    # punctuation stripped: "hello-world" -> hello, world
    a = one[one.doc_id == "a"].set_index("rank")
    assert set(a.term) <= {"hello", "world"}
    # empty doc emits no rows
    assert (one.doc_id != "c").all()


# --------------------------------------------------------------------------
# weighted sampling (Efraimidis-Spirakis PPSWOR)
# --------------------------------------------------------------------------

def _es_key_py(doc_id: int, w: float, salt: str) -> float:
    # double-log ES key (ADVICE r4): monotone transform of u^(1/w) that
    # keeps 6-dp resolution at any weight scale; SMALLEST keys win
    uh = int(hashlib.sha256(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16)
    return math.log(-math.log((uh + 0.5) / 2**32)) - math.log(w)


def test_weighted_sample_keys_math_replay(spark):
    from locality_sensitive_hashing_spark.operators.curation import (
        weighted_sample_keys,
    )

    rng = np.random.default_rng(5)
    rows = [(i, " ".join(["tok"] * int(rng.integers(1, 40))))
            for i in range(150)]
    df = _docs(spark, rows)
    from locality_sensitive_hashing_spark.functions.text import token_count

    got = weighted_sample_keys(
        df, token_count("text"), "ws-test:"
    ).toPandas().set_index("doc_id")
    assert len(got) == 150
    for i, text in rows:
        w = len(text.split())
        assert got.loc[i].weight == w
        assert abs(got.loc[i].es_key - _es_key_py(i, w, "ws-test:")) < 1e-6


def test_weighted_sample_topk_and_merge_property(spark):
    """top-k(A union B) == top-k( top-k(A) union top-k(B) ) -- the
    distributed-reservoir property; and the sample matches the python
    replay's top-k."""
    from locality_sensitive_hashing_spark.operators.curation import (
        weighted_sample,
    )

    rng = np.random.default_rng(6)
    rows = [(i, " ".join(["t"] * int(rng.integers(1, 60))))
            for i in range(200)]
    df = _docs(spark, rows)
    K, SALT = 16, "ws-merge:"
    wcol = F.size(F.split(F.col("text"), " "))
    full = weighted_sample(df, wcol, K, SALT)
    ids = [r.doc_id for r in full.collect()]
    # python replay
    keys = {i: _es_key_py(i, len(t.split()), SALT) for i, t in rows}
    exp = [i for i, _ in sorted(keys.items(),
                                key=lambda kv: (kv[1], kv[0]))[:K]]
    assert ids == exp
    # merge property over two shards: each shard's top-k keys carried
    # forward and re-ranked reproduce the global top-k exactly
    a = weighted_sample(df.where(F.col("doc_id") < 100), wcol, K, SALT)
    b = weighted_sample(df.where(F.col("doc_id") >= 100), wcol, K, SALT)
    both = pd.concat([a.toPandas(), b.toPandas()]).sort_values(
        ["es_key", "doc_id"], ascending=[True, True]
    ).head(K)
    assert list(both.doc_id) == exp


def test_weighted_sample_higher_weight_wins_more(spark):
    """Across many salts, a weight-50 row is sampled (k=1) far more
    often than a weight-1 row -- the PPSWOR property, checked in the
    pure replay (no Spark loop)."""
    weights = {1: 50.0, 2: 1.0, 3: 1.0, 4: 1.0}
    wins = {i: 0 for i in weights}
    for s in range(300):
        keys = {i: _es_key_py(i, w, f"salt{s}:") for i, w in weights.items()}
        wins[min(keys, key=keys.get)] += 1
    # E[win share of id 1] = 50/53 ~ 0.943
    assert wins[1] > 240, wins


def test_weighted_sample_partition_invariance(spark):
    from locality_sensitive_hashing_spark.operators.curation import (
        weighted_sample,
    )

    rows = [(i, " ".join(["x"] * (1 + i % 30))) for i in range(120)]
    df = _docs(spark, rows)
    wcol = F.size(F.split(F.col("text"), " "))
    one = [r.doc_id for r in weighted_sample(df, wcol, 10, "s:").collect()]
    many = [r.doc_id for r in
            weighted_sample(df.repartition(11), wcol, 10, "s:").collect()]
    assert one == many and len(one) == 10


# --------------------------------------------------------------------------
# Z-order (Morton) clustering key
# --------------------------------------------------------------------------

def _morton_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_python_replay(spark):
    from locality_sensitive_hashing_spark.operators.curation import zorder_key

    rng = np.random.default_rng(11)
    rows = [(i, int(rng.integers(0, 1024)), int(rng.integers(0, 1024)))
            for i in range(300)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["i", "a", "b"]))
    got = df.select(
        "i", zorder_key(F.col("a"), F.col("b"), 10).alias("z")
    ).toPandas().set_index("i")["z"].to_dict()
    assert got == {i: _morton_py(a, b, 10) for i, a, b in rows}


def test_zorder_sql_twin_matches_column_form(spark):
    """zorder_key_sql (the oracle's expression) is generated by the same
    loop -- evaluate it through Spark SQL and compare to the Column form."""
    from locality_sensitive_hashing_spark.operators.curation import (
        zorder_key,
        zorder_key_sql,
    )

    rng = np.random.default_rng(12)
    rows = [(int(rng.integers(0, 1024)), int(rng.integers(0, 1024)))
            for _ in range(100)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["a", "b"]))
    both = df.select(
        zorder_key(F.col("a"), F.col("b"), 10).alias("zc"),
        F.expr(zorder_key_sql("a", "b", 10)).cast("long").alias("zs"),
    ).toPandas()
    assert (both.zc == both.zs).all()


def test_zorder_locality_prunes_files(spark):
    """The layout property the key exists for: a range predicate on ONE
    dimension touches a bounded subset of the 64 layout files, for
    EITHER dimension -- a single-column sort only gives this for its
    own column."""
    from locality_sensitive_hashing_spark.operators.curation import zorder_key

    rows = [(a, b) for a in range(0, 1024, 32) for b in range(0, 1024, 32)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["a", "b"]))
    z = df.select(
        "a", "b",
        F.shiftright(zorder_key(F.col("a"), F.col("b"), 10), 14)
        .alias("file_id"),
    ).toPandas()
    total = z.file_id.nunique()
    assert total == 64
    # a narrow range on EITHER dimension prunes to 1/8 of the files
    # (the top 6 z-bits interleave 3 high bits of each dim)
    fa = z[z.a.between(0, 127)].file_id.nunique()
    fb = z[z.b.between(0, 127)].file_id.nunique()
    assert fa == total / 8, (fa, total)
    assert fb == total / 8, (fb, total)


def test_weighted_sample_scale_free_at_heavy_weights(spark):
    """ADVICE r4 (low): the classic u^(1/w) key saturates at 1.000000
    under 6-dp rounding once w >~ 10^6, degenerating the order to
    ascending id among heavy rows.  The double-log key must keep
    discriminating: at k=1 over rows of weight 10^9, the winner must be
    the true PPSWOR draw (python replay), not simply the lowest id --
    checked across many salts so an id-order degeneration cannot hide."""
    from locality_sensitive_hashing_spark.operators.curation import (
        weighted_sample,
    )

    n = 40
    df = _docs(spark, [(i, "x") for i in range(n)])
    wcol = F.lit(1_000_000_000.0)
    id_wins = 0
    for s in range(8):
        salt = f"heavy{s}:"
        got = [r.doc_id for r in weighted_sample(df, wcol, 1, salt).collect()]
        exp = min(range(n), key=lambda i: (_es_key_py(i, 1e9, salt), i))
        assert got == [exp], (s, got, exp)
        id_wins += got[0] == 0
    assert id_wins < 8  # not degenerate ascending-id order


# ---- repeated_spans (exact-substring-dedup cut-list) ----------------------


def _brute_spans(texts: dict, n: int, min_df: int):
    """Python replay: positional n-grams -> distinct-doc df -> interval
    union per doc -> (n_tokens, n_spans, covered_tokens)."""
    from locality_sensitive_hashing_spark import hashing as H

    toks = {d: H.normalize_text(t).split(" ") for d, t in texts.items()}
    grams = {
        d: [" ".join(ts[i:i + n]) for i in range(len(ts) - n + 1)]
        for d, ts in toks.items()
    }
    df: dict = {}
    for d, gs in grams.items():
        for g in set(gs):
            df[g] = df.get(g, 0) + 1
    out = {}
    for d, gs in grams.items():
        ivs = [(i, i + n - 1) for i, g in enumerate(gs) if df[g] >= min_df]
        spans = []
        for s, e in sorted(ivs):
            if spans and s <= spans[-1][1]:  # overlap only, not adjacency
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        covered = sum(e - s + 1 for s, e in spans)
        out[d] = (len(toks[d]), len(spans), covered)
    return out


def test_repeated_spans_matches_brute_force(spark):
    from locality_sensitive_hashing_spark.operators.curation import (
        repeated_spans,
    )

    texts = {
        # d1/d2 share two separated 3-gram runs -> two spans each
        1: "alpha beta gamma filler one two delta epsilon zeta end here",
        2: "alpha beta gamma other words x delta epsilon zeta closing bit",
        # d3 shares an overlapping longer run with d4 -> ONE merged span
        3: "aa bb cc dd ee unique tail of document three",
        4: "prefix words aa bb cc dd ee suffix of the fourth",
        # d5 has no repeated grams
        5: "entirely singular content with no shared runs at all",
        # d6: shorter than n tokens -> zero grams, zero spans
        6: "tiny doc",
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_spans, r.covered_tokens, r.covered_frac)
        for r in repeated_spans(df, 3, 2).collect()
    }
    exp = _brute_spans(texts, 3, 2)
    assert set(got) == set(texts)  # every doc emits a row
    for d, (nt, ns, cov) in exp.items():
        g = got[d]
        assert g[:3] == (nt, ns, cov), (d, g, (nt, ns, cov))
        assert g[3] == round(cov / nt, 6)
    # structure asserts: the fixture exercises both shapes
    assert got[1][1] == 2 and got[2][1] == 2   # two disjoint spans
    assert got[3][1] == 1 and got[4][1] == 1   # overlap-merged single span
    assert got[3][2] == 5 and got[4][2] == 5   # 'aa bb cc dd ee' = 5 tokens
    assert got[5] == (9, 0, 0, 0.0)
    assert got[6] == (2, 0, 0, 0.0)


def test_repeated_spans_adjacent_intervals_stay_disjoint(spark):
    """[i, i+n) intervals that touch but do not overlap are separate
    spans: with n=2, repeated grams at positions 0 and 2 cover tokens
    0-1 and 2-3 -- contiguous coverage but two distinct evidence runs.
    The merge rule is overlap (pos <= prev + n - 1), not adjacency."""
    from locality_sensitive_hashing_spark.operators.curation import (
        repeated_spans,
    )

    # grams at pos 0 ('a b') and pos 2 ('c d') repeat; pos 1 ('b c') is
    # unique to d1
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y c d")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_spans, r.covered_tokens)
           for r in repeated_spans(df, 2, 2).collect()}
    assert got[1] == (2, 4)  # two touching spans, full coverage
    assert got[2] == (2, 4)
