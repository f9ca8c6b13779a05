"""Exact set-similarity join via prefix filtering (operators/setsim.py):
brute-force completeness/exactness, the prefix-filtering principle on
random corpora, partition invariance, cap accounting."""

from __future__ import annotations

import itertools
import re

import numpy as np
import pandas as pd
import pytest

from locality_sensitive_hashing_spark.operators.setsim import (
    doc_gram_sets,
    prefix_postings,
    setsim_dropped,
    setsim_join,
)


def _norm(s: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


def _gram_set(text: str, n: int) -> frozenset:
    toks = [t for t in _norm(text).split(" ") if t]
    if n == 1:
        return frozenset(toks)
    return frozenset(
        " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
    )


def _brute_pairs(texts: dict[int, str], tau: float, n: int):
    """All (id1, id2, n1, n2, n_common, jaccard>=tau) by enumeration."""
    sets = {i: _gram_set(t, n) for i, t in texts.items()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        j = round(inter / union, 6)
        if j >= tau:
            out[(a, b)] = (len(sa), len(sb), inter, j)
    return out


def _docs_df(spark, texts: dict[int, str], n_parts: int = 1):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[i] for i in texts]}
        )
    )
    return df.repartition(n_parts) if n_parts > 1 else df


CRAFTED = {
    1: "alpha beta gamma delta epsilon",
    2: "alpha beta gamma delta zeta",          # J=4/6 with 1 (unigram)
    3: "alpha beta gamma delta epsilon",       # J=1.0 with 1
    4: "omega psi chi phi upsilon",            # disjoint from 1-3
    5: "omega psi chi phi tau",                # J=4/6 with 4
    6: "",                                     # empty: never pairs
    7: "lone",                                 # single token, no partner
}


def test_crafted_exact_pairs_vs_brute_force(spark):
    got = {
        (r.id1, r.id2): (r.n1, r.n2, r.n_common, r.jaccard)
        for r in setsim_join(_docs_df(spark, CRAFTED), 0.6, n=1).collect()
    }
    assert got == _brute_pairs(CRAFTED, 0.6, 1)
    assert (1, 3) in got and got[(1, 3)][3] == 1.0
    assert (1, 2) in got and (4, 5) in got
    assert not any(6 in p or 7 in p for p in got)


@pytest.mark.parametrize("tau,n", [(0.3, 1), (0.6, 1), (0.5, 2), (0.7, 3)])
def test_random_corpus_complete_and_exact(spark, tau, n):
    """The prefix-filtering principle: with no posting list over the cap,
    the join finds EVERY >= tau pair and every value matches brute force."""
    rng = np.random.default_rng(20240817 + n)
    vocab = [f"w{i:02d}" for i in range(40)]
    texts = {}
    for i in range(60):
        k = int(rng.integers(4, 14))
        base = rng.choice(vocab, size=k, replace=True).tolist()
        texts[i] = " ".join(base)
        # plant near-dups: copy of a previous doc with a 1-token edit
        if i >= 10 and rng.random() < 0.3:
            src = list(texts[int(rng.integers(0, i))].split())
            if len(src) > n:
                src[int(rng.integers(0, len(src)))] = str(
                    rng.choice(vocab)
                )
                texts[i] = " ".join(src)
    df = _docs_df(spark, texts, n_parts=5)
    assert setsim_dropped(df, tau, cap=10_000, n=n).count() == 0
    got = {
        (r.id1, r.id2): (r.n1, r.n2, r.n_common, r.jaccard)
        for r in setsim_join(df, tau, cap=10_000, n=n).collect()
    }
    assert got == _brute_pairs(texts, tau, n)


def test_partition_invariance(spark):
    a = sorted(
        map(tuple, setsim_join(_docs_df(spark, CRAFTED, 1), 0.6, n=1).collect())
    )
    b = sorted(
        map(tuple, setsim_join(_docs_df(spark, CRAFTED, 7), 0.6, n=1).collect())
    )
    assert a == b and len(a) > 0


def test_cap_drops_are_loud_not_silent(spark):
    """A hot prefix token over the cap drops its block AND shows up in
    setsim_dropped (the O25 contract) -- pairs via other shared prefix
    tokens survive."""
    # every doc = {hot, unique_i}: 'hot' has df=N so it sorts LAST in the
    # global (df ASC, token ASC) order, but with sz=2 and tau=0.5 the
    # prefix length is 2 - ceil(1) + 1 = 2, so 'hot' IS in every prefix.
    texts = {i: f"hot u{i:03d}" for i in range(30)}
    df = _docs_df(spark, texts)
    full = setsim_join(df, 0.5, cap=64, n=1).collect()
    assert len(full) == 0  # J = 1/3 < 0.5 for every pair: nothing real
    dropped = setsim_dropped(df, 0.5, cap=8, n=1).collect()
    assert [(r.w, r.n_members) for r in dropped] == [("hot", 30)]
    # identical docs pair through their OTHER (unique-ish) prefix tokens
    texts[100] = "hot u007"  # exact dup of doc 7 -> J=1.0 via 'u007'
    got = setsim_join(_docs_df(spark, texts), 0.5, cap=8, n=1).collect()
    assert {(r.id1, r.id2) for r in got} == {(7, 100)}


def test_prefix_postings_shape(spark):
    """Prefix length sz - ceil(tau*sz) + 1, rarest tokens first."""
    texts = {1: "rare1 rare2 common", 2: "rare3 rare4 common",
             3: "rare5 rare6 common"}
    toks = doc_gram_sets(_docs_df(spark, texts), 1)
    pref = prefix_postings(toks, 0.9)  # sz=3: 3 - ceil(2.7) + 1 = 1
    rows = {(r.doc_id, r.w) for r in pref.collect()}
    # exactly one prefix token per doc, and never the df=3 'common'
    assert len(rows) == 3
    assert all(w != "common" for _, w in rows)


def test_positional_filter_subset_and_complete(spark):
    """The PPJoin positional filter only ever REMOVES candidates
    (subset of the unfiltered set) and never a true >= tau pair."""
    from locality_sensitive_hashing_spark.operators.setsim import (
        setsim_candidates,
    )

    rng = np.random.default_rng(99)
    vocab = [f"v{i:02d}" for i in range(30)]
    texts = {
        i: " ".join(rng.choice(vocab, size=int(rng.integers(4, 12))))
        for i in range(50)
    }
    for i in range(50, 60):  # plant true pairs
        texts[i] = texts[i - 50]
    df = _docs_df(spark, texts, n_parts=4)
    toks = doc_gram_sets(df, 1)
    tau = 0.6
    with_f = {(r.id1, r.id2) for r in
              setsim_candidates(toks, tau, cap=10_000).collect()}
    without = {(r.id1, r.id2) for r in
               setsim_candidates(toks, tau, cap=10_000,
                                 positional=False).collect()}
    assert with_f <= without
    truth = set(_brute_pairs(texts, tau, 1))
    assert truth <= with_f, truth - with_f
    # and on this corpus the filter actually bites
    assert len(with_f) < len(without), (len(with_f), len(without))


def test_boundary_pair_exactly_at_tau_survives(spark):
    """J == tau exactly (2/4 at tau=0.5) must pass the positional
    filter and the rounded verify."""
    texts = {1: "a b c", 2: "a b d"}
    got = setsim_join(_docs_df(spark, texts), 0.5, n=1).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id1, r.id2, r.n_common, r.jaccard) == (1, 2, 2, 0.5)
