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


# --------------------------------------------------------------------------
# prefix-filtering / positional-filter / interval-bin invariants
# (pure set/integer math -- the guarantees operators/setsim.py and
# operators/sessions.py::windowed_count_join rely on)
# --------------------------------------------------------------------------

import math

SMALL_SET = st.sets(st.integers(min_value=0, max_value=30), min_size=1,
                    max_size=15)
TAU = st.sampled_from([0.3, 0.5, 0.6, 0.7, 0.8, 0.9])


def _prefix(s: frozenset, tau: float, order: dict) -> set:
    """The (|s| - ceil(tau*|s|) + 1)-prefix under a global order."""
    k = len(s) - math.ceil(tau * len(s)) + 1
    return set(sorted(s, key=lambda t: order[t])[:k])


@settings(max_examples=300, deadline=None)
@given(SMALL_SET, SMALL_SET, TAU, st.randoms(use_true_random=False))
def test_prefix_filter_completeness(a, b, tau, rnd):
    """The pigeonhole guarantee: J(a,b) >= tau implies the two prefixes
    share a token, under EVERY global order (here: a random one)."""
    a, b = frozenset(a), frozenset(b)
    inter = len(a & b)
    j = inter / (len(a) + len(b) - inter)
    toks = sorted(a | b)
    rnd.shuffle(toks)
    order = {t: i for i, t in enumerate(toks)}
    if j >= tau:
        assert _prefix(a, tau, order) & _prefix(b, tau, order), (a, b, tau)


@settings(max_examples=300, deadline=None)
@given(SMALL_SET, SMALL_SET, TAU, st.randoms(use_true_random=False))
def test_positional_filter_soundness(a, b, tau, rnd):
    """The PPJoin positional bound never rejects a true >= tau pair:
    for every shared PREFIX token at sorted positions (i, j),
    min(i,j) + min(|a|-i, |b|-j) >= overlap, hence the min over shared
    prefix tokens >= tau/(1+tau)*(|a|+|b|) whenever J >= tau."""
    a, b = frozenset(a), frozenset(b)
    inter = len(a & b)
    j = inter / (len(a) + len(b) - inter)
    if j < tau:
        return
    toks = sorted(a | b)
    rnd.shuffle(toks)
    order = {t: i for i, t in enumerate(toks)}
    sa = sorted(a, key=lambda t: order[t])
    sb = sorted(b, key=lambda t: order[t])
    pa, pb = _prefix(a, tau, order), _prefix(b, tau, order)
    shared = pa & pb
    assert shared  # completeness (previous property)
    bound = min(
        min(sa.index(t) + 1, sb.index(t) + 1)
        + min(len(a) - sa.index(t) - 1, len(b) - sb.index(t) - 1)
        for t in shared
    )
    alpha = tau / (1 + tau) * (len(a) + len(b))
    assert bound + 1e-9 >= alpha, (a, b, tau, bound, alpha)
    assert bound >= inter  # it really is an overlap upper bound


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**45),
       st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=1, max_value=10**9))
def test_interval_bin_cover(anchor_us, delta, window_us):
    """Any reference in [anchor - W, anchor) lands in the anchor's bin
    or the one before -- the 2-bin emission of windowed_count_join
    covers every in-window reference."""
    ref_us = anchor_us - (delta % (window_us + 1))  # in [a - W, a]
    if ref_us < 0 or ref_us >= anchor_us:
        return
    ab, rb = anchor_us // window_us, ref_us // window_us
    assert ab in (rb, rb + 1), (anchor_us, ref_us, window_us)


# --- gain-invariant fingerprint kernel (operators/audio_fingerprint.py) ----
# Algebraic invariants behind the detector's correctness claims: EXACT
# gain invariance for any integer scale with headroom, pack injectivity
# behind pigeonhole blocking, and BER metric axioms behind the verify.

_SAMPLES = st.lists(
    st.integers(min_value=-4096, max_value=4096), min_size=512, max_size=1600
)


@settings(max_examples=60, deadline=None)
@given(_SAMPLES, st.integers(min_value=2, max_value=7))
def test_fingerprint_codes_exact_gain_invariance(xs, g):
    """codes(g*x) == codes(x) for ANY integer gain g with int16 headroom
    (every band correlation scales by g; no difference-of-differences
    sign flips, ties stay ties) -- the detector's defining property,
    swept over random signals rather than the tuned fixture."""
    from locality_sensitive_hashing_spark.operators.audio_fingerprint import (
        fingerprint_codes,
        frame_band_mags,
    )

    x = np.array(xs, dtype=np.int64)
    assert np.abs(x * g).max(initial=0) <= 32767
    c1, a1 = fingerprint_codes(frame_band_mags(x))
    c2, a2 = fingerprint_codes(frame_band_mags(x * g))
    assert np.array_equal(c1, c2)
    assert a1 == a2


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=7), min_size=8, max_size=8),
       st.lists(st.integers(min_value=0, max_value=7), min_size=8, max_size=8))
def test_fingerprint_window_pack_injective(c1, c2):
    """The WINDOW-code big-endian pack (blocking key) is injective over
    code sequences (codes < 2^CODE_BITS), so two clips share a block key
    IFF they share the exact 8-code run -- no false pigeonhole merges."""
    from locality_sensitive_hashing_spark.operators.audio_fingerprint import (
        CODE_BITS,
    )

    def pack(cs):
        acc = 0
        for c in cs:
            acc = acc * (1 << CODE_BITS) + c
        return acc

    assert (pack(c1) == pack(c2)) == (c1 == c2)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=7), min_size=16,
                max_size=40),
       st.data())
def test_fingerprint_ber_metric_axioms(codes, data):
    """BER over aligned equal-length code sequences is a normalized
    metric: BER(x,x)=0, symmetric, in [0,1], and bounded below by
    (#differing codes)/(3n) since a differing code flips >= 1 bit."""
    from locality_sensitive_hashing_spark.operators.audio_fingerprint import (
        CODE_BITS,
    )

    other = data.draw(st.lists(
        st.integers(min_value=0, max_value=7),
        min_size=len(codes), max_size=len(codes)))

    def ber(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b)) / (
            CODE_BITS * len(a))

    assert ber(codes, codes) == 0.0
    b = ber(codes, other)
    assert b == ber(other, codes)
    assert 0.0 <= b <= 1.0
    ndiff = sum(1 for x, y in zip(codes, other) if x != y)
    assert b >= ndiff / (CODE_BITS * len(codes)) - 1e-12
