"""Shared numpy kernels for shingling, MinHash, banding, SimHash, winnowing.

This module is imported by BOTH the single-process oracle
(:mod:`locality_sensitive_hashing_spark.oracle`, the fixture generator) and
the Spark Arrow UDFs (:mod:`locality_sensitive_hashing_spark.operators`), on
the driver and on every executor (shipped via --py-files).  Sharing one
kernel is what makes the oracle-vs-pipeline comparison bit-exact at a pinned
:class:`~locality_sensitive_hashing_spark.config.Config`
(BASELINE.json: "matching the reference's cluster assignments ... at
identical shingle-size/num-hashes/band-row config").

Semantics sources: MMDS sections 3.2-3.4 (shingling, minhashing, banding);
Broder 1997 (MinHash / universal hash family); Charikar STOC 2002 (SimHash);
Schleimer-Wilkerson-Aiken SIGMOD 2003 (winnowing, used as the scalable
blocking stage in front of the suffix-array verifier).  Expected reference
locus for the minhash/band kernels: REF?lsh_matrix.py (UNVERIFIED -- the
reference mount was empty this session; SURVEY.md section 0.1).

All integer arithmetic is either exact int64 (universal hash mod 2^31-1) or
well-defined uint64 wraparound (polynomial gram hashes, band-hash mixing),
so results are identical on every platform numpy supports.
"""

from __future__ import annotations

import re

import numpy as np

from locality_sensitive_hashing_spark.config import Config

# uint64 mixing constants (splitmix64 / FNV-style; arbitrary but frozen)
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)

_NORM_RE = re.compile(r"[^a-z0-9]+")


def normalize_text(text: str) -> str:
    """Lowercase; collapse non-alphanumeric runs to single spaces; trim.

    MUST stay equivalent to the Spark Column expression in
    ``functions/text.py`` (lower + regexp_replace("[^a-z0-9]+", " ") + trim)
    and to the DuckDB oracle SQL. MMDS section 3.2.1 shingle prep.
    """
    return _NORM_RE.sub(" ", text.lower()).strip()


def _text_bytes(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-8"), dtype=np.uint8)


# rolling-hash power tables (grown on demand, module-level so executors
# amortize them across every call): _POWS[t] = FNV_PRIME^t and
# _INV_POWS[t] = FNV_PRIME^-t, both mod 2^64 (the FNV prime is odd, so
# it is invertible in Z/2^64).
_FNV_INV = np.uint64(pow(int(_FNV_PRIME), -1, 1 << 64))
_POWS = np.ones(1, dtype=np.uint64)
_INV_POWS = np.ones(1, dtype=np.uint64)


def _grow_pows(n: int) -> None:
    global _POWS, _INV_POWS
    m = _POWS.size
    if m > n:
        return
    with np.errstate(over="ignore"):
        ext = max(n + 1, 2 * m)
        pw = np.empty(ext, dtype=np.uint64)
        iv = np.empty(ext, dtype=np.uint64)
        pw[:m] = _POWS
        iv[:m] = _INV_POWS
        for t in range(m, ext):
            pw[t] = pw[t - 1] * _FNV_PRIME
            iv[t] = iv[t - 1] * _FNV_INV
    _POWS, _INV_POWS = pw, iv


def hash_kgrams(text: str, k: int) -> np.ndarray:
    """uint64 polynomial hashes of every character k-gram of ``text``.

    Position i covers text[i:i+k]. Returns an empty array when
    len(text) < k. Vectorized per document as a ROLLING hash (round 6):
    with c_t = b_t * P^-t and A_m = sum_{t<m} c_t (all wraparound
    uint64; the FNV prime is odd, hence invertible mod 2^64),

        H_j = sum_{t=0..k-1} b_{j+t} P^{k-1-t}
            = (A_{j+k} - A_j) * P^j * P^{k-1}

    -- one cumsum + one diff + one multiply, O(n) instead of the
    O(n*k) sliding-window multiply-accumulate (35 -> ~4 us on a
    300-char text at k=32; the identical values bit-for-bit, pinned by
    test_hashing.py::test_hash_kgrams_rolling_matches_naive).
    """
    b = _text_bytes(text)
    n = b.size - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    _grow_pows(b.size)
    with np.errstate(over="ignore"):
        c = b.astype(np.uint64) * _INV_POWS[: b.size]
        acc = np.cumsum(c, dtype=np.uint64)
        window = acc[k - 1:].copy()
        window[1:] -= acc[: n - 1]
        h = window * (_POWS[:n] * _POWS[k - 1])
        # final avalanche so adjacent grams decorrelate
        h ^= h >> np.uint64(33)
        h *= _GOLD
        h ^= h >> np.uint64(29)
    return h


def shingle_set(text: str, k: int, shingle_type: str = "char") -> np.ndarray:
    """Sorted distinct uint64 shingle hashes of normalized ``text``.

    ``shingle_type`` mirrors the reference's user-tunable shingle switch
    (SURVEY.md section 2 O3): "char" hashes character k-grams, "word"
    hashes k-token grams of the whitespace tokenization.  Jaccard is over
    *sets* (MMDS section 3.1.1), hence the dedup. Documents shorter than
    k (chars or tokens) shingle to the single sentinel {0} so every row
    still gets a well-defined signature.
    """
    if shingle_type == "word":
        return word_shingle_set(text, k)
    h = hash_kgrams(text, k)
    if h.size == 0:
        return np.zeros(1, dtype=np.uint64)
    return np.unique(h)


def word_shingle_set(text: str, n: int) -> np.ndarray:
    """Sorted distinct uint64 hashes of the n-token grams of ``text``.

    Grams are space-joined token windows hashed with the FNV token kernel
    (:func:`hash_tokens`) plus the same avalanche as :func:`hash_kgrams`,
    so word and char shingles draw from equally-mixed uint64 universes.
    """
    toks = text.split()
    if len(toks) < n:
        return np.zeros(1, dtype=np.uint64)
    grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    h = hash_tokens(grams)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= _GOLD
        h ^= h >> np.uint64(29)
    return np.unique(h)


def hash_family(cfg: Config) -> tuple[np.ndarray, np.ndarray]:
    """Seed-derived universal-hash coefficients (a_j, b_j), j = 1..H.

    h_j(x) = (a_j * x + b_j) mod P with P = cfg.modulo_prime (Broder 1997;
    MMDS section 3.3.5). a_j in [1, P), b_j in [0, P). int64 so the
    broadcast product a*x (x < P < 2^31) stays exact in int64.
    """
    rng = np.random.default_rng(cfg.seed)
    p = cfg.modulo_prime
    a = rng.integers(1, p, size=cfg.num_hashes, dtype=np.int64)
    b = rng.integers(0, p, size=cfg.num_hashes, dtype=np.int64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray, p: int
) -> np.ndarray:
    """MinHash signature: sig[j] = min over shingles x of (a_j*x+b_j) mod P.

    ``shingles`` is the uint64 set from :func:`shingle_set`; values are
    first reduced mod P into the hash-family domain. Returns int64 (H,).
    One numpy broadcast per document -- the "signature matrix" of
    REF?lsh_matrix.py computed a column at a time (MMDS section 3.3.5).
    """
    x = (shingles % np.uint64(p)).astype(np.int64)
    # (n_shingles, H) broadcast; both factors < 2^31 so product < 2^62
    return ((x[:, None] * a[None, :] + b[None, :]) % p).min(axis=0)


def band_hashes(sig: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """Per-band bucket keys: fold each band's r signature values + band id.

    MMDS section 3.4.1 banding. Returns int64 (bands,) (uint64 mix viewed
    as int64 for Spark LongType). Vectorized across bands; the fold loop
    runs rows_per_band (~4) iterations only.
    """
    m = np.asarray(sig, dtype=np.uint64).reshape(bands, rows_per_band)
    acc = (np.arange(1, bands + 1, dtype=np.uint64) * _GOLD) ^ _FNV_OFFSET
    for j in range(rows_per_band):
        acc = (acc ^ m[:, j]) * _FNV_PRIME
        acc ^= acc >> np.uint64(31)
    return acc.view(np.int64)


def signature_and_bands(
    text: str, cfg: Config, a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Normalize -> shingle -> minhash -> band hashes for one document."""
    sig = minhash_signature(
        shingle_set(normalize_text(text), cfg.shingle_k, cfg.shingle_type),
        a, b, cfg.modulo_prime,
    )
    return sig, band_hashes(sig, cfg.bands, cfg.rows_per_band)


def hash_tokens(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token (whitespace tokens of normalized text)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(tokens):
            h = _FNV_OFFSET
            for c in t.encode("utf-8"):
                h = (h ^ np.uint64(c)) * _FNV_PRIME
            out[i] = h
    return out


def hash_tokens_batch(tokens) -> np.ndarray:
    """Vectorized :func:`hash_tokens`: one FNV-1a step per byte COLUMN.

    Same values bit-for-bit (fuzz-pinned by
    test_hashing.py::test_hash_tokens_batch_matches_loop): tokens are
    packed into a padded byte matrix and the per-byte fold
    ``h = (h ^ c) * FNV_PRIME`` runs once per column over all still-active
    rows -- max_token_len numpy passes instead of a Python loop per byte.
    """
    m = len(tokens)
    out = np.full(m, _FNV_OFFSET, dtype=np.uint64)
    if m == 0:
        return out
    enc = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=m)
    maxlen = int(lens.max())
    if maxlen == 0:
        return out
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    mat = np.zeros((m, maxlen), dtype=np.uint8)
    mask = np.arange(maxlen)[None, :] < lens[:, None]
    mat[mask] = buf  # row-major True run per row == concatenation order
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            act = mask[:, j]
            out = np.where(
                act, (out ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME, out
            )
    return out


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized :func:`simhash64` over a batch of RAW texts -> int64 (n,).

    Identical per-row values (fuzz-pinned by
    test_hashing.py::test_simhash64_batch_matches_scalar): tokens are
    factorized across the batch so each distinct token is FNV-hashed once
    (:func:`hash_tokens_batch`), per-(doc, token) counts come from one
    ``np.unique`` over a fused key, and the per-bit weighted sums reduce
    via 64 ``np.bincount`` passes -- integer-exact (counts < 2^53 in
    float64) so the sign test matches the scalar kernel bit-for-bit.
    """
    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.int64)
    if n_docs == 0:
        return out
    doc_ids: list[np.ndarray] = []
    all_toks: list[str] = []
    for d, t in enumerate(texts):
        toks = normalize_text(t or "").split()
        if toks:
            doc_ids.append(np.full(len(toks), d, dtype=np.int64))
            all_toks.extend(toks)
    if not all_toks:
        return out
    import pandas as pd

    docs = np.concatenate(doc_ids)
    codes, uniq = pd.factorize(np.asarray(all_toks, dtype=object))
    m = len(uniq)
    th = hash_tokens_batch(list(uniq))
    # per-(doc, token) multiplicity: one unique over the fused key
    key = docs * m + codes
    ukey, counts = np.unique(key, return_counts=True)
    udoc = (ukey // m).astype(np.int64)
    ucode = ukey % m
    thu = th[ucode]
    total = np.bincount(udoc, weights=counts, minlength=n_docs)
    fp = np.zeros(n_docs, dtype=np.uint64)
    cw = counts.astype(np.float64)
    for i in range(64):
        bit = ((thu >> np.uint64(i)) & np.uint64(1)).astype(np.float64)
        s1 = np.bincount(udoc, weights=cw * bit, minlength=n_docs)
        # sums[d] = 2*s1 - total  > 0  <=>  bit i of fp[d] is 1
        fp |= np.where(2.0 * s1 > total, np.uint64(1) << np.uint64(i),
                       np.uint64(0))
    return fp.view(np.int64)


def simhash64(text: str) -> int:
    """64-bit SimHash fingerprint of normalized ``text`` (Charikar 2002).

    Token-level, weight = token frequency: bit i of the fingerprint is 1
    iff sum over tokens of weight * (+1 if token-hash bit i else -1) > 0.
    Returned as signed int64 (bit pattern of the uint64 fingerprint) for
    Spark LongType. Empty text -> 0.
    """
    toks = normalize_text(text).split()
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    th = hash_tokens(list(uniq))
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    sums = ((2 * bits - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    fp = np.uint64(0)
    one = np.uint64(1)
    for i in np.nonzero(sums > 0)[0]:
        fp |= one << np.uint64(i)
    return int(fp.view(np.int64) if isinstance(fp, np.uint64) else fp)


def simhash_chunks(fp: int, n_chunks: int = 4) -> list[int]:
    """Split a 64-bit fingerprint into n equal chunks (pigeonhole blocking).

    Hamming(f1, f2) <= n_chunks - 1 implies at least one equal chunk
    (Manku et al. WWW'07 blocking for Charikar fingerprints).
    """
    u = fp & 0xFFFFFFFFFFFFFFFF  # two's complement view of the int64 carrier
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return [(u >> (width * i)) & mask for i in range(n_chunks)]


def hamming64(f1: int, f2: int) -> int:
    """Popcount of XOR of two 64-bit fingerprints (signed-int64 carriers)."""
    u1 = f1 + (1 << 64) if f1 < 0 else f1
    u2 = f2 + (1 << 64) if f2 < 0 else f2
    return bin(u1 ^ u2).count("1")


def winnow_anchors(text: str, gram_len: int, window: int) -> np.ndarray:
    """Winnowing fingerprints: distinct uint64 anchors of normalized text.

    Standard winnowing (Schleimer et al. 2003): hash all gram_len-grams,
    slide a window of ``window`` consecutive gram hashes, keep each
    window's minimum. Guarantee: two texts sharing a common substring of
    length >= gram_len + window - 1 share at least one anchor, so with
    (gram_len, window) from :func:`sa_params` (gram_len + window - 1 ==
    sa_min_len by construction) the blocking stage is lossless for the
    sa_min_len detector (O15).
    """
    h = hash_kgrams(text, gram_len)
    if h.size == 0:
        return np.empty(0, dtype=np.uint64)
    if h.size <= window:
        return np.unique(h.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(win.min(axis=1))


def sa_params(cfg: Config) -> tuple[int, int]:
    """(gram_len, window) for winnowing so matches >= sa_min_len are caught.

    Losslessness needs gram_len + window - 1 <= sa_min_len (Schleimer et
    al. 2003 guarantee); within that constraint a LONGER gram is far more
    selective (fewer spurious cross-document anchor collisions -> fewer
    LCS verifications), at the cost of ~2n/window anchors per doc.
    The clamp to sa_min_len keeps window >= 1 for tiny thresholds
    (sa_min_len < 6), where the preferred 4-char floor would otherwise
    exceed the threshold itself.
    """
    gram_len = min(cfg.sa_min_len, max(4, (3 * cfg.sa_min_len) // 4))
    window = cfg.sa_min_len - gram_len + 1
    return gram_len, window


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int sequence via prefix doubling (numpy argsort).

    Manber-Myers 1990 doubling scheme, O(n log^2 n) with vectorized sorts.
    ``s`` is int32/int64 >= 0.
    """
    return suffix_array_with_levels(s)[0]


def suffix_array_with_levels(
    s: np.ndarray,
) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Suffix array plus the prefix-doubling rank levels.

    Returns ``(order, levels)`` with ``levels = [(k, rank_k), ...]`` in
    increasing k: ``rank_k[i] == rank_k[j]`` for i != j iff the two
    suffixes share their first k characters (the doubling invariant; a
    truncated suffix can only rank-collide with itself, since two
    distinct positions cannot have equal remaining length).  The levels
    power the vectorized binary-lifting LCP in
    :func:`longest_common_substring_len` -- Kasai's O(n) LCP loop is
    exact but runs per-character in interpreted Python, which dominated
    the SA verifier (593 us of a 1005 us call at bench scale).
    """
    n = s.size
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    rank = np.asarray(s, dtype=np.int64)
    levels: list[tuple[int, np.ndarray]] = [(1, rank)]
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        key_r = rank[order]
        key_s = second[order]
        new_rank = np.empty(n, dtype=np.int64)
        changed = np.empty(n, dtype=bool)
        changed[0] = False
        changed[1:] = (key_r[1:] != key_r[:-1]) | (key_s[1:] != key_s[:-1])
        new_rank[order] = np.cumsum(changed)
        rank = new_rank
        k *= 2
        levels.append((k, rank))
        if rank[order[-1]] == n - 1:
            return order, levels
        if k >= n:
            return np.lexsort((idx, rank)), levels  # all distinct fallback


def _max_cross_lcp(
    order: np.ndarray,
    levels: list[tuple[int, np.ndarray]],
    n: int,
    n1: int,
) -> int:
    """Max LCP over SA-adjacent suffix pairs with differing source text.

    Exactly the quantity the Kasai-based path read off ``lcp[cross]``:
    the max cross-text LCP is attained at an SA-adjacent pair with
    differing sources (any farther pair's LCP is a min over the adjacent
    ones).  Each pair's LCP comes from binary lifting over the doubling
    rank levels: walk k from high to low, advancing both positions by k
    whenever the k-ranks agree.  All pairs lift together as numpy
    vectors -- O(log n) passes, no per-character Python.
    """
    import numpy as np  # local for executor import order

    src1 = order < n1  # does the suffix start inside t1?
    cross = src1[1:] != src1[:-1]
    if not cross.any():
        return 0
    I = order[:-1][cross].copy()
    J = order[1:][cross].copy()
    lcp = np.zeros(I.size, dtype=np.int64)
    for k, rank in reversed(levels):
        ok = (I + k <= n) & (J + k <= n)
        if ok.any():
            ii, jj = I[ok], J[ok]
            eq = rank[ii] == rank[jj]
            if eq.any():
                hit = np.nonzero(ok)[0][eq]
                lcp[hit] += k
                I[hit] += k
                J[hit] += k
    return int(lcp.max(initial=0))


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP array: lcp[i] = LCP(suffix sa[i-1], suffix sa[i])."""
    n = s.size
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            m = n - max(i, j)
            while h < m and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


# Per-process gram-set memo for the LCS screen: near-dup corpora call
# lcs_at_least on each text ~tens of times (87% repeat rate measured at
# bench scale), so the sorted-unique gram array is cached per (text, k).
# Entry cap bounds worker/driver RSS (~2.5 KB/entry at 300-char texts);
# past the cap the screen computes uncached -- identical results.
_GRAM_MEMO: dict = {}
_GRAM_MEMO_MAX = 200_000


def _gram_set(text: str, k: int) -> np.ndarray:
    key = (text, k)
    g = _GRAM_MEMO.get(key)
    if g is None:
        g = np.unique(hash_kgrams(text, k))
        if len(_GRAM_MEMO) < _GRAM_MEMO_MAX:
            _GRAM_MEMO[key] = g
    return g


def lcs_at_least(t1: str, t2: str, min_len: int) -> int:
    """Exact LCS length if >= min_len, else -1 -- with an O(n) screen.

    LCS(t1, t2) >= L holds iff the texts share some L-gram, so
    intersecting hashed L-gram sets (vectorized, ~20x cheaper than the
    suffix array) soundly rejects pairs below the threshold; only
    survivors pay for the exact SA+LCP length. Equal-gram hashes are
    equal, so a false reject is impossible; a hash-collision false PASS
    is corrected by the exact computation. Used by the SA detector's
    per-pair verifier (Spark UDF and numpy oracle alike).

    Round 6: the per-text gram arrays come from the process-level memo
    above (sorted unique), and the emptiness test is a searchsorted
    probe -- emptiness over sorted-unique arrays equals the plain
    intersect exactly, so the returned value is unchanged.
    """
    g1 = _gram_set(t1, min_len)
    g2 = _gram_set(t2, min_len)
    if g1.size == 0 or g2.size == 0:
        return -1
    pos = np.searchsorted(g1, g2)
    pos[pos == g1.size] = 0
    if not (g1[pos] == g2).any():
        return -1
    lcs = longest_common_substring_len(t1, t2)
    return lcs if lcs >= min_len else -1


def longest_common_substring_len(t1: str, t2: str) -> int:
    """Exact longest-common-substring length via SA + LCP on t1#t2$.

    The per-pair verifier behind the suffix-array detector (O15): winnowing
    proposes candidate pairs, this confirms LCS >= sa_min_len exactly.

    Containment fast path: equal strings / verbatim containment resolve via
    substring search (exact same answer, no SA build) -- dominant for
    exact-dup-heavy corpora.
    """
    if not t1 or not t2:
        return 0
    if t1 in t2:
        return len(t1.encode("utf-8"))
    if t2 in t1:
        return len(t2.encode("utf-8"))
    b1 = _text_bytes(t1).astype(np.int64) + 2
    b2 = _text_bytes(t2).astype(np.int64) + 2
    if b1.size == 0 or b2.size == 0:
        return 0
    s = np.concatenate([b1, np.array([1], dtype=np.int64), b2])
    order, levels = suffix_array_with_levels(s)
    # the max cross-text LCP is attained at some SA-adjacent pair with
    # differing sources; binary-lifting over the doubling ranks computes
    # those pair LCPs vectorized (exactly Kasai's lcp[cross] values --
    # fuzz-pinned by test_hashing.py::test_lifting_lcp_equals_kasai)
    return _max_cross_lcp(order, levels, s.size, b1.size)
