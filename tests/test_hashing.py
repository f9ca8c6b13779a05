"""Kernel unit + property tests (numpy only, no Spark) -- SURVEY.md 5.2(1,2)."""

from __future__ import annotations

import numpy as np
import pytest

from locality_sensitive_hashing_spark import audio as A
from locality_sensitive_hashing_spark import hashing as H
from locality_sensitive_hashing_spark.config import Config, DEFAULT_CONFIG as CFG


def test_normalize():
    assert H.normalize_text("  The QUICK,, brown-fox!! 42 ") == "the quick brown fox 42"
    assert H.normalize_text("") == ""
    assert H.normalize_text("!!!") == ""


def test_shingles_match_brute_force():
    text = H.normalize_text("abcabc abc")
    k = 3
    grams = {text[i : i + k] for i in range(len(text) - k + 1)}
    assert H.shingle_set(text, k).size == len(grams)


def test_shingles_short_text_sentinel():
    assert H.shingle_set("ab", 5).tolist() == [0]
    assert H.shingle_set("", 5).tolist() == [0]


def test_hash_family_deterministic():
    a1, b1 = H.hash_family(CFG)
    a2, b2 = H.hash_family(CFG)
    assert (a1 == a2).all() and (b1 == b2).all()
    assert a1.min() >= 1 and a1.max() < CFG.modulo_prime


def test_minhash_range_and_permutation_invariance():
    a, b = H.hash_family(CFG)
    ss = H.shingle_set("the quick brown fox jumps over the lazy dog", 5)
    sig = H.minhash_signature(ss, a, b, CFG.modulo_prime)
    assert sig.shape == (CFG.num_hashes,)
    assert sig.min() >= 0 and sig.max() < CFG.modulo_prime
    perm = np.random.default_rng(0).permutation(ss)
    assert (H.minhash_signature(perm, a, b, CFG.modulo_prime) == sig).all()


def test_jaccard_estimate_concentration():
    """|estimate - true J| small at H=128 (MMDS section 3.3.3) over seeded
    random pairs."""
    rng = np.random.default_rng(7)
    a, b = H.hash_family(CFG)
    words = [f"w{i:03d}" for i in range(200)]
    errs = []
    for _ in range(20):
        base = list(rng.choice(words, 60, replace=False))
        keep = int(rng.integers(20, 55))
        other = base[:keep] + list(rng.choice(words, 60 - keep, replace=False))
        t1, t2 = " ".join(base), " ".join(other)
        s1 = H.shingle_set(H.normalize_text(t1), CFG.shingle_k)
        s2 = H.shingle_set(H.normalize_text(t2), CFG.shingle_k)
        true_j = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
        g1 = H.minhash_signature(s1, a, b, CFG.modulo_prime)
        g2 = H.minhash_signature(s2, a, b, CFG.modulo_prime)
        errs.append(abs((g1 == g2).mean() - true_j))
    assert np.mean(errs) < 0.06 and np.max(errs) < 0.18


def test_banding_collision_iff_band_equal():
    a, b = H.hash_family(CFG)
    s1 = H.shingle_set("the quick brown fox jumps over the lazy dog today", 5)
    s2 = H.shingle_set("the quick brown fox jumps over the lazy cat today", 5)
    g1 = H.minhash_signature(s1, a, b, CFG.modulo_prime)
    g2 = H.minhash_signature(s2, a, b, CFG.modulo_prime)
    b1 = H.band_hashes(g1, CFG.bands, CFG.rows_per_band)
    b2 = H.band_hashes(g2, CFG.bands, CFG.rows_per_band)
    r = CFG.rows_per_band
    for i in range(CFG.bands):
        band_eq = (g1[i * r : (i + 1) * r] == g2[i * r : (i + 1) * r]).all()
        assert band_eq == (b1[i] == b2[i])


def test_banding_hit_probability():
    """P[bucket collision] ~ 1-(1-s^r)^b within tolerance (MMDS 3.4.2)."""
    cfg = Config(num_hashes=64, bands=16, rows_per_band=4)
    a, b = H.hash_family(cfg)
    rng = np.random.default_rng(11)
    universe = np.arange(1, 20001, dtype=np.uint64)
    hits, expected = [], []
    for _ in range(60):
        n = 300
        s1 = np.sort(rng.choice(universe, n, replace=False))
        overlap = int(rng.integers(100, 280))
        extra = np.setdiff1d(universe, s1)
        s2 = np.sort(
            np.concatenate(
                [rng.choice(s1, overlap, replace=False),
                 rng.choice(extra, n - overlap, replace=False)]
            )
        )
        s2 = np.unique(s2)
        tj = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
        g1 = H.minhash_signature(s1, a, b, cfg.modulo_prime)
        g2 = H.minhash_signature(s2, a, b, cfg.modulo_prime)
        h1 = H.band_hashes(g1, cfg.bands, cfg.rows_per_band)
        h2 = H.band_hashes(g2, cfg.bands, cfg.rows_per_band)
        hits.append(float((h1 == h2).any()))
        expected.append(1 - (1 - tj ** cfg.rows_per_band) ** cfg.bands)
    assert abs(np.mean(hits) - np.mean(expected)) < 0.12


def test_simhash_properties():
    f = H.simhash64("the quick brown fox")
    assert f == H.simhash64("the quick brown fox")  # deterministic
    assert H.hamming64(f, f) == 0
    near = H.simhash64("the quick brown cat")
    far = H.simhash64("completely unrelated words appear here instead now")
    assert H.hamming64(f, near) < H.hamming64(f, far)
    assert H.simhash64("") == 0


def test_simhash_chunks_pigeonhole():
    f1 = H.simhash64("alpha beta gamma delta epsilon zeta eta theta")
    f2 = f1 ^ 0b1011  # hamming 3 <= t -> must share a chunk
    c1, c2 = H.simhash_chunks(f1, 4), H.simhash_chunks(f2, 4)
    assert any(x == y for x, y in zip(c1, c2))
    assert H.hamming64(f1, f2) == 3


def test_winnowing_guarantee():
    """Common substring >= gram_len + window - 1 always shares an anchor."""
    gram_len, window = H.sa_params(CFG)
    rng = np.random.default_rng(3)
    alphabet = list("abcdefghij ")
    for trial in range(20):
        common = "".join(rng.choice(alphabet, CFG.sa_min_len))
        pre1 = "".join(rng.choice(alphabet, int(rng.integers(0, 40))))
        pre2 = "".join(rng.choice(alphabet, int(rng.integers(0, 40))))
        a1 = H.winnow_anchors(pre1 + common, gram_len, window)
        a2 = H.winnow_anchors(pre2 + common, gram_len, window)
        assert np.intersect1d(a1, a2).size > 0, f"trial {trial}"


def test_sa_params_valid_for_tiny_thresholds():
    """window must stay >= 1 and gram_len <= sa_min_len for every legal
    sa_min_len (the 4-char gram floor used to overshoot thresholds < 6
    and crash sliding_window_view with window <= 0)."""
    for L in range(1, 65):
        cfg = Config(sa_min_len=L)
        g, w = H.sa_params(cfg)
        assert 1 <= g <= L and w >= 1 and g + w - 1 == L, (L, g, w)
        # winnowing actually runs at the extreme (empty is correct when
        # the text is shorter than one gram)
        text = "abcdefghij" * 4
        a = H.winnow_anchors(text, g, w)
        assert a.size > 0 or len(text) < g


def test_lcs_vs_bruteforce():
    rng = np.random.default_rng(5)
    alphabet = list("abc")
    for _ in range(25):
        t1 = "".join(rng.choice(alphabet, int(rng.integers(1, 40))))
        t2 = "".join(rng.choice(alphabet, int(rng.integers(1, 40))))
        # O(n*m) DP brute force
        best = 0
        dp = [[0] * (len(t2) + 1) for _ in range(len(t1) + 1)]
        for i in range(1, len(t1) + 1):
            for j in range(1, len(t2) + 1):
                if t1[i - 1] == t2[j - 1]:
                    dp[i][j] = dp[i - 1][j - 1] + 1
                    best = max(best, dp[i][j])
        assert H.longest_common_substring_len(t1, t2) == best


def test_lcs_edge_cases():
    assert H.longest_common_substring_len("", "abc") == 0
    assert H.longest_common_substring_len("abc", "abc") == 3
    assert H.longest_common_substring_len("xyz", "abc") == 0


def test_hash_kgrams_rolling_matches_naive():
    """The O(n) rolling-hash form of hash_kgrams (round 6) is bit-exact
    vs the original O(n*k) sliding-window multiply-accumulate, including
    multi-byte UTF-8 and every k down to 1."""
    import random

    def naive(text, k):
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        n = b.size - k + 1
        if n <= 0:
            return np.empty(0, dtype=np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        with np.errstate(over="ignore"):
            powers = np.concatenate([
                np.multiply.accumulate(
                    np.full(k - 1, H._FNV_PRIME, dtype=np.uint64))[::-1],
                np.ones(1, dtype=np.uint64),
            ]) if k > 1 else np.ones(1, dtype=np.uint64)
            h = (win * powers).sum(axis=1, dtype=np.uint64)
            h ^= h >> np.uint64(33)
            h *= H._GOLD
            h ^= h >> np.uint64(29)
        return h

    rng = random.Random(1)
    for _ in range(500):
        n = rng.randint(0, 80)
        t = "".join(chr(rng.randint(32, 0x24F)) for _ in range(n))
        k = rng.randint(1, 40)
        a, b = H.hash_kgrams(t, k), naive(t, k)
        assert a.dtype == b.dtype and (a == b).all(), (t, k)


def test_lifting_lcp_equals_kasai():
    """The vectorized binary-lifting cross-LCP (round 6) reproduces the
    Kasai-based computation exactly on adversarially repetitive texts
    (the containment fast path is bypassed by construction)."""
    rng = np.random.default_rng(11)
    checked = 0
    for _ in range(400):
        n1, n2 = int(rng.integers(1, 60)), int(rng.integers(1, 60))
        alphabet = list("ab") if checked % 2 else list("abc")
        t1 = "".join(rng.choice(alphabet, n1))
        t2 = "".join(rng.choice(alphabet, n2))
        if t1 in t2 or t2 in t1:
            continue
        b1 = np.frombuffer(t1.encode(), dtype=np.uint8).astype(np.int64) + 2
        b2 = np.frombuffer(t2.encode(), dtype=np.uint8).astype(np.int64) + 2
        s = np.concatenate([b1, np.array([1], dtype=np.int64), b2])
        sa = H.suffix_array(s)
        lcp = H.lcp_array(s, sa)
        src = sa < b1.size
        cross = src[1:] != src[:-1]
        kasai = int(lcp[1:][cross].max(initial=0))
        assert H.longest_common_substring_len(t1, t2) == kasai
        checked += 1
    assert checked > 300


def test_audio_roundtrip_and_compare():
    rng = np.random.default_rng(42)
    pcm = A.synth_pcm(rng, 16000, 400)
    for codec, tol in (("pcm_s16le", 2e-5), ("pcm_f32le", 1e-6)):
        out, sr = A.decode_wav(A.encode_wav(pcm, 16000, codec))
        assert sr == 16000 and np.abs(out - pcm).max() < tol
    w32 = A.encode_wav(pcm, 16000, "pcm_f32le")
    w16 = A.encode_wav(pcm, 16000, "pcm_s16le")
    close, snr = A.pcm_compare(w32, w16)
    assert close and snr >= 60  # requantization dup
    # 29.9 dB negative must fail (FIXTURES.md negative control)
    noisy = A.add_noise_at_snr(rng, pcm, 29.9)
    close, snr = A.pcm_compare(w32, A.encode_wav(noisy, 16000, "pcm_f32le"))
    assert not close and 29.0 < snr < 30.0
    # malformed input is a non-dup, not an exception
    assert A.pcm_compare(b"garbage", w32) == (False, float("-inf"))


def test_config_id_stability_and_validation():
    assert Config().config_id == Config().config_id
    assert Config(seed=1).config_id != Config(seed=2).config_id
    with pytest.raises(ValueError):
        Config(num_hashes=100, bands=32, rows_per_band=4)


def test_hash_tokens_batch_matches_loop():
    """The column-vectorized FNV token hasher (round 6) is bit-exact vs
    the per-byte Python loop, including empty tokens and multi-byte UTF-8."""
    import random

    rng = random.Random(7)
    toks = ["", "a", "z" * 100]
    for _ in range(400):
        n = rng.randint(0, 30)
        toks.append("".join(chr(rng.randint(32, 0x24F)) for _ in range(n)))
    a, b = H.hash_tokens(toks), H.hash_tokens_batch(toks)
    assert a.dtype == b.dtype == np.uint64 and (a == b).all()
    assert H.hash_tokens_batch([]).size == 0


def test_simhash64_batch_matches_scalar():
    """The batch SimHash kernel (round 6: factorize + 64 bincount
    reductions) equals the per-text scalar on every row, including empty,
    whitespace-only, unicode and high-multiplicity texts."""
    import random

    rng = random.Random(11)
    words = ["tok%02d" % i for i in range(40)]
    texts = ["", "   ", "éàü ÉÀÜ", "a", "x " * 300, "UPPER lower 123 !!!"]
    for _ in range(300):
        n = rng.randint(0, 60)
        texts.append(" ".join(rng.choice(words) for _ in range(n)))
    for _ in range(100):
        n = rng.randint(0, 80)
        texts.append("".join(chr(rng.randint(32, 0x24F)) for _ in range(n)))
    scalar = np.array([H.simhash64(t) for t in texts], dtype=np.int64)
    batch = H.simhash64_batch(texts)
    assert batch.dtype == np.int64 and (scalar == batch).all()
    assert H.simhash64_batch([]).size == 0
