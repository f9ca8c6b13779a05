"""HyperLogLog sketch: numpy register replay, accuracy, mergeability,
partition invariance (operators/sketches.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from locality_sensitive_hashing_spark.operators.sketches import (
    HLL_P,
    hll_alpha,
    hll_cardinality,
    hll_registers,
)


def _hashes_df(spark, n, seed=7, n_parts=1):
    """n deterministic pseudo-uniform uint64 hashes as an int64 carrier
    column (same convention as the shingle tables)."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2**63 - 1, size=n, dtype=np.int64)
    # mix in genuinely-negative carriers (high-bit-set uint64s)
    vals[::3] = -vals[::3]
    df = spark.createDataFrame(pd.DataFrame({"h": vals}))
    return (df.repartition(n_parts) if n_parts > 1 else df), vals


def _numpy_registers(vals: np.ndarray, p: int) -> dict[int, int]:
    """Reference HLL registers from the uint64 view of the carrier."""
    u = vals.astype(np.uint64)
    wbits = 64 - p
    regs: dict[int, int] = {}
    for x in u.tolist():
        idx = x >> wbits
        w = x & ((1 << wbits) - 1)
        rank = wbits + 1 if w == 0 else wbits - w.bit_length() + 1
        regs[idx] = max(regs.get(idx, 0), rank)
    return regs


def test_hll_registers_numpy_replay(spark):
    df, vals = _hashes_df(spark, 5000)
    got = {
        int(r["idx"]): int(r["M"])
        for r in hll_registers(df, "h").collect()
    }
    assert got == _numpy_registers(vals, HLL_P)


def test_hll_accuracy_and_formula(spark):
    """Estimate within 4 sigma of the true distinct count, and the
    one-row report re-derives exactly from the numpy registers."""
    df, vals = _hashes_df(spark, 50000)
    row = hll_cardinality(df, "h").toPandas().iloc[0]
    exact = len(np.unique(vals))
    assert row["exact_distinct"] == exact
    sigma = 1.04 / np.sqrt(row["m"])
    assert abs(row["rel_err"]) < 4 * sigma

    regs = _numpy_registers(vals, HLL_P)
    m, wbits = 1 << HLL_P, 64 - HLL_P
    s_max = wbits + 1
    z = sum(1 << (s_max - M) for M in regs.values())
    z += (m - len(regs)) * (1 << s_max)
    assert int(row["z_scaled"]) == z
    assert row["n_present"] == len(regs)
    k = hll_alpha(m) * m * m * (1 << s_max)
    assert row["est_cardinality"] == k / z


def test_hll_merge_equals_union(spark):
    """Register-wise max of two partitions' register tables equals the
    union's registers -- the property that makes the sketch distributable
    (map-side partials combine losslessly)."""
    df1, v1 = _hashes_df(spark, 3000, seed=1)
    df2, v2 = _hashes_df(spark, 3000, seed=2)
    r1 = hll_registers(df1, "h").toPandas()
    r2 = hll_registers(df2, "h").toPandas()
    merged = (
        pd.concat([r1, r2]).groupby("idx")["M"].max().to_dict()
    )
    union = _numpy_registers(np.concatenate([v1, v2]), HLL_P)
    assert {int(k): int(v) for k, v in merged.items()} == union


def test_hll_partition_invariance(spark):
    """The one-row report is identical under an adversarial repartition
    (order-independence of the integer estimator)."""
    df1, _ = _hashes_df(spark, 8000, seed=5)
    df2, _ = _hashes_df(spark, 8000, seed=5, n_parts=13)
    a = hll_cardinality(df1, "h").toPandas()
    b = hll_cardinality(df2, "h").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_hll_sentinel_zero_hash(spark):
    """The shingle sentinel 0 (w == 0 path) ranks wbits+1, not an error."""
    df = spark.createDataFrame(pd.DataFrame({"h": [0, 1, 2]}))
    regs = {int(r["idx"]): int(r["M"]) for r in hll_registers(df, "h").collect()}
    wbits = 64 - HLL_P
    assert regs[0] == wbits + 1  # h=0: idx 0, w 0 -> max rank


# --------------------------------------------------------------------------
# Count-Min sketch
# --------------------------------------------------------------------------

import hashlib
from collections import Counter

from locality_sensitive_hashing_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    cms_counters,
    cms_estimate,
)


def _cms_words():
    return (
        ["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 5
        + [f"tail{i}" for i in range(300)]
    )


def _ref_cells(tok: str) -> list[tuple[int, int]]:
    return [
        (r, int(hashlib.sha256(f"cms-v1:{r}:{tok}".encode()).hexdigest()[:8], 16)
         % CMS_W)
        for r in range(CMS_D)
    ]


def test_cms_counters_hashlib_replay(spark):
    """Every counter cell replays exactly from hashlib sha256."""
    words = _cms_words()
    df = spark.createDataFrame(pd.DataFrame({"w": words}))
    got = {
        (int(x.r), int(x.bucket)): int(x.c)
        for x in cms_counters(df, "w").toPandas().itertuples()
    }
    ref: Counter = Counter()
    for tok in words:
        for cell in _ref_cells(tok):
            ref[cell] += 1
    assert got == dict(ref)


def test_cms_one_sided_guarantee(spark):
    """cms_est >= exact for EVERY distinct token (the sketch's defining
    bound), with equality whenever the token's min-row cell is
    collision-free."""
    words = _cms_words()
    df = spark.createDataFrame(pd.DataFrame({"w": words}))
    probes = spark.createDataFrame(pd.DataFrame({"w": sorted(set(words))}))
    est = cms_estimate(df, probes, "w").toPandas().set_index("w")
    exact = Counter(words)
    assert len(est) == len(exact)
    for tok, c in exact.items():
        assert int(est.loc[tok, "cms_est"]) >= c, tok
    # the heavy hitter dominates its cells: estimate is exact unless all
    # 4 of its cells collide, which the replay below rules in/out exactly
    ref: Counter = Counter()
    for t in words:
        for cell in _ref_cells(t):
            ref[cell] += 1
    expect_alpha = min(ref[c] for c in _ref_cells("alpha"))
    assert int(est.loc["alpha", "cms_est"]) == expect_alpha


def test_cms_merge_equals_union(spark):
    """Cell-wise SUM of two halves' counter tables == the union's
    counters (the property that makes per-partition sketches combine)."""
    words = _cms_words()
    half1, half2 = words[: len(words) // 2], words[len(words) // 2:]
    c1 = cms_counters(
        spark.createDataFrame(pd.DataFrame({"w": half1})), "w"
    ).toPandas()
    c2 = cms_counters(
        spark.createDataFrame(pd.DataFrame({"w": half2})), "w"
    ).toPandas()
    merged = (
        pd.concat([c1, c2]).groupby(["r", "bucket"])["c"].sum().to_dict()
    )
    full = {
        (int(x.r), int(x.bucket)): int(x.c)
        for x in cms_counters(
            spark.createDataFrame(pd.DataFrame({"w": words})), "w"
        ).toPandas().itertuples()
    }
    assert {(int(r), int(b)): int(v) for (r, b), v in merged.items()} == full


# --------------------------------------------------------------------------
# Bottom-k (KMV) signatures + pairwise Jaccard
# --------------------------------------------------------------------------

import numpy as np

from locality_sensitive_hashing_spark.operators.sketches import (
    BOTTOMK_K,
    bottomk_jaccard,
    bottomk_signature,
    pairwise_set_overlap,
)


def _grouped_hashes(spark, spec: dict[str, np.ndarray]):
    frames = [
        pd.DataFrame({"g": g, "h": v.astype(np.int64)}) for g, v in spec.items()
    ]
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def test_bottomk_signature_numpy_replay(spark):
    """k smallest in UNSIGNED uint64 order, per group, including
    negative int64 carriers (the upper uint64 half)."""
    rng = np.random.default_rng(3)
    a = rng.integers(-2**63, 2**63 - 1, size=2000, dtype=np.int64)
    b = rng.integers(-2**63, 2**63 - 1, size=50, dtype=np.int64)
    df = _grouped_hashes(spark, {"a": a, "b": b})
    got = bottomk_signature(df, "g", "h", k=64).toPandas()
    for g, vals in (("a", a), ("b", b)):
        u = np.unique(vals.astype(np.uint64))
        want = set(u[:64].astype(np.int64).tolist())
        have = set(got.loc[got.g == g, "h"].astype(np.int64).tolist())
        assert have == want, g


def test_bottomk_jaccard_exact_when_union_fits(spark):
    """Union smaller than k -> the sketch IS the sets: est == exact J."""
    a = np.arange(0, 100, dtype=np.int64)
    b = np.arange(50, 180, dtype=np.int64)  # inter 50, union 180
    df = _grouped_hashes(spark, {"a": a, "b": b})
    sig = bottomk_signature(df, "g", "h", k=BOTTOMK_K)
    row = bottomk_jaccard(sig, "g", "h", k=BOTTOMK_K).toPandas().iloc[0]
    assert row["sketch_denom"] == 180
    assert row["sketch_hits"] == 50
    assert row["est_jaccard"] == 50 / 180
    ex = pairwise_set_overlap(df, "g", "h").toPandas().iloc[0]
    assert (ex["n_inter"], ex["n_union"]) == (50, 180)


def test_bottomk_jaccard_accuracy(spark):
    """Large random sets with engineered overlap: |est - J| within 5
    sigma of the KMV stderr sqrt(J(1-J)/k)."""
    rng = np.random.default_rng(9)
    shared = rng.integers(-2**63, 2**63 - 1, size=6000, dtype=np.int64)
    only_a = rng.integers(-2**63, 2**63 - 1, size=6000, dtype=np.int64)
    only_b = rng.integers(-2**63, 2**63 - 1, size=6000, dtype=np.int64)
    a = np.concatenate([shared, only_a])
    b = np.concatenate([shared, only_b])
    df = _grouped_hashes(spark, {"a": a, "b": b})
    sig = bottomk_signature(df, "g", "h", k=BOTTOMK_K)
    row = bottomk_jaccard(sig, "g", "h", k=BOTTOMK_K).toPandas().iloc[0]
    ex = pairwise_set_overlap(df, "g", "h").toPandas().iloc[0]
    true_j = ex["n_inter"] / ex["n_union"]
    sigma = (true_j * (1 - true_j) / BOTTOMK_K) ** 0.5
    assert abs(row["est_jaccard"] - true_j) < 5 * sigma
    assert row["sketch_denom"] == BOTTOMK_K


def test_bottomk_partition_invariance(spark):
    rng = np.random.default_rng(11)
    spec = {
        g: rng.integers(-2**63, 2**63 - 1, size=900, dtype=np.int64)
        for g in ("en", "es", "zh")
    }
    df = _grouped_hashes(spark, spec)
    a = (
        bottomk_jaccard(bottomk_signature(df, "g", "h"), "g", "h")
        .toPandas().sort_values(["g1", "g2"]).reset_index(drop=True)
    )
    b = (
        bottomk_jaccard(
            bottomk_signature(df.repartition(13), "g", "h"), "g", "h"
        )
        .toPandas().sort_values(["g1", "g2"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------------------
# Hash-sample quantiles
# --------------------------------------------------------------------------

from locality_sensitive_hashing_spark.operators.sketches import (  # noqa: E402
    QUANTILE_PS,
    hash_sample,
    rank_quantiles,
)


def _numpy_type1_quantile(vals: np.ndarray, p: float) -> int:
    """min{v : #(x <= v) >= p * N} — the same double multiply the
    operator and the DuckDB oracle perform."""
    xs = np.sort(vals)
    n = len(xs)
    import math

    # smallest integer cum with cum >= p*n is ceil of the float product
    idx = max(int(math.ceil(p * n)), 1)
    return int(xs[idx - 1])


def test_rank_quantiles_numpy_replay(spark):
    rng = np.random.default_rng(21)
    vals = rng.integers(0, 500, size=3000, dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame({"n_chars": vals}))
    got = rank_quantiles(df, "n_chars").toPandas()
    assert len(got) == len(QUANTILE_PS)
    assert (got["n_rows"] == 3000).all()
    for r in got.itertuples():
        assert r.q == _numpy_type1_quantile(vals, r.p), r.p


def test_rank_quantiles_partition_invariance(spark):
    rng = np.random.default_rng(22)
    vals = rng.integers(0, 100, size=2000, dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame({"n_chars": vals}))
    a = rank_quantiles(df, "n_chars").toPandas().sort_values("p")
    b = (
        rank_quantiles(df.repartition(17), "n_chars")
        .toPandas().sort_values("p")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_hash_sample_exact_k_and_deterministic(spark):
    ids = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64),
                        "n_chars": np.arange(5000, dtype=np.int64) % 311})
    df = spark.createDataFrame(ids)
    s1 = set(hash_sample(df, "doc_id", k=128).toPandas()["doc_id"])
    s2 = set(hash_sample(df.repartition(23), "doc_id", k=128)
             .toPandas()["doc_id"])
    assert len(s1) == 128
    assert s1 == s2  # content-addressed: partitioning-invariant sample


def test_hash_sample_quantiles_near_exact(spark):
    """A 256-row uniform sample pins quantiles of a smooth distribution
    to within the DKW-style tolerance (loose 5-sigma band on the
    percentile rank)."""
    rng = np.random.default_rng(23)
    vals = rng.integers(0, 10_000, size=20_000, dtype=np.int64)
    ids = pd.DataFrame({"doc_id": np.arange(len(vals), dtype=np.int64),
                        "n_chars": vals})
    df = spark.createDataFrame(ids)
    samp = rank_quantiles(hash_sample(df, "doc_id"), "n_chars").toPandas()
    xs = np.sort(vals)
    k = 256
    for r in samp.itertuples():
        # rank of the sample quantile within the true distribution
        rank_p = np.searchsorted(xs, r.q, side="right") / len(xs)
        sigma = (r.p * (1 - r.p) / k) ** 0.5
        assert abs(rank_p - r.p) < 5 * sigma + 1e-6, (r.p, rank_p)


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------

def _bloom_positions_py(val: str, m: int, k: int, salt: str = "bloom-v1:"):
    import hashlib as _h

    return {
        int(_h.sha256(f"{salt}{r}:{val}".encode()).hexdigest()[:8], 16) % m
        for r in range(k)
    }


def test_bloom_bits_hashlib_replay(spark):
    from locality_sensitive_hashing_spark.operators.sketches import bloom_bits

    vals = [f"key{i}" for i in range(50)]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = {r.pos for r in bloom_bits(df, "v", m=512, k=3).collect()}
    exp = set().union(*(_bloom_positions_py(v, 512, 3) for v in vals))
    assert got == exp


def test_bloom_no_false_negatives_ever(spark):
    """The one-sided guarantee: EVERY member probes maybe=true, at any
    (m, k) -- including an overloaded tiny filter."""
    from locality_sensitive_hashing_spark.operators.sketches import bloom_probe

    vals = [f"member{i}" for i in range(200)]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    for m in (64, 512, 8192):
        got = bloom_probe(df, df, "v", m=m, k=3).collect()
        assert len(got) == 200
        assert all(r.bloom_maybe for r in got), f"false negative at m={m}"


def test_bloom_absent_keys_mostly_false_at_sized_m(spark):
    """At a properly sized filter (kn/m << 1) non-members probe false;
    fp probability ~ (1 - e^(-kn/m))^k ~ 4e-8 here, so ALL 500 absent
    probes must read false (a single fp would be a 1-in-40k fluke)."""
    from locality_sensitive_hashing_spark.operators.sketches import bloom_probe

    members = spark.createDataFrame(
        pd.DataFrame({"v": [f"in{i}" for i in range(20)]})
    )
    absent = spark.createDataFrame(
        pd.DataFrame({"v": [f"out{i}" for i in range(500)]})
    )
    got = bloom_probe(members, absent, "v", m=8192, k=3).collect()
    assert len(got) == 500
    assert not any(r.bloom_maybe for r in got)


def test_bloom_merge_equals_union(spark):
    """bits(A union B) == bits(A) | bits(B): partitions can build their
    filter shards independently and OR them."""
    from locality_sensitive_hashing_spark.operators.sketches import bloom_bits

    a = spark.createDataFrame(pd.DataFrame({"v": [f"a{i}" for i in range(30)]}))
    b = spark.createDataFrame(pd.DataFrame({"v": [f"b{i}" for i in range(30)]}))
    ab = a.union(b)
    bits = lambda df: {r.pos for r in bloom_bits(df, "v", m=256, k=3).collect()}
    assert bits(ab) == bits(a) | bits(b)


def test_bloom_partition_invariance(spark):
    from locality_sensitive_hashing_spark.operators.sketches import bloom_probe

    vals = pd.DataFrame({"v": [f"k{i}" for i in range(100)]})
    refs = spark.createDataFrame(vals.iloc[:40])
    probes = spark.createDataFrame(vals)
    one = sorted(map(tuple, bloom_probe(refs, probes, "v", m=512).collect()))
    many = sorted(map(tuple, bloom_probe(
        refs.repartition(7), probes.repartition(5), "v", m=512
    ).collect()))
    assert one == many


def test_bloom_duplicate_probe_rows_keep_guarantee(spark):
    """ADVICE r4 (medium): a value probed d times must still report
    bloom_maybe=true when present -- the pre-fix plan accumulated
    _hits = d*k across duplicate probe ROWS and failed the == k test, a
    false negative.  Output stays one row per DISTINCT probe value, and
    absent duplicated probes stay (mostly) false."""
    from locality_sensitive_hashing_spark.operators.sketches import bloom_probe

    vals = [f"member{i}" for i in range(50)]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    # every present value probed 3x, plus absent values probed 2x
    probes = spark.createDataFrame(pd.DataFrame({
        "v": vals * 3 + [f"absent{i}" for i in range(200)] * 2
    }))
    got = bloom_probe(df, probes, "v", m=8192, k=3).toPandas()
    assert len(got) == 250  # distinct probe values
    present = got[got.v.str.startswith("member")]
    assert present.bloom_maybe.all(), "false negative on duplicated probe"
    absent = got[got.v.str.startswith("absent")]
    assert (~absent.bloom_maybe).sum() >= 195  # fp rate ~ 4e-8 at this m
