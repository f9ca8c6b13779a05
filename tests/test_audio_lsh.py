"""Content-based audio near-dup detector (operators/audio_lsh.py).

Covers: integer symbol kernel parity vs the DuckDB replay formula, the
shingle encoding, decode-failure/sentinel edge rules, and the end-to-end
guarantee on the planted corpus -- every trimmed and noised variant is
paired with its source (perfect recall on the fixture), zero cross-doc
false positives, and the emitted Jaccard values equal a brute-force numpy
recomputation.  Full Spark-vs-DuckDB parity at sf0.01 runs in
tests/test_entry.py (audio_energy_profile / audio_content_near_dups).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark import audio as A
from locality_sensitive_hashing_spark.operators import audio_lsh as AL

SF_SMALL = "/root/testdata/sf0.001"


def test_frame_energy_symbols_match_duckdb_formula():
    """numpy (frexp exponent + integer shifts) == SQL
    (length(format('{:b}')) + BIGINT shifts) on adversarial energies:
    zeros, exact powers of two, boundary +/-1, random."""
    rng = np.random.default_rng(7)
    energies = np.array(
        [0, 1, 2, 3, 4, 7, 8, 9, (1 << 37) - 1, 1 << 37, (1 << 37) + 1]
        + rng.integers(0, 200 * (1 << 30), 50).tolist(),
        dtype=np.int64,
    )
    # drive the kernel with a synthetic "one sample per frame" signal whose
    # squares are the target energies? -- no: test the symbol math directly
    # by reconstructing it from the same formula pieces the kernel uses.
    bl = np.frexp(energies.astype(np.float64))[1].astype(np.int64)
    sub = np.left_shift(energies, AL.SUB_BITS) >> np.maximum(bl - 1, 0)
    expect = np.where(
        energies > 0, bl * (1 << AL.SUB_BITS) + sub - (1 << AL.SUB_BITS), 0
    )
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {int(e)})" for i, e in enumerate(energies))
    got = con.sql(
        f"""
        WITH e(i, en) AS (VALUES {vals}),
        b AS (SELECT i, en, CASE WHEN en = 0 THEN 0
                     ELSE length(format('{{:b}}', en)) END AS bl FROM e)
        SELECT CASE WHEN en = 0 THEN 0
               ELSE bl * {1 << AL.SUB_BITS}
                    + CAST((en * {1 << AL.SUB_BITS}) >> (bl - 1) AS BIGINT)
                    - {1 << AL.SUB_BITS} END AS q
        FROM b ORDER BY i
        """
    ).fetchnumpy()["q"]
    assert np.array_equal(got, expect)
    # and the kernel's own path agrees: a signal with frame_n=1 makes each
    # sample's square a frame energy
    samples = np.array([0, 1, -1, 5, -32768, 32767], dtype=np.int64)
    syms = AL.frame_energy_symbols(samples, frame_n=1, sub_bits=AL.SUB_BITS)
    e2 = samples * samples
    bl2 = np.frexp(e2.astype(np.float64))[1].astype(np.int64)
    sub2 = np.left_shift(e2, AL.SUB_BITS) >> np.maximum(bl2 - 1, 0)
    exp2 = np.where(e2 > 0, bl2 * 4 + sub2 - 4, 0)
    assert np.array_equal(syms, exp2)


def test_frame_energy_sum_exactness_and_partial_frame():
    """Frame sums are exact int64 (max-amplitude frame) and the trailing
    partial frame is its own frame."""
    ints = np.full(AL.FRAME_N + 3, -32768, dtype=np.int64)
    syms = AL.frame_energy_symbols(ints)
    assert syms.size == 2

    def expect_sym(e: int) -> int:
        bl = e.bit_length()
        return bl * (1 << AL.SUB_BITS) + ((e << AL.SUB_BITS) >> (bl - 1)) - (
            1 << AL.SUB_BITS
        )

    assert syms[0] == expect_sym(AL.FRAME_N * 32768 * 32768)
    assert syms[1] == expect_sym(3 * 32768 * 32768)


def test_shingle_encode_sentinel_and_injectivity():
    assert AL.shingle_encode(np.array([5, 7], dtype=np.int64)).tolist() == [0]
    a = AL.shingle_encode(np.array([1, 2, 3, 4], dtype=np.int64))
    b = AL.shingle_encode(np.array([1, 2, 4, 3], dtype=np.int64))
    assert a.tolist() != b.tolist()  # order-sensitive grams
    assert sorted(a.tolist()) == a.tolist()  # sorted distinct
    # distinct: repeated grams collapse
    c = AL.shingle_encode(np.array([9, 9, 9, 9, 9], dtype=np.int64))
    assert c.size == 1


def test_decode_edge_rules(spark, cfg):
    """Non-canonical/truncated blobs -> decode_ok false; short-but-valid
    clips (< k frames) -> the {0} shingle sentinel; zero-length data ->
    decode_ok false (matches the oracle's canon AND n_frames > 0 rule)."""
    rng = np.random.default_rng(3)
    good = A.encode_wav(A.synth_pcm(rng, 8000, 250), 8000, "pcm_s16le")
    # a valid 2-frame clip: fewer than SHINGLE_K frames -> sentinel
    short = A.encode_wav(np.full(AL.FRAME_N * 2, 0.5), 8000, "pcm_s16le")
    f32 = A.encode_wav(np.zeros(100) + 0.1, 8000, "pcm_f32le")
    empty = A.encode_wav(np.zeros(0), 8000, "pcm_s16le")
    rows = [
        ("good", good), ("short", short), ("tag3", f32),
        ("empty", empty), ("junk", b"\x00\x01"), ("truncated", good[:-10]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "bytes"])
    )
    out = {
        r["clip_id"]: r
        for r in AL.with_energy_signatures(df, cfg).collect()
    }
    assert out["good"]["decode_ok"] and len(out["good"]["syms"]) == 10
    assert out["short"]["decode_ok"] and out["short"]["shingles"] == [0]
    for bad in ("tag3", "empty", "junk", "truncated"):
        assert not out[bad]["decode_ok"], bad
        assert out[bad]["shingles"] == []


@pytest.fixture(scope="module")
def planted_corpus(spark):
    from locality_sensitive_hashing_spark.fixtures import audio_dup_clips_df

    clips = audio_dup_clips_df(spark, SF_SMALL, seed=42, limit=200).cache()
    clips.count()
    return clips


def test_planted_recall_and_no_false_positives(spark, cfg, planted_corpus):
    """Every planted trim ('t') and noise ('z') variant pairs with its
    source; NO pair crosses documents (the detector's false-positive rate
    on 200 independent enveloped clips is exactly zero)."""
    got = AL.audio_near_dups(planted_corpus, cfg).toPandas()
    ids = [r["clip_id"] for r in planted_corpus.select("clip_id").collect()]
    planted_t = {i for i in ids if i.endswith("t")}
    planted_z = {i for i in ids if i.endswith("z")}
    pairs = {(a, b) for a, b in zip(got.id1, got.id2)}
    for t in planted_t:
        assert (t[:-1] + "b", t) in pairs, f"trim pair missing for {t}"
    for z in planted_z:
        assert (z[:-1] + "b", z) in pairs, f"noise pair missing for {z}"
    for a, b in pairs:
        assert a[:9] == b[:9], f"cross-document false positive {a},{b}"
    # jaccard values: trimmed pairs must sit in the tuned band, and every
    # value matches a brute-force numpy recomputation from the bytes
    feats = {
        r["clip_id"]: set(r["shingles"])
        for r in AL.with_energy_signatures(planted_corpus, cfg).collect()
    }
    for row in got.itertuples(index=False):
        s1, s2 = feats[row.id1], feats[row.id2]
        assert row.jaccard == len(s1 & s2) / len(s1 | s2)
    trim_j = got[got.id2.str.endswith("t") & got.id1.str.endswith("b")].jaccard
    assert (trim_j > 0.5).all() and (trim_j < 1.0).all()


def test_content_clusters_group_variants_with_source(spark, cfg, planted_corpus):
    """Connected components over the verified audio pairs: every planted
    variant lands in its source clip's cluster (doc 0 has base+trim+noise
    -- a 3-node component joined through the base), labels are min-id, and
    no cluster spans documents."""
    from locality_sensitive_hashing_spark.operators.connected_components import (
        connected_components,
    )

    pairs = AL.audio_near_dups(planted_corpus, cfg).select("id1", "id2")
    labels = {
        r["clip_id"]: r["cluster_id"]
        for r in connected_components(
            pairs, planted_corpus.select("clip_id"), cfg
        ).collect()
    }
    assert len(labels) == 269
    for cid, lbl in labels.items():
        if cid.endswith(("t", "z")):
            assert lbl == labels[cid[:-1] + "b"], cid
        assert lbl[:9] == cid[:9], f"cluster spans documents: {cid} -> {lbl}"
    # doc 0: b < t < z lexically, so the shared min-id label is the base
    assert labels["a00000000t"] == labels["a00000000z"] == "a00000000b"


def test_silence_hot_bucket_is_capped_not_exploded(spark, cfg):
    """The degenerate energy profile: N digital-silence clips all quantize
    to the identical all-zero symbol sequence (one distinct shingle), so
    they are excluded from blocking by the MIN_PROFILE_SHINGLES floor --
    and even for qualified profiles the bucket cap bounds fan-out, so
    either guard alone emits ZERO silence pairs instead of N^2/2."""
    n = cfg.bucket_cap + 36
    rng = np.random.default_rng(11)
    silent = A.encode_wav(np.zeros(8000 // 2), 8000, "pcm_s16le")
    rows = [(f"s{i:05d}", silent) for i in range(n)]
    # two real near-dup clips so the detector provably still works in the
    # same run (the cap drops the silence bucket, not the corpus)
    pcm = A.synth_pcm(rng, 8000, 500) * np.interp(
        np.arange(4000), np.linspace(0, 3999, 10), rng.uniform(0.05, 1.0, 10)
    )
    rows.append(("real0b", A.encode_wav(pcm, 8000, "pcm_s16le")))
    rows.append(("real0t", A.encode_wav(pcm[800:], 8000, "pcm_s16le")))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "bytes"]))
    got = AL.audio_near_dups(df, cfg).toPandas()
    assert set(zip(got.id1, got.id2)) == {("real0b", "real0t")}
    # and silence pairs nothing even below the cap's pair stage: the
    # candidate layer itself emits no silence pair
    cands = AL.audio_candidate_pairs(
        AL.with_energy_signatures(df, cfg), cfg
    ).toPandas()
    assert not cands.id1.str.startswith("s").any()


def test_low_information_profiles_never_pair(spark, cfg):
    """Two constant tones at the SAME amplitude but DIFFERENT frequencies
    are different audio with IDENTICAL frame-energy profiles (sine energy
    over a 200-sample frame is ~amp^2*N/2 regardless of frequency): their
    shingle sets are tiny and equal, so without the MIN_PROFILE_SHINGLES
    floor they verify at J=1.0 -- a structural false positive no Jaccard
    threshold can reject.  The floor must exclude them from blocking
    while an enveloped near-dup pair in the same run still pairs."""
    rng = np.random.default_rng(7)
    t = np.arange(8000) / 8000.0
    rows = [
        ("toneA", A.encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), 8000,
                               "pcm_s16le")),
        ("toneB", A.encode_wav(0.5 * np.sin(2 * np.pi * 523 * t), 8000,
                               "pcm_s16le")),
    ]
    pcm = A.synth_pcm(rng, 8000, 500) * np.interp(
        np.arange(4000), np.linspace(0, 3999, 10), rng.uniform(0.05, 1.0, 10)
    )
    rows.append(("env0b", A.encode_wav(pcm, 8000, "pcm_s16le")))
    rows.append(("env0t", A.encode_wav(pcm[800:], 8000, "pcm_s16le")))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "bytes"]))
    feats = AL.with_energy_signatures(df, cfg).toPandas().set_index("clip_id")
    # the premise: the tones decode fine, share their (tiny) shingle set,
    # and fall below the participation floor
    assert feats.loc["toneA"].decode_ok and feats.loc["toneB"].decode_ok
    assert set(feats.loc["toneA"].shingles) == set(feats.loc["toneB"].shingles)
    assert len(feats.loc["toneA"].shingles) < AL.MIN_PROFILE_SHINGLES
    got = AL.audio_near_dups(df, cfg).toPandas()
    assert set(zip(got.id1, got.id2)) == {("env0b", "env0t")}


def test_single_python_crossing(spark, cfg, planted_corpus):
    """The whole detector crosses into Python once: the persisted feature
    table is the only ArrowEvalPython, and `bytes` never reaches any
    exchange (pruned immediately after the kernel)."""
    import re

    plan = AL.audio_near_dups(planted_corpus, cfg)._jdf.queryExecution().executedPlan().toString()
    # every ArrowEvalPython occurrence in the plan string is the SAME
    # persisted node (one distinct expression id), re-printed under each
    # InMemoryTableScan that references the cache -- i.e. one decode pass
    kernel_ids = set(re.findall(r"compute\(bytes#\d+\)#(\d+)", plan))
    assert len(kernel_ids) == 1, f"multiple decode kernels: {kernel_ids}"
    assert "InMemoryRelation" in plan  # the single pass is cached
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes" not in line


# ---- rate-normalized detector (cross-sample-rate re-publications) ---------


def test_rate_canonical_samples_contract():
    """Canonicalization: 16 kHz -> exactly 2*s; 8 kHz -> the scale-by-2
    linear upsample (multimodal.resample2x_s16 verbatim); any other
    rate -> None (documented exclusion); garbage -> None."""
    import numpy as np

    from locality_sensitive_hashing_spark import audio as A
    from locality_sensitive_hashing_spark.operators.audio_lsh import (
        rate_canonical_samples,
    )
    from locality_sensitive_hashing_spark.operators.multimodal import (
        resample2x_s16,
    )

    rng = np.random.default_rng(3)
    ints = rng.integers(-2000, 2000, 1000)
    raw16 = A.encode_wav(ints / 32767.0, 16000, "pcm_s16le")
    raw8 = A.encode_wav(ints / 32767.0, 8000, "pcm_s16le")
    raw44 = A.encode_wav(ints / 32767.0, 44100, "pcm_s16le")
    assert np.array_equal(rate_canonical_samples(raw16), 2 * ints)
    assert np.array_equal(rate_canonical_samples(raw8), resample2x_s16(ints))
    assert rate_canonical_samples(raw44) is None
    assert rate_canonical_samples(b"not a wav") is None


def test_rate_detector_pairs_cross_rate_republication(spark, cfg):
    """The defining scenario: an 8 kHz master and its 16 kHz re-encode
    (exact upsample, floor-halved to s16) pair at J = 1.0, while the
    BASE energy detector misses the pair by construction (sample-count
    frames); unrelated clips never pair."""
    import numpy as np
    import pandas as pd

    from locality_sensitive_hashing_spark import audio as A
    from locality_sensitive_hashing_spark.fixtures import synth_env_pcm
    from locality_sensitive_hashing_spark.operators import audio_lsh as AL
    from locality_sensitive_hashing_spark.operators.multimodal import (
        resample2x_s16,
    )

    rows = []
    for doc in range(8):
        rng = np.random.default_rng([9, doc])
        ints = np.clip(
            np.round(synth_env_pcm(rng, 8000, 1000) * 32767.0), -32768, 32767
        ).astype(np.int64)
        rows.append((f"d{doc}b", A.encode_wav(ints / 32767.0, 8000,
                                              "pcm_s16le")))
        if doc % 2 == 0:
            v = np.right_shift(resample2x_s16(ints), 1)
            rows.append((f"d{doc}u", A.encode_wav(v / 32767.0, 16000,
                                                  "pcm_s16le")))
    clips = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "bytes"]),
        "clip_id string, bytes binary",
    )
    got = {(r.id1, r.id2): r.jaccard
           for r in AL.rate_normalized_near_dups(clips, cfg).collect()}
    want = {(f"d{d}b", f"d{d}u") for d in range(8) if d % 2 == 0}
    assert set(got) == want
    assert all(j == 1.0 for j in got.values())
    # the base detector cannot see these pairs: frames are sample-count
    base = {(r.id1, r.id2)
            for r in AL.audio_near_dups(clips, cfg).select("id1", "id2").collect()}
    assert not (base & want)


def test_rate_detector_plan_one_python_crossing(spark, cfg):
    """Same plan contract as the sibling detectors: ONE persisted Arrow
    kernel, no row-at-a-time Python, bytes never reach an exchange."""
    import re

    import numpy as np
    import pandas as pd

    from locality_sensitive_hashing_spark import audio as A
    from locality_sensitive_hashing_spark.operators import audio_lsh as AL

    rng = np.random.default_rng(5)
    rows = [("c1", A.encode_wav(rng.normal(0, 0.1, 8000), 8000, "pcm_s16le"))]
    clips = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "bytes"]),
        "clip_id string, bytes binary",
    )
    plan = (
        AL.rate_normalized_near_dups(clips, cfg)
        ._jdf.queryExecution().executedPlan().toString()
    )
    kernel_ids = set(re.findall(r"compute\(bytes#\d+\)#(\d+)", plan))
    assert len(kernel_ids) == 1, f"multiple decode kernels: {kernel_ids}"
    assert "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes" not in line
