"""Gain-invariant audio fingerprint detector (operators/audio_fingerprint.py).

Covers: the integer band-magnitude / sign-code kernel against a naive
per-sample replay, EXACT gain invariance of the codes (the detector's
headline property -- integer-scaled re-masters fingerprint identically),
dither robustness bounds (BER inside BER_MAX with >= one surviving
pigeonhole window), the low-information activity floor (silence and
frame-periodic tones are excluded from blocking, so degenerate all-zero
fingerprints can never zero-BER pair), planted recall / zero false
positives on the fixture corpus, and the single-Python-crossing plan.
Full Spark-vs-DuckDB parity at sf0.01 runs in tests/test_entry.py
(audio_fingerprints / audio_gain_near_dups / audio_gain_eval_recall).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark import audio as A
from locality_sensitive_hashing_spark.fixtures import synth_env_pcm
from locality_sensitive_hashing_spark.operators import audio_fingerprint as AFP

SF_SMALL = "/root/testdata/sf0.001"


def _quant(pcm: np.ndarray) -> np.ndarray:
    return np.clip(np.round(np.asarray(pcm) * 32767.0), -32768, 32767).astype(
        np.int64
    )


def _env_ints(doc: int, dur_ms: int = 1000, scale: float = 0.5) -> np.ndarray:
    rng = np.random.default_rng([42, doc, 13])
    return _quant(synth_env_pcm(rng, 8000, dur_ms) * scale)


def _naive_codes(ints: np.ndarray) -> tuple[list[int], int]:
    """Per-sample loop replay of the kernel: frame sums term by term,
    L1 magnitudes, difference-of-differences signs."""
    wc, ws = AFP.spectral_weights()
    nf = ints.size // AFP.FRAME_N
    mags = []
    for f in range(nf):
        row = []
        for b in range(len(AFP.SPECTRAL_BINS)):
            cs = ss = 0
            for p in range(AFP.FRAME_N):
                v = int(ints[f * AFP.FRAME_N + p])
                cs += v * int(wc[b, p])
                ss += v * int(ws[b, p])
            row.append(abs(cs) + abs(ss))
        mags.append(row)
    codes, active = [], 0
    for f in range(1, nf):
        code, any_nz = 0, False
        for b in range(len(AFP.SPECTRAL_BINS) - 1):
            d1 = mags[f][b] - mags[f][b + 1]
            d0 = mags[f - 1][b] - mags[f - 1][b + 1]
            if d1 - d0 > 0:
                code |= 1 << b
            if d1 - d0 != 0:
                any_nz = True
        codes.append(code)
        active += int(any_nz)
    return codes, active


def test_kernel_matches_naive_per_sample_replay():
    ints = _env_ints(3, dur_ms=400)  # 12 frames -- small enough to loop
    codes, active = AFP.fingerprint_codes(AFP.frame_band_mags(ints))
    ncodes, nactive = _naive_codes(ints)
    assert codes.tolist() == ncodes
    assert active == nactive


def test_codes_exactly_gain_invariant():
    """s -> g*s for integer g with headroom scales every band
    correlation exactly, so no difference-of-differences sign flips:
    identical codes, identical activity, BER == 0."""
    for doc in range(12):
        # g=2 at the fixture's 0.45-peak scale; g=3 needs a 0.3 synth
        for scale, g in ((0.5, 2), (0.3, 3)):
            ints = _env_ints(doc, scale=scale)
            assert np.abs(ints * g).max() <= 32767, "fixture headroom"
            base, act_b = AFP.fingerprint_codes(AFP.frame_band_mags(ints))
            gain, act_g = AFP.fingerprint_codes(AFP.frame_band_mags(ints * g))
            assert np.array_equal(base, gain)
            assert act_b == act_g


def test_energy_symbols_are_not_gain_invariant():
    """The companion property that motivates this detector: the energy-LSH
    symbols DO shift under gain (docstring claim), so only the sign
    fingerprint can pair a gain re-master."""
    from locality_sensitive_hashing_spark.operators.audio_lsh import (
        frame_energy_symbols,
    )

    ints = _env_ints(0)
    s1 = frame_energy_symbols(ints)
    s2 = frame_energy_symbols(ints * 2)
    # E scales by exactly 4 = 2 octaves = 2 * 2^SUB_BITS bins
    nz = s1 > 0
    assert np.array_equal(s2[nz], s1[nz] + 8)
    assert not np.array_equal(s1, s2)


def test_dither_ber_within_threshold_with_surviving_window():
    """+-8-LSB integer dither (the fixture's 'n' class) flips few bits:
    BER <= BER_MAX and at least one exact WINDOW-run of codes survives
    for the pigeonhole lookup, for every planted 'n' doc at the
    fixture's limit (doc % 4 == 0, doc < 120), replaying the fixture's
    exact dither substream (same rng, drawn after the synth)."""
    for doc in range(0, 120, 4):
        rng = np.random.default_rng([42, doc, 13])
        ints = _quant(synth_env_pcm(rng, 8000, 1000) * 0.5)
        noisy = np.clip(ints + rng.integers(-8, 9, ints.size), -32768, 32767)
        c1, _ = AFP.fingerprint_codes(AFP.frame_band_mags(ints))
        c2, _ = AFP.fingerprint_codes(AFP.frame_band_mags(noisy))
        assert len(c1) == len(c2)
        ber = sum(bin(int(a) ^ int(b)).count("1") for a, b in zip(c1, c2)) / (
            AFP.CODE_BITS * len(c1)
        )
        assert ber <= AFP.BER_MAX
        assert any(
            np.array_equal(c1[w : w + AFP.WINDOW], c2[w : w + AFP.WINDOW])
            for w in range(len(c1) - AFP.WINDOW + 1)
        )


def test_activity_floor_excludes_degenerate_profiles():
    """Digital silence and frame-periodic tones (freq a multiple of
    sr/FRAME_N) produce dd == 0 everywhere -- all-zero codes that would
    zero-BER match EACH OTHER; the floor excludes them.  Enveloped
    content passes with activity ~= n_codes."""
    sil = np.zeros(8000, dtype=np.int64)
    _, act = AFP.fingerprint_codes(AFP.frame_band_mags(sil))
    assert act == 0
    t = np.arange(8000) / 8000.0
    for f0 in (437.5, 500.0):  # 14 and 16 cycles per 256-sample frame
        tone = _quant(0.3 * np.sin(2 * np.pi * f0 * t))
        codes, act = AFP.fingerprint_codes(AFP.frame_band_mags(tone))
        assert act == 0
        assert set(codes.tolist()) == {0}
    env = _env_ints(1)
    codes, act = AFP.fingerprint_codes(AFP.frame_band_mags(env))
    assert act == len(codes)


def test_partial_frame_dropped_and_short_clip_empty():
    ints = _env_ints(2)
    full = AFP.frame_band_mags(ints)
    plus = AFP.frame_band_mags(np.concatenate([ints, ints[:100]]))
    assert np.array_equal(full, plus)  # trailing partial contributes nothing
    codes, act = AFP.fingerprint_codes(AFP.frame_band_mags(ints[:300]))
    assert codes.size == 0 and act == 0  # one frame -> no differences


@pytest.fixture(scope="module")
def planted(spark, cfg):
    from locality_sensitive_hashing_spark.fixtures import audio_gain_clips_df

    clips = audio_gain_clips_df(spark, SF_SMALL, limit=120).cache()
    pairs = AFP.fingerprint_near_dups(clips, cfg).collect()
    ids = [r.clip_id for r in clips.select("clip_id").collect()]
    return clips, pairs, ids


def test_planted_recall_and_no_false_positives(planted):
    """Every planted (base, gain) and (base, dither) pair -- and the
    induced (gain, dither) pair where both exist -- is found; ZERO
    cross-source pairs; gain pairs have BER exactly 0."""
    _, pairs, ids = planted
    idset = set(ids)
    src = {i[:-1] for i in ids if i.endswith("b")}
    want = set()
    for s in src:
        for v1, v2 in (("b", "g"), ("b", "n"), ("g", "n")):
            if s + v1 in idset and s + v2 in idset:
                want.add((s + v1, s + v2))
    got = {(r.id1, r.id2) for r in pairs}
    assert got == want  # perfect recall AND zero false positives
    for r in pairs:
        if r.id1.endswith("b") and r.id2.endswith("g"):
            assert r.ber_6dp == 0.0


def test_near_dup_plan_single_python_crossing(planted, cfg):
    """The detector crosses into Python once: every ArrowEvalPython in
    the plan string is the SAME persisted fingerprint kernel (one
    distinct expression id, re-printed under each InMemoryTableScan that
    references the cache); no row-at-a-time BatchEvalPython anywhere;
    blocking/pack/BER all JVM and `bytes` never reaches an exchange."""
    import re

    clips, _, _ = planted
    plan = AFP.fingerprint_near_dups(clips, cfg)._jdf.queryExecution().executedPlan().toString()
    kernel_ids = set(re.findall(r"compute\(bytes#\d+\)#(\d+)", plan))
    assert len(kernel_ids) == 1, f"multiple decode kernels: {kernel_ids}"
    assert "InMemoryRelation" in plan  # the single pass is persisted
    assert "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes" not in line


def test_store_kernel_matches_standalone_kernels(planted, cfg):
    """The combined intake-store kernel (audio_lsh.with_store_audio_features
    -- ONE decode emitting energy features + fingerprint codes) must equal
    the two standalone kernels column-for-column: its energy half equals
    with_energy_signatures and its fingerprint half equals
    with_fingerprints, on the same clips."""
    from locality_sensitive_hashing_spark.operators.audio_lsh import (
        with_energy_signatures,
        with_store_audio_features,
    )

    clips, _, _ = planted
    sub = clips.limit(30)
    got = {
        r.clip_id: r
        for r in with_store_audio_features(sub, cfg, id_col="clip_id").collect()
    }
    en = {r.clip_id: r for r in with_energy_signatures(sub, cfg).collect()}
    fp = {r.clip_id: r for r in AFP.with_fingerprints(sub).collect()}
    assert set(got) == set(en) == set(fp) and len(got) == 30
    for cid, r in got.items():
        assert r.decode_ok == en[cid].decode_ok == fp[cid].decode_ok
        assert r.shingles == en[cid].shingles
        assert r.sig == en[cid].sig
        assert r.codes == fp[cid].codes
        assert r.n_active == fp[cid].n_active
