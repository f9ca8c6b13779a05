"""Multimodal plumbing: real audio features; stubbed image/video ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from locality_sensitive_hashing_spark import audio as A
from locality_sensitive_hashing_spark.operators.multimodal import (
    audio_features,
    frame_sample,
    image_metadata,
)


def test_audio_features_real(spark, clips_df, corpus):
    clips_pd, _, _ = corpus
    got = audio_features(clips_df).toPandas().set_index("clip_id")
    assert len(got) == len(clips_pd)
    assert got.decode_ok.all()
    # spot-check three rows against direct numpy decode
    for r in clips_pd.head(3).itertuples():
        pcm, sr = A.decode_wav(bytes(r.bytes))
        g = got.loc[r.clip_id]
        assert g.n_samples == pcm.size and g.sr_hz == sr
        assert abs(g.rms - float(np.sqrt(np.mean(pcm * pcm)))) < 1e-9
        assert abs(g.duration_s - pcm.size / sr) < 1e-9


def test_audio_features_garbage(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": ["g1"], "bytes": [b"nope"]})
    )
    got = audio_features(df).toPandas()
    assert not got.decode_ok.iloc[0] and got.n_samples.iloc[0] == 0


def test_image_metadata_stub_plumbing(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": ["a", "b"], "bytes": [b"imagebytes1", b"imagebytes2"]})
    )
    got = image_metadata(df, strict=False).toPandas().sort_values("image_id")
    assert list(got.columns) == ["image_id", "decode_ok", "width", "height",
                                 "channels", "mean_luma"]
    assert got.decode_ok.all() and (got.channels == 3).all()
    # deterministic: same payload -> same fake decode
    again = image_metadata(df, strict=False).toPandas().sort_values("image_id")
    assert got.reset_index(drop=True).equals(again.reset_index(drop=True))


def test_image_metadata_strict_raises(spark):
    df = spark.createDataFrame(pd.DataFrame({"image_id": ["a"], "bytes": [b"x"]}))
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        image_metadata(df, strict=True).collect()


def test_frame_sample_explosion(spark):
    df = spark.createDataFrame(
        pd.DataFrame({
            "video_id": ["v1", "v2"],
            "bytes": [b"videopayload1", b"videopayload2"],
            "dur_ms": [3500, 900],
        })
    )
    got = frame_sample(df, fps_sample=1.0).toPandas()
    assert len(got[got.video_id == "v1"]) == 4  # ceil(3.5)
    assert len(got[got.video_id == "v2"]) == 1
    v1 = got[got.video_id == "v1"].sort_values("frame_index")
    assert v1.frame_ts_s.tolist() == [0.0, 1.0, 2.0, 3.0]
    assert v1.frame_digest.nunique() == 4  # per-frame deterministic digests


def test_audio_quality_screen_synthetic(spark):
    """The discard gate against engineered clips: silent, clipped,
    too-short, undecodable, and a healthy tone."""
    from locality_sensitive_hashing_spark.operators.multimodal import (
        audio_quality,
    )

    sr = 16000
    t = np.arange(sr // 2) / sr  # 0.5 s
    tone = (0.5 * np.sin(2 * np.pi * 440 * t))
    clips = {
        "ok": A.encode_wav(tone, sr, "pcm_s16le"),
        "silent": A.encode_wav(np.zeros(sr // 2), sr, "pcm_s16le"),
        "clipped": A.encode_wav(np.sign(tone) * 1.0, sr, "pcm_s16le"),
        "short": A.encode_wav(tone[: sr // 100], sr, "pcm_s16le"),  # 10 ms
        "garbage": b"not a wav",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": list(clips), "bytes": list(clips.values())})
    )
    got = audio_quality(df).toPandas().set_index("clip_id")
    assert bool(got.loc["ok", "audio_ok"]) and bool(got.loc["ok", "decode_ok"])
    assert got.loc["ok", "silence_ratio"] <= 0.01
    assert got.loc["silent", "silence_ratio"] == 1.0
    assert not got.loc["silent", "audio_ok"]
    assert got.loc["clipped", "clipping_ratio"] > 0.9
    assert not got.loc["clipped", "audio_ok"]
    assert got.loc["short", "duration_s"] < 0.05
    assert not got.loc["short", "audio_ok"]
    assert not got.loc["garbage", "decode_ok"]
    assert not got.loc["garbage", "audio_ok"]
    # ratios agree with direct numpy on the healthy clip
    pcm, _ = A.decode_wav(clips["ok"])
    assert got.loc["ok", "silence_ratio"] == float(np.mean(np.abs(pcm) < 0.004))


def test_audio_temporal_stats_engineered(spark):
    """Integer time-domain stats vs direct numpy on engineered clips:
    alternating-sign (zcr exactly 1), constant-positive DC (zero
    crossings 0, exact dc_offset), a sine (stats equal the numpy
    replay bit-for-bit), garbage, and an f32 clip (s16-only contract)."""
    from locality_sensitive_hashing_spark.operators.multimodal import (
        audio_temporal_stats,
    )

    sr = 16000
    t = np.arange(sr // 4) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    alt = np.tile([0.25, -0.25], 200)  # strict sign flip every step
    dc = np.full(300, 0.125)
    clips = {
        "tone": A.encode_wav(tone, sr, "pcm_s16le"),
        "alt": A.encode_wav(alt, sr, "pcm_s16le"),
        "dc": A.encode_wav(dc, sr, "pcm_s16le"),
        "garbage": b"not a wav",
        "f32": A.encode_wav(tone, sr, "pcm_f32le"),
    }
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": list(clips), "bytes": list(clips.values())})
    )
    got = audio_temporal_stats(df).toPandas().set_index("clip_id")

    assert got.loc["alt", "zcr"] == pytest.approx(1.0)
    assert got.loc["alt", "zero_crossings"] == 399
    assert got.loc["dc", "zero_crossings"] == 0
    s_dc, _ = A.decode_wav_s16(clips["dc"])
    assert got.loc["dc", "dc_sum"] == int(s_dc.sum())
    assert got.loc["dc", "dc_offset"] == int(s_dc.sum()) / s_dc.size
    assert got.loc["dc", "peak_raw"] == int(np.abs(s_dc).max())

    s, _ = A.decode_wav_s16(clips["tone"])
    neg = s < 0
    assert got.loc["tone", "zero_crossings"] == int(
        np.count_nonzero(neg[1:] != neg[:-1])
    )
    assert got.loc["tone", "zcr"] == int(
        np.count_nonzero(neg[1:] != neg[:-1])
    ) / (s.size - 1)
    assert got.loc["tone", "decode_ok"]

    assert not got.loc["garbage", "decode_ok"]
    assert got.loc["garbage", "n_samples"] == 0
    # f32 decodes fine as floats but the INTEGER kernel is s16-only
    assert not got.loc["f32", "decode_ok"]


def test_audio_temporal_stats_single_sample(spark):
    """n=1 clip: zcr division guard returns 0.0, dc_offset exact."""
    from locality_sensitive_hashing_spark.operators.multimodal import (
        audio_temporal_stats,
    )

    one = A.encode_wav(np.array([0.5]), 16000, "pcm_s16le")
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": ["one"], "bytes": [one]})
    )
    got = audio_temporal_stats(df).toPandas().iloc[0]
    assert got["decode_ok"] and got["n_samples"] == 1
    assert got["zero_crossings"] == 0 and got["zcr"] == 0.0
    assert got["dc_offset"] == got["dc_sum"]


# ---------------------------------------------------------------------------
# Spectral profile (exact-integer DFT bins)
# ---------------------------------------------------------------------------

from locality_sensitive_hashing_spark.operators.multimodal import (  # noqa: E402
    SPECTRAL_BINS,
    SPECTRAL_WINDOW,
    audio_spectral_sums,
    spectral_weights,
)


def _spectral_clips_df(spark, blobs: dict[str, bytes]):
    pdf = pd.DataFrame(
        {"clip_id": list(blobs), "bytes": list(blobs.values())}
    )
    return spark.createDataFrame(pdf)


def test_spectral_sums_numpy_replay(spark):
    """Kernel matmul == direct per-sample integer loop, incl. a clip
    shorter than the window (zero-padding) and one longer (truncation)."""
    rng = np.random.default_rng(31)
    pcm_long = rng.uniform(-0.8, 0.8, size=2000)
    pcm_short = rng.uniform(-0.8, 0.8, size=100)
    blobs = {
        "long": A.encode_wav(pcm_long, 8000, "pcm_s16le"),
        "short": A.encode_wav(pcm_short, 8000, "pcm_s16le"),
    }
    got = audio_spectral_sums(_spectral_clips_df(spark, blobs)).toPandas()
    assert len(got) == 2 * len(SPECTRAL_BINS)
    wc, ws = spectral_weights()
    for cid, raw in blobs.items():
        s, _ = A.decode_wav_s16(raw)
        win = np.zeros(SPECTRAL_WINDOW, dtype=np.int64)
        m = min(s.size, SPECTRAL_WINDOW)
        win[:m] = s[:m]
        for j, k in enumerate(SPECTRAL_BINS):
            want_c = int(sum(int(win[i]) * int(wc[j, i])
                             for i in range(SPECTRAL_WINDOW)))
            want_s = int(sum(int(win[i]) * int(ws[j, i])
                             for i in range(SPECTRAL_WINDOW)))
            row = got[(got.clip_id == cid) & (got.band == k)].iloc[0]
            assert (int(row.cos_sum), int(row.sin_sum)) == (want_c, want_s)


def test_spectral_pure_tone_dominates_its_bin(spark):
    """A sine at exactly bin k cycles/window concentrates magnitude in
    band k for every k in the table."""
    sr = 8000
    n = np.arange(sr // 4)
    blobs = {
        f"tone{k}": A.encode_wav(
            0.5 * np.sin(2 * np.pi * k * n / SPECTRAL_WINDOW), sr, "pcm_s16le"
        )
        for k in SPECTRAL_BINS
    }
    got = audio_spectral_sums(_spectral_clips_df(spark, blobs)).toPandas()
    got["mag"] = got.cos_sum.abs() + got.sin_sum.abs()
    for k in SPECTRAL_BINS:
        sub = got[got.clip_id == f"tone{k}"].sort_values("mag")
        assert int(sub.iloc[-1].band) == k, f"bin {k} not dominant"
        # dominance is decisive: >= 10x the runner-up
        assert sub.iloc[-1].mag >= 10 * max(sub.iloc[-2].mag, 1)


def test_spectral_garbage_emits_no_rows(spark):
    blobs = {"junk": b"not a wav at all", "empty": b""}
    got = audio_spectral_sums(_spectral_clips_df(spark, blobs)).toPandas()
    assert len(got) == 0


# ---------------------------------------------------------------------------
# Resample (exact-integer 2x upsample)
# ---------------------------------------------------------------------------

from locality_sensitive_hashing_spark.operators.multimodal import (  # noqa: E402
    audio_resample_stats,
    resample2x_s16,
)


def test_resample2x_numpy_replay():
    """Vectorized kernel == naive per-sample loop, incl. n=1 and n=0."""
    rng = np.random.default_rng(41)
    for n in (0, 1, 2, 7, 500):
        s = rng.integers(-32768, 32768, size=n, dtype=np.int64)
        got = resample2x_s16(s)
        want = []
        for t in range(n):
            want.append(2 * int(s[t]))
            if t + 1 < n:
                want.append(int(s[t]) + int(s[t + 1]))
        assert got.tolist() == want
        assert got.size == (2 * n - 1 if n else 0)


def test_resample2x_halves_to_linear_interpolation():
    """Divided by the scale factor, odd outputs are exact midpoints."""
    s = np.array([0, 100, -50], dtype=np.int64)
    o = resample2x_s16(s)
    assert o.tolist() == [0, 100, 200, 50, -100]
    # o/2 = [0, 50, 100, 25, -50]: originals at even slots, midpoints odd
    assert (o[0::2] // 2).tolist() == s.tolist()
    assert (o[1::2]).tolist() == [0 + 100, 100 + (-50)]


def test_audio_resample_stats_engineered(spark):
    rng = np.random.default_rng(43)
    pcm = rng.uniform(-0.9, 0.9, size=300)
    blobs = {
        "clip": A.encode_wav(pcm, 8000, "pcm_s16le"),
        "junk": b"\x00" * 10,
    }
    got = audio_resample_stats(_spectral_clips_df(spark, blobs)).toPandas()
    assert list(got.clip_id) == ["clip"]          # junk emits no row
    s, sr = A.decode_wav_s16(blobs["clip"])
    o = resample2x_s16(s)
    r = got.iloc[0]
    assert (r.sr_in, r.sr_out) == (8000, 16000)
    assert (r.n_in, r.n_out) == (s.size, o.size)
    assert r.out_sum == o.sum()
    assert r.out_abs_sum == np.abs(o).sum()
    assert r.out_peak == np.abs(o).max()


# ---------------------------------------------------------------------------
# Silence runs (gaps-and-islands)
# ---------------------------------------------------------------------------

from locality_sensitive_hashing_spark.operators.multimodal import (  # noqa: E402
    SILENCE_RAW_T,
    audio_silence_runs,
)


def _pcm_from_raw(raw_s16: np.ndarray) -> bytes:
    """Encode EXACT raw s16 values (encode_wav round-trips s/32767)."""
    return A.encode_wav(raw_s16.astype(np.float64) / 32767.0, 8000,
                        "pcm_s16le")


def test_silence_runs_engineered(spark):
    """Hand-built flag pattern: [sil x3, loud x2, sil x1, loud x1, sil x2]."""
    loud = 20000
    s = np.array([0, 50, -131, loud, -loud, 131, loud, 10, -10],
                 dtype=np.int64)
    got = audio_silence_runs(
        _spectral_clips_df(spark, {"c": _pcm_from_raw(s)})
    ).toPandas().iloc[0]
    assert got.n_samples == 9
    assert got.n_silent == 6
    assert got.n_runs == 3
    assert got.longest_run == 3
    assert got.leading_run == 3
    assert got.trailing_run == 2


def test_silence_runs_all_and_none(spark):
    all_sil = np.zeros(50, dtype=np.int64)
    none_sil = np.full(50, 30000, dtype=np.int64)
    got = audio_silence_runs(_spectral_clips_df(spark, {
        "all": _pcm_from_raw(all_sil), "none": _pcm_from_raw(none_sil),
    })).toPandas().set_index("clip_id")
    a = got.loc["all"]
    assert (a.n_silent, a.n_runs, a.longest_run, a.leading_run,
            a.trailing_run) == (50, 1, 50, 50, 50)
    n = got.loc["none"]
    assert (n.n_silent, n.n_runs, n.longest_run, n.leading_run,
            n.trailing_run) == (0, 0, 0, 0, 0)


def test_silence_threshold_boundary(spark):
    """|s| == SILENCE_RAW_T is silent; one more raw unit is not."""
    s = np.array([SILENCE_RAW_T, SILENCE_RAW_T + 1,
                  -SILENCE_RAW_T, -(SILENCE_RAW_T + 1)], dtype=np.int64)
    got = audio_silence_runs(
        _spectral_clips_df(spark, {"b": _pcm_from_raw(s)})
    ).toPandas().iloc[0]
    assert got.n_silent == 2
    assert got.n_runs == 2


# --------------------------------------------------------------------------
# cross-modal transcript/metadata consistency
# --------------------------------------------------------------------------

def _consistency_clips(spark, rows):
    """rows: (clip_id, pcm float array, sr_true, sr_meta, dur_ms_meta,
    transcript) -- encodes real WAV bytes at sr_true, declares the meta
    columns as given."""
    recs = []
    for cid, pcm, sr_true, sr_meta, dur_meta, txt in rows:
        raw = A.encode_wav(np.asarray(pcm, dtype=np.float64), sr_true,
                           "pcm_s16le")
        recs.append((cid, raw, sr_meta, dur_meta, "pcm_s16le", txt))
    return spark.createDataFrame(
        pd.DataFrame(recs, columns=["clip_id", "bytes", "sr_hz", "dur_ms",
                                    "codec", "transcript"])
    )


def test_transcript_consistency_flags(spark):
    from locality_sensitive_hashing_spark.operators.multimodal import (
        transcript_consistency,
    )

    sr = 8000
    pcm = np.sin(np.linspace(0, 20, 2000))  # 2000 samples @ 8k = 250 ms
    # 250 chars / 0.25 s = 1000 cps (normalized length: letters+spaces)
    txt_ok = ("abcde " * 50)[:250].strip()
    rows = [
        ("ok", pcm, sr, sr, 250, txt_ok),
        ("baddur", pcm, sr, sr, 260, txt_ok),          # dur_ms lies
        ("badsr", pcm, sr, sr + 100, 250, txt_ok),     # sr_hz lies
        ("fast", pcm, sr, sr, 250, "z" * 600),         # 2400 cps > max
        ("slow", pcm, sr, sr, 250, "hi"),              # 8 cps < min
        ("garbage", None, sr, sr, 250, txt_ok),
    ]
    recs = []
    for cid, p, srt, srm, dm, txt in rows:
        raw = (b"nope" if p is None else
               A.encode_wav(np.asarray(p), srt, "pcm_s16le"))
        recs.append((cid, raw, srm, dm, "pcm_s16le", txt))
    df = spark.createDataFrame(
        pd.DataFrame(recs, columns=["clip_id", "bytes", "sr_hz", "dur_ms",
                                    "codec", "transcript"])
    )
    got = transcript_consistency(df, 500.0, 1800.0).toPandas().set_index(
        "clip_id"
    )
    ok = got.loc["ok"]
    assert ok.decode_ok and ok.meta_ok and ok.rate_ok
    assert ok.dur_ms_dec == 250 and ok.sr_dec == 8000
    assert abs(ok.chars_per_s - len(ok_norm := txt_ok) * 4.0) < 1e-9
    assert not got.loc["baddur"].meta_ok and got.loc["baddur"].rate_ok
    assert not got.loc["badsr"].meta_ok
    assert got.loc["badsr"].sr_meta == 8100 and got.loc["badsr"].sr_dec == 8000
    assert got.loc["fast"].meta_ok and not got.loc["fast"].rate_ok
    assert got.loc["slow"].meta_ok and not got.loc["slow"].rate_ok
    g = got.loc["garbage"]
    assert not g.decode_ok and not g.meta_ok and not g.rate_ok
    assert g.dur_ms_dec == 0 and g.chars_per_s == 0.0


def test_transcript_consistency_integer_duration(spark):
    """dur_ms_dec is exact integer floor(n_samples*1000/sr) -- including
    non-divisible sample counts."""
    from locality_sensitive_hashing_spark.operators.multimodal import (
        transcript_consistency,
    )

    pcm = np.zeros(1001)  # 1001 samples @ 8000 Hz = 125.125 ms -> 125
    df = _consistency_clips(
        spark, [("t", pcm, 8000, 8000, 125, "some text here")]
    )
    got = transcript_consistency(df).toPandas().iloc[0]
    assert got.dur_ms_dec == 1001 * 1000 // 8000 == 125
    assert got.meta_ok
