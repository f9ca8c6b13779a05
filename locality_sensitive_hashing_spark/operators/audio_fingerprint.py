"""Gain-invariant audio fingerprint detector (Haitsma-Kalker sign bits).

The frame-energy LSH detector (operators/audio_lsh.py) pairs trimmed and
low-level-noise re-masters, but its log-quantized energy symbols are NOT
invariant to volume: a +6 dB re-master shifts EVERY symbol by
``4 * 2^sub_bits`` bins, so the shingle sets of a gain-scaled
republication are disjoint from the source's and the detector misses it
by construction.  This operator closes that gap with the classic
*energy-difference sign* fingerprint of Haitsma & Kalker, "A Highly
Robust Audio Fingerprinting System" (ISMIR 2002): per frame and band, one
bit encodes the SIGN of the difference-of-differences of band magnitude

    bit[f][b] = ( (M[f][b] - M[f][b+1]) - (M[f-1][b] - M[f-1][b+1]) ) > 0

which is exactly invariant under any positive gain g (every M scales by
g, so every difference scales by g and no sign flips) and empirically
robust to low-level additive noise (a flipped bit needs the dither to
cross a difference-of-differences boundary; measured on the tuned
fixture: +/-8-LSB integer dither flips a median 1.1% / max 12.2% of
bits, while unrelated clips disagree on >= 36.7%).

Integer-exactness contract (the property that lets DuckDB replay the
ENTIRE derivation from raw WAV bytes): band magnitude is the L1 proxy
``M[f][b] = |sum_i s[f*N+i]*wc[b][i]| + |sum_i s[f*N+i]*ws[b][i]|`` over
non-overlapping N=256-sample frames against the SAME fixed-point integer
DFT weight tables the spectral-profile kernel matmuls
(multimodal.spectral_weights -- single source of truth, embedded in the
oracle as the identical VALUES literal).  |s| <= 32768, |w| <= 32767,
N = 256 keeps every correlation <= 2.8e14 and every
difference-of-differences <= 2.3e15 -- exact int64 end to end, no
squaring (an L2 energy would overflow int64 at this weight scale), no
floats anywhere.  Gain invariance is therefore EXACT for integer-scaled
re-masters: s -> 2*s doubles every correlation exactly and preserves
every sign (ties stay ties: dd == 0 maps to bit 0 on both sides).

Pipeline (mirrors the engine's detector shape -- block, cap, verify):

1. **Fingerprint kernel** (the one Arrow Python crossing): decode
   canonical s16le WAV -> int64 samples -> (F, 4) band magnitudes (one
   (F*N) x (N, 8) int64 matmul per clip) -> 3-bit frame codes for frames
   1..F-1, plus ``n_active`` = #frames whose dd row is not all-zero.
2. **Low-information floor**: a clip participates in blocking only with
   ``n_codes >= MIN_CODES`` and ``n_active >= MIN_ACTIVE_FRAC *
   n_codes``.  Digital silence and frame-periodic tones (frequency a
   multiple of sr/N) have dd == 0 everywhere -- all-zero codes that
   would zero-BER-match ANY other degenerate clip; the floor excludes
   them (measured: enveloped-tone corpus activity is 1.0, silence and
   437.5/500 Hz tones at 8 kHz are 0.0).
3. **Pigeonhole blocking** (HK's sub-fingerprint lookup): every run of
   ``WINDOW`` consecutive codes packs into one integer key; a candidate
   pair shares at least one (window position, packed key) block.  At the
   fixture's +/-8-LSB dither every planted pair retains >= 1 exact
   window (measured 40/40; W=16 drops to 31/40, W=8 is the tuned
   choice).  Bucket sizes in (1, bucket_cap] emit pairs --
   hot degenerate buckets are dropped loudly like every other detector
   (candidates.dropped_blocks).
4. **BER verify**: candidate pairs with equal code length are scored by
   exact bit-error-rate over the full code sequence --
   ``sum(bit_count(c1 XOR c2)) / (3 * n_codes)`` -- JVM-side
   (zip_with + bit_count inside whole-stage codegen, no Python); pairs
   with BER <= BER_MAX are emitted.  Equal length is part of aligned
   semantics: this detector targets same-length re-masters (gain /
   dither); trimming is the energy detector's axis.

Scale notes (10^12 clips): the kernel is one linear Arrow pass over
(clip_id, bytes) with bytes pruned immediately after; codes are ~4 B per
25.6 k samples of audio.  Blocking shuffles |clips| * ~n_codes rows of
(int, long) keys -- same shape and same bounded-bucket cap as the text
detectors; the verify join carries only the code arrays.  WINDOW=8
(24-bit keys) is tuned to this fixture's clip length; a production
deployment at longer clips widens WINDOW (the key domain grows 8x per
extra code) and keeps the same plan.

Reference parity: the reference (REF? -- mount empty, SURVEY.md section
0.2) has no audio axis; this is the graft's payload-native companion to
its LSH design, using pigeonhole exact-match blocking (the same
principle as operators/simhash.py's Hamming chunks) instead of MinHash
banding because HK fingerprints are POSITIONAL bit strings, not sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.operators.audio_lsh import (
    _canonical_s16le_samples,
)
from locality_sensitive_hashing_spark.operators.multimodal import (
    SPECTRAL_BINS,
    SPECTRAL_WINDOW,
    spectral_weights,
)

# non-overlapping analysis frame, in samples (= the spectral kernel's
# window length so the weight tables are shared verbatim).
FRAME_N = SPECTRAL_WINDOW
# bits per frame code = len(SPECTRAL_BINS) - 1 adjacent-band differences.
CODE_BITS = len(SPECTRAL_BINS) - 1
# pigeonhole window: consecutive codes per block key (24-bit keys here;
# tuned -- see module docstring step 3).
WINDOW = 8
# verified pairs must have bit-error-rate <= this (dup <= 0.122 measured,
# cross-clip >= 0.367 -- wide margins both sides).
BER_MAX = 0.2
# LOW-INFORMATION FLOOR: minimum frame codes (>= 2 windows of evidence)
# and minimum fraction of ACTIVE frames (dd row not all zero).
MIN_CODES = 2 * WINDOW
MIN_ACTIVE_FRAC = 0.3


def frame_band_mags(ints: np.ndarray, frame_n: int = FRAME_N) -> np.ndarray:
    """int samples -> (F, B) exact-int64 L1 band magnitudes.

    Full frames only (the trailing partial frame is dropped, NOT
    zero-padded -- a partial frame's magnitude is amplitude-dependent in
    a way that breaks nothing but adds an oracle branch for no
    robustness gain).  M[f][b] = |sum s*wc[b]| + |sum s*ws[b]|.
    """
    wc, ws = spectral_weights()
    nf = ints.size // frame_n
    if nf == 0:
        return np.zeros((0, len(SPECTRAL_BINS)), dtype=np.int64)
    x = ints[: nf * frame_n].reshape(nf, frame_n).astype(np.int64)
    return np.abs(x @ wc.T) + np.abs(x @ ws.T)


def fingerprint_codes(mags: np.ndarray) -> tuple[np.ndarray, int]:
    """(F, B) magnitudes -> (codes[F-1], n_active).

    code[f-1] = sum_b ( (d[f][b] - d[f-1][b]) > 0 ) << b  with
    d[f][b] = M[f][b] - M[f][b+1]; n_active counts frames whose
    difference-of-differences row is not identically zero.
    """
    if mags.shape[0] < 2:
        return np.zeros(0, dtype=np.int64), 0
    d = mags[:, :-1] - mags[:, 1:]
    dd = d[1:] - d[:-1]
    bits = (dd > 0).astype(np.int64)
    codes = np.zeros(dd.shape[0], dtype=np.int64)
    for b in range(dd.shape[1]):
        codes |= bits[:, b] << b
    return codes, int((dd != 0).any(axis=1).sum())


def fingerprint_udf():
    """Arrow pandas UDF: wav bytes -> struct(decode_ok, codes, n_active).

    One Python crossing for decode -> band magnitudes -> sign codes;
    everything downstream (floor, windows, buckets, BER) is JVM-side.
    """

    @F.pandas_udf("decode_ok boolean, codes array<int>, n_active int")
    def compute(raw: pd.Series) -> pd.DataFrame:
        oks, codes_out, act_out = [], [], []
        for blob in raw:
            ints = _canonical_s16le_samples(bytes(blob)) if blob is not None else None
            if ints is None or ints.size == 0:
                oks.append(False)
                codes_out.append([])
                act_out.append(0)
                continue
            codes, n_active = fingerprint_codes(frame_band_mags(ints))
            oks.append(True)
            codes_out.append(codes.astype(np.int32).tolist())
            act_out.append(n_active)
        return pd.DataFrame(
            {"decode_ok": oks, "codes": codes_out, "n_active": act_out}
        )

    return compute


def with_fingerprints(clips: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """(id_col, decode_ok, codes, n_active) -- bytes pruned right after
    the kernel so no downstream shuffle carries the payload (same
    discipline as audio_lsh.with_energy_signatures)."""
    udf = fingerprint_udf()
    return (
        clips.select(id_col, "bytes")
        .withColumn("_fp", udf(F.col("bytes")))
        .select(
            id_col,
            F.col("_fp.decode_ok").alias("decode_ok"),
            F.col("_fp.codes").alias("codes"),
            F.col("_fp.n_active").alias("n_active"),
        )
    )


def eligible_fingerprints(feats: DataFrame) -> DataFrame:
    """Apply the low-information floor (module docstring step 2)."""
    return feats.where(
        F.col("decode_ok")
        & (F.size("codes") >= MIN_CODES)
        & (F.col("n_active") >= F.size("codes") * F.lit(MIN_ACTIVE_FRAC))
    )


def fingerprint_blocks(
    feats: DataFrame, id_col: str = "clip_id", window: int = WINDOW
) -> DataFrame:
    """(id, win_idx, wkey) pigeonhole blocking rows: every WINDOW-run of
    consecutive codes packed big-endian into one long (codes < 2^CODE_BITS
    so the pack is injective).  Pure JVM higher-order functions."""
    pack = F.expr(
        f"transform(sequence(0, size(codes) - {window}), w -> "
        f"aggregate(slice(codes, w + 1, {window}), 0L, "
        f"(acc, c) -> acc * {1 << CODE_BITS} + c))"
    )
    return eligible_fingerprints(feats).select(
        id_col, F.posexplode(pack).alias("win_idx", "wkey")
    )


def fingerprint_near_dups(
    clips: DataFrame,
    cfg: Config,
    ber_max: float = BER_MAX,
    window: int = WINDOW,
) -> DataFrame:
    """End-to-end gain-invariant near-dup pairs: (id1, id2, n_codes,
    ber_6dp).

    Blocking buckets are capped at cfg.bucket_cap exactly like every
    other detector; the verify is exact BER over the aligned full code
    sequences (equal length required), JVM-side."""
    from locality_sensitive_hashing_spark.operators.candidates import (
        pairs_from_blocks,
    )

    # blocking + both verify sides reference this plan; persist so the
    # Arrow kernel decodes each clip once per run
    feats = with_fingerprints(clips).persist()
    blocks = fingerprint_blocks(feats, window=window)
    pairs = pairs_from_blocks(
        blocks, ["win_idx", "wkey"], cfg.bucket_cap, "audio_fp"
    ).select("id1", "id2")
    c1 = feats.select(F.col("clip_id").alias("id1"), F.col("codes").alias("_c1"))
    c2 = feats.select(F.col("clip_id").alias("id2"), F.col("codes").alias("_c2"))
    ber = F.expr(
        "aggregate(zip_with(_c1, _c2, (a, b) -> bit_count(a ^ b)), 0, "
        "(acc, x) -> acc + x)"
    ).cast("double") / (F.lit(CODE_BITS) * F.size("_c1"))
    return (
        pairs.join(c1, "id1")
        .join(c2, "id2")
        .where(F.size("_c1") == F.size("_c2"))
        .withColumn("ber_6dp", F.round(ber, 6))
        .where(F.col("ber_6dp") <= ber_max)
        .select("id1", "id2", F.size("_c1").alias("n_codes"), "ber_6dp")
    )
