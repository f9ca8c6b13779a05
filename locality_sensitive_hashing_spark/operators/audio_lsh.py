"""Content-based audio near-duplicate detector (frame-energy MinHash LSH).

Every other detector in this engine keys off the TRANSCRIPT (MinHash /
SimHash / suffix-array over text) or off byte-identical audio (content
classes via sha256).  This operator closes the remaining gap on the audio
axis: near-duplicate *audio content* whose bytes differ -- a clip
re-published with its head trimmed, or re-recorded with low-level noise --
published under a DIFFERENT transcript, which no text detector and no
byte-equality class can ever pair up.

Pipeline (same LSH shape as the text detectors, reusing the pinned
universal-hash family ``hashing.hash_family(cfg)`` and the cfg's
bands/rows/bucket-cap):

1. **Frame-energy symbols** (the one Python kernel, Arrow-batched): decode
   canonical s16le WAV -> int16 samples -> per-frame integer energy
   ``E_f = sum(s^2)`` over ``frame_n``-sample frames -> sub-octave
   log-quantized symbol ``q = bit_length(E) * 2^sub_bits +
   floor((mantissa-1) * 2^sub_bits)``.  **Pure integer arithmetic end to
   end** (the float64 ops used -- bincount of exact int products < 2^53,
   frexp exponent -- are exact), so the DuckDB oracle replays the ENTIRE
   derivation from the raw bytes with hex()+byte arithmetic and
   ``length(format('{:b}', E))``; nothing downstream of the parquet bytes
   is trusted.  The quantization is deliberately log-scale: additive noise
   at SNR >= ~35 dB perturbs frame energy by ~2% (the s.n cross term),
   well inside a 6 dB/2^sub_bits bin, while trimming shifts frame
   boundaries and leaves the surviving frames' energies bit-identical.
2. **Shingles**: k consecutive symbols, *exactly* integer-encoded as
   ``q0*B^2 + q1*B + q2`` (B = ``SYM_BASE`` > max symbol) -- no hash
   function at all, so the oracle needs no VALUES-literal kernel replay
   here either.  Fewer than k frames -> the {0} sentinel (same convention
   as text shingles).
3. **MinHash + banding**: ``sig[j] = min (a_j*x+b_j) mod P`` over the
   shingle set (``hashing.minhash_signature`` verbatim -- shingles < P so
   the mod-P reduction is the identity), banded into ``cfg.bands`` keys.
   Band keys are the **tuple of r signature values** rendered as a
   comma-joined string -- not the uint64 band mix the text path uses --
   precisely so DuckDB replays them with ``string_agg`` (the mix would
   need another aux table; the tuple IS the bucket identity anyway).
4. **Buckets -> pairs -> exact-Jaccard verify**: bucket sizes in
   (1, bucket_cap] emit distinct (id1 < id2) pairs; each pair is verified
   by EXACT Jaccard over the shingle arrays (arrays are ~n_frames long --
   tiny -- so `array_intersect`/`array_union` stay JVM-side and cheap).

Scale notes (10^12 clips): the kernel is one linear Arrow pass over
(clip_id, bytes) -- `bytes` is pruned out immediately after; signatures
are ~H*4 bytes/row.  The banding shuffle keys on (band_id, band_key)
exactly like the text detectors, with the same bounded-bucket cap
(`cfg.bucket_cap`) protecting against hot buckets, and a LOW-INFORMATION
floor (``MIN_PROFILE_SHINGLES``) excluding degenerate profiles from
blocking entirely -- silence, constant tones, and sub-300 ms clips
quantize to tiny shingle sets over which Jaccard carries no evidence
(measured: 14,453 -> 48 false cross-transcript pairs on an adversarial
flat-tone corpus, zero recall loss on the enveloped planted fixture,
whose minimum set size is exactly the floor).  The verify join carries only the
shingle arrays (~n_frames ints), not audio bytes.  Thresholds/constants
were tuned on the deterministic fixture sweep in tests/test_audio_lsh.py:
trim pairs land at J ~0.71-0.82, 40 dB-SNR noise pairs at J >= 0.5,
cross-corpus pairs at J <= 0.06.

Reference parity: the reference (REF? -- mount empty, SURVEY.md section
0.2) has no audio axis at all; this operator is the graft's
payload-native extension of its MinHash-over-shingles design (MMDS
sections 3.3-3.4 applied to an energy-contour alphabet instead of text).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark import hashing as H
from locality_sensitive_hashing_spark.config import Config

# 25 ms at the fixture's 8 kHz -- the standard short-time energy frame.
FRAME_N = 200
# sub-octave quantization: 2^2 = 4 bins per energy octave (~1.5 dB bins).
SUB_BITS = 2
# consecutive-symbol gram size (energy contours are short; 3 keeps ~n_frames
# shingles per clip while still encoding local shape).
SHINGLE_K = 3
# integer shingle encoding base; must exceed the max symbol
# (bit_length <= 40 for E < 200*2^30, so symbol <= 40*4+3 = 163).
SYM_BASE = 512
# emitted pairs must clear this exact-Jaccard bar (trim ~0.78, noise >= 0.5,
# cross-corpus <= 0.06 on the tuned fixture -- wide margins both sides).
JACCARD_THRESHOLD = 0.35
# LOW-INFORMATION PROFILE FLOOR: a clip participates in energy-LSH blocking
# only if its distinct-shingle set has at least this many elements.  Jaccard
# over tiny sets carries no evidence (two unrelated flat tones quantize to
# 1-5 shingles and meet ANY threshold at J=1.0): on an adversarial corpus of
# 539 flat synth tones the detector emitted 14,453 cross-transcript verified
# pairs -- ALL false -- without the floor, 48 with it, while the enveloped
# planted fixture (min set size 10) loses nothing and keeps recall 1.0.
# Clips below the floor (silence, constant tones, < ~300 ms of audio) are
# still deduped by the byte-exact content class; they simply cannot claim
# CONTENT-level identity from an energy contour this short.
MIN_PROFILE_SHINGLES = 10


def frame_energy_symbols(
    ints: np.ndarray, frame_n: int = FRAME_N, sub_bits: int = SUB_BITS
) -> np.ndarray:
    """int16 samples -> per-frame quantized log-energy symbols (int64).

    E_f = sum(s^2) over frame f (trailing partial frame included);
    symbol = bit_length(E)*2^sub_bits + floor((E/2^(bl-1) - 1)*2^sub_bits),
    i.e. the exponent plus the top sub_bits mantissa bits -- all integer.
    E = 0 (digital silence) -> symbol 0.  Exactness: s^2 <= 2^30, frame
    sums < 2^38 (exact in float64 bincount); frexp's exponent of an
    exactly-represented integer IS its bit length.
    """
    n = ints.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.arange(n) // frame_n
    e = np.bincount(idx, weights=(ints * ints).astype(np.float64)).astype(np.int64)
    bl = np.frexp(e.astype(np.float64))[1].astype(np.int64)
    sub = np.left_shift(e, sub_bits) >> np.maximum(bl - 1, 0)
    sym = bl * (1 << sub_bits) + sub - (1 << sub_bits)
    return np.where(e > 0, sym, 0)


def _canonical_s16le_samples(raw: bytes) -> np.ndarray | None:
    """Parse a canonical-header s16le WAV blob to int64 samples.

    Mirrors EXACTLY the oracle SQL's canon predicate (fixed-offset
    RIFF/WAVE/fmt/data layout, format tag 1, 16 bits) -- nothing more:
    this kernel and the DuckDB replay must accept/reject the same blobs.
    Corpus contract (shared with the audio_features oracle,
    entry_queries.py): clips are canonical pcm_s16le with
    len(raw) >= 44 + data_len; a truncated data chunk returns None here
    (the oracle would error, so the fixture generator never emits one).
    """
    if (
        len(raw) < 44
        or raw[0:4] != b"RIFF"
        or raw[8:12] != b"WAVE"
        or raw[12:16] != b"fmt "
        or struct.unpack("<H", raw[20:22])[0] != 1
        or struct.unpack("<H", raw[34:36])[0] != 16
        or raw[36:40] != b"data"
    ):
        return None
    (data_len,) = struct.unpack("<I", raw[40:44])
    if len(raw) < 44 + data_len:
        return None
    return np.frombuffer(raw[44 : 44 + data_len - (data_len % 2)], dtype="<i2").astype(
        np.int64
    )


def shingle_encode(
    syms: np.ndarray, k: int = SHINGLE_K, base: int = SYM_BASE
) -> np.ndarray:
    """Distinct integer-encoded k-grams of the symbol sequence (sorted).

    Exact positional encoding q0*base^(k-1) + ... + q_{k-1} -- injective
    because every symbol < base.  Fewer than k symbols -> the {0}
    sentinel (text-shingle convention, hashing.shingle_set)."""
    if syms.size < k:
        return np.zeros(1, dtype=np.int64)
    enc = np.zeros(syms.size - k + 1, dtype=np.int64)
    for j in range(k):
        enc = enc * base + syms[j : syms.size - k + 1 + j]
    return np.unique(enc)


def energy_signature_udf(
    cfg: Config,
    frame_n: int = FRAME_N,
    sub_bits: int = SUB_BITS,
    k: int = SHINGLE_K,
    base: int = SYM_BASE,
):
    """Arrow pandas UDF: wav bytes -> struct(decode_ok, syms, shingles, sig).

    One Python crossing for the whole feature chain (decode -> energies ->
    symbols -> shingles -> minhash), mirroring the text path's
    ``signature_udf``; everything after this column is JVM-side.  The
    (a, b) family is the SAME seed-pinned family as the text MinHash, so
    the oracle reuses the existing _UHASH_VALUES literals.
    """
    a, b = H.hash_family(cfg)
    p = cfg.modulo_prime

    @F.pandas_udf(
        "decode_ok boolean, syms array<int>, shingles array<int>, sig array<int>"
    )
    def compute(raw: pd.Series) -> pd.DataFrame:
        oks, syms_out, shg_out, sig_out = [], [], [], []
        for blob in raw:
            ints = _canonical_s16le_samples(bytes(blob)) if blob is not None else None
            if ints is None or ints.size == 0:
                oks.append(False)
                syms_out.append([])
                shg_out.append([])
                sig_out.append([])
                continue
            syms = frame_energy_symbols(ints, frame_n, sub_bits)
            shingles = shingle_encode(syms, k, base)
            sig = H.minhash_signature(shingles.astype(np.uint64), a, b, p)
            oks.append(True)
            syms_out.append(syms.astype(np.int32).tolist())
            shg_out.append(shingles.astype(np.int32).tolist())
            sig_out.append(sig.astype(np.int32).tolist())
        return pd.DataFrame(
            {"decode_ok": oks, "syms": syms_out, "shingles": shg_out, "sig": sig_out}
        )

    return compute


def with_energy_signatures(
    clips: DataFrame, cfg: Config, id_col: str = "clip_id", **kw
) -> DataFrame:
    """(id_col, decode_ok, syms, shingles, sig) -- bytes pruned after the
    kernel (the select keeps Catalyst from carrying the payload into any
    downstream shuffle, same discipline as minhash.with_signatures).
    ``id_col='audio_key'`` is the intake-store shape: one row per distinct
    payload, so the kernel runs once per unique audio."""
    udf = energy_signature_udf(cfg, **kw)
    return (
        clips.select(id_col, "bytes")
        .withColumn("_e", udf(F.col("bytes")))
        .select(
            id_col,
            F.col("_e.decode_ok").alias("decode_ok"),
            F.col("_e.syms").alias("syms"),
            F.col("_e.shingles").alias("shingles"),
            F.col("_e.sig").alias("sig"),
        )
    )


def store_audio_udf(cfg: Config):
    """Arrow pandas UDF: wav bytes -> struct(decode_ok, shingles, sig,
    codes, n_active) -- the INTAKE-STORE audio kernel, ONE decode serving
    BOTH audio-content detectors (frame-energy LSH features for
    trim/noise re-masters + Haitsma-Kalker sign-bit fingerprint codes
    for gain/dither re-masters, operators/audio_fingerprint.py).  At
    10^12 clips a second decode sweep would double the corpus-linear
    payload I/O of the audio axis, so the streaming sink
    (streaming/incremental.py) and the maintenance loop's certification
    query both go through this kernel rather than chaining the two
    standalone ones."""
    # deferred: audio_fingerprint imports this module at its top level
    from locality_sensitive_hashing_spark.operators.audio_fingerprint import (
        fingerprint_codes,
        frame_band_mags,
    )

    a, b = H.hash_family(cfg)
    p = cfg.modulo_prime

    @F.pandas_udf(
        "decode_ok boolean, shingles array<int>, sig array<int>, "
        "codes array<int>, n_active int"
    )
    def compute(raw: pd.Series) -> pd.DataFrame:
        oks, shg_out, sig_out, cod_out, act_out = [], [], [], [], []
        for blob in raw:
            ints = _canonical_s16le_samples(bytes(blob)) if blob is not None else None
            if ints is None or ints.size == 0:
                oks.append(False)
                shg_out.append([])
                sig_out.append([])
                cod_out.append([])
                act_out.append(0)
                continue
            syms = frame_energy_symbols(ints, FRAME_N, SUB_BITS)
            shingles = shingle_encode(syms, SHINGLE_K, SYM_BASE)
            sig = H.minhash_signature(shingles.astype(np.uint64), a, b, p)
            codes, n_active = fingerprint_codes(frame_band_mags(ints))
            oks.append(True)
            shg_out.append(shingles.astype(np.int32).tolist())
            sig_out.append(sig.astype(np.int32).tolist())
            cod_out.append(codes.astype(np.int32).tolist())
            act_out.append(n_active)
        return pd.DataFrame(
            {"decode_ok": oks, "shingles": shg_out, "sig": sig_out,
             "codes": cod_out, "n_active": act_out}
        )

    return compute


def with_store_audio_features(
    clips: DataFrame, cfg: Config, id_col: str = "audio_key"
) -> DataFrame:
    """(id_col, decode_ok, shingles, sig, codes, n_active) -- the intake
    store's per-distinct-payload audio row, bytes pruned right after the
    one combined kernel (:func:`store_audio_udf`)."""
    udf = store_audio_udf(cfg)
    return (
        clips.select(id_col, "bytes")
        .withColumn("_e", udf(F.col("bytes")))
        .select(
            id_col,
            F.col("_e.decode_ok").alias("decode_ok"),
            F.col("_e.shingles").alias("shingles"),
            F.col("_e.sig").alias("sig"),
            F.col("_e.codes").alias("codes"),
            F.col("_e.n_active").alias("n_active"),
        )
    )


def explode_energy_bands(
    feats: DataFrame, cfg: Config, id_col: str = "clip_id"
) -> DataFrame:
    """(id, band_id, bkey) blocking rows for the incremental path --
    the energy analog of minhash.explode_bands, emitting the tuple band
    keys of :func:`energy_band_keys`.  Undecodable rows (empty sig) and
    low-information profiles (< ``MIN_PROFILE_SHINGLES`` distinct
    shingles -- silence, flat tones, sub-300 ms clips) emit nothing:
    Jaccard over tiny shingle sets cannot evidence content identity."""
    return (
        feats.where(
            F.col("decode_ok")
            & (F.size("shingles") >= MIN_PROFILE_SHINGLES)
        )
        .select(id_col, F.posexplode(energy_band_keys(cfg)).alias("band_id", "bkey"))
    )


def energy_band_keys(cfg: Config) -> F.Column:
    """array<string> of cfg.bands tuple-keys: band j = the r signature
    values sig[j*r .. j*r+r-1] comma-joined (DuckDB replays with
    string_agg ORDER BY pos)."""
    r = cfg.rows_per_band
    return F.expr(
        f"transform(sequence(0, {cfg.bands - 1}), j -> "
        f"concat_ws(',', transform(slice(sig, j*{r} + 1, {r}), "
        f"v -> cast(v as string))))"
    )


def audio_candidate_pairs(feats: DataFrame, cfg: Config) -> DataFrame:
    """Banded-LSH candidate pairs over energy signatures: (id1, id2).

    Same bucket semantics as the text detectors: per (band_id, band_key)
    groups of size in (1, bucket_cap] self-join into distinct ordered
    pairs; singleton buckets emit nothing, over-cap buckets are dropped
    (bounded fan-out -- the silence-clip hot bucket lands here)."""
    bands = explode_energy_bands(feats, cfg)
    sizes = bands.groupBy("band_id", "bkey").agg(F.count("*").alias("n"))
    elig = sizes.where((F.col("n") > 1) & (F.col("n") <= cfg.bucket_cap)).select(
        "band_id", "bkey"
    )
    pruned = bands.join(elig, ["band_id", "bkey"])
    left = pruned.select(F.col("clip_id").alias("id1"), "band_id", "bkey")
    right = pruned.select(F.col("clip_id").alias("id2"), "band_id", "bkey")
    return (
        left.join(right, ["band_id", "bkey"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


# --- rate-normalized variant (cross-sample-rate re-publications) ----------
# The base detector frames by SAMPLE COUNT, so the same recording
# republished at a different sample rate has entirely different frame
# energies and escapes it.  Canonicalization closes the gap with ZERO
# rounding contract: every clip maps to a 16 kHz stream at exactly 2x
# amplitude scale -- a native 16 kHz clip contributes 2*s, an 8 kHz clip
# contributes multimodal.resample2x_s16(s) (even outputs 2*s[t], odd
# outputs s[t]+s[t+1]; already scaled by 2 by construction) -- so both
# sides of a cross-rate pair are exact integers on the SAME scale and
# the whole chain stays DuckDB-replayable from raw bytes.  Frames are
# 2*FRAME_N samples (the same 25 ms of time at the canonical rate);
# energies scale by 4 = a constant +2-octave symbol shift on BOTH
# sides, which Jaccard ignores.  Tuned on the fixture sweep
# (tests/test_audio_lsh.py): exact-upsample re-encodes land at J = 1.0
# (floor-halving a scale-2 stream loses only the odd-sum LSB), 40 dB
# noisy re-masters at J >= 0.647, cross-clip pairs at J <= 0.286;
# RATE_JACCARD_T = 0.45 splits with >= 0.16 margin both sides.
RATE_CANON_SR = 16000
RATE_FRAME_N = 2 * FRAME_N  # 25 ms at the canonical rate
RATE_JACCARD_T = 0.45


def rate_canonical_samples(raw: bytes) -> np.ndarray | None:
    """Canonical-header s16le WAV -> 16 kHz-at-2x-scale int64 stream
    (None for undecodable payloads or rates outside {8000, 16000} --
    a production deployment adds a resampler stage per extra rate)."""
    from locality_sensitive_hashing_spark.operators.multimodal import (
        resample2x_s16,
    )

    ints = _canonical_s16le_samples(raw)
    if ints is None:
        return None
    sr = int.from_bytes(raw[24:28], "little")
    if sr == RATE_CANON_SR:
        return 2 * ints.astype(np.int64)
    if sr * 2 == RATE_CANON_SR:
        return resample2x_s16(ints.astype(np.int64))
    return None


def with_rate_normalized_energy(
    clips: DataFrame, cfg: Config, id_col: str = "clip_id"
) -> DataFrame:
    """(id_col, decode_ok, shingles, sig) over the CANONICAL stream --
    the rate-normalized twin of :func:`with_energy_signatures`, one
    Arrow crossing, bytes pruned right after."""
    a, b = H.hash_family(cfg)
    p = cfg.modulo_prime

    @F.pandas_udf("decode_ok boolean, shingles array<int>, sig array<int>")
    def compute(raw: pd.Series) -> pd.DataFrame:
        oks, shg_out, sig_out = [], [], []
        for blob in raw:
            canon = (
                rate_canonical_samples(bytes(blob)) if blob is not None else None
            )
            if canon is None or canon.size == 0:
                oks.append(False)
                shg_out.append([])
                sig_out.append([])
                continue
            syms = frame_energy_symbols(canon, RATE_FRAME_N, SUB_BITS)
            shingles = shingle_encode(syms, SHINGLE_K, SYM_BASE)
            sig = H.minhash_signature(shingles.astype(np.uint64), a, b, p)
            oks.append(True)
            shg_out.append(shingles.astype(np.int32).tolist())
            sig_out.append(sig.astype(np.int32).tolist())
        return pd.DataFrame(
            {"decode_ok": oks, "shingles": shg_out, "sig": sig_out}
        )

    return (
        clips.select(id_col, "bytes")
        .withColumn("_e", compute(F.col("bytes")))
        .select(
            id_col,
            F.col("_e.decode_ok").alias("decode_ok"),
            F.col("_e.shingles").alias("shingles"),
            F.col("_e.sig").alias("sig"),
        )
    )


def rate_normalized_near_dups(
    clips: DataFrame,
    cfg: Config,
    threshold: float = RATE_JACCARD_T,
) -> DataFrame:
    """Cross-sample-rate content near-dup pairs: (id1, id2, jaccard),
    exact Jaccard over the canonical-stream shingle sets.  Blocking,
    caps, low-information floor and verify shape are the base
    detector's (:func:`audio_near_dups`) verbatim -- only the feature
    kernel differs."""
    feats = with_rate_normalized_energy(clips, cfg).persist()
    pairs = audio_candidate_pairs(feats, cfg)
    s1 = feats.select(F.col("clip_id").alias("id1"), F.col("shingles").alias("_sh1"))
    s2 = feats.select(F.col("clip_id").alias("id2"), F.col("shingles").alias("_sh2"))
    jac = (
        F.size(F.array_intersect("_sh1", "_sh2")).cast("double")
        / F.size(F.array_union("_sh1", "_sh2"))
    )
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def audio_near_dups(
    clips: DataFrame,
    cfg: Config,
    threshold: float = JACCARD_THRESHOLD,
    **kw,
) -> DataFrame:
    """End-to-end content near-dup pairs: (id1, id2, jaccard).

    jaccard is EXACT over the shingle sets (not the MinHash estimate):
    the sets are ~n_frames ints, so array_intersect/array_union per
    surviving pair is cheaper than shipping H signature components --
    the opposite trade from the text path, where shingle sets are ~100x
    bigger than signatures."""
    # three consumers reference this plan (banding + both pair sides);
    # persist so the Arrow kernel decodes each clip ONCE per run
    feats = with_energy_signatures(clips, cfg, **kw).persist()
    pairs = audio_candidate_pairs(feats, cfg)
    s1 = feats.select(F.col("clip_id").alias("id1"), F.col("shingles").alias("_sh1"))
    s2 = feats.select(F.col("clip_id").alias("id2"), F.col("shingles").alias("_sh2"))
    jac = (
        F.size(F.array_intersect("_sh1", "_sh2")).cast("double")
        / F.size(F.array_union("_sh1", "_sh2"))
    )
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
