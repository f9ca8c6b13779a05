"""Content-class grouping: the engine's core scale lever.

At 10^12-clip scale most mass is duplicated content: the same transcript
re-crawled, the same audio re-encoded or byte-copied.  Every text-derived
computation (shingles, MinHash, SimHash, winnowing, LCS, Jaccard) is a pure
function of the normalized transcript, and the PCM verdict is a pure
function of the two byte payloads.  So the pipeline:

1. keys every clip by ``text_key = sha256(norm)`` and
   ``audio_key = sha256(bytes)`` (256-bit -- collision-free at any scale,
   unlike 64-bit at 10^12 rows);
2. runs ALL detectors on **distinct texts** (one signature per distinct
   transcript, not per clip);
3. partitions each text group into **audio classes** (byte-identical
   payloads) and verifies only class *representatives* -- byte-equal
   members connect to their representative through linear chain edges, and
   ``pcm_compare(a, b)`` equals ``pcm_compare(rep(a), rep(b))`` because
   both are functions of the byte payloads alone, so representative-level
   verification yields EXACTLY the same connected components as all-pairs
   verification.

This turns the quadratic candidate work from O(clips-per-bucket^2) into
O(distinct-content-classes-per-bucket^2), which is the difference between
"melts at a 20x-replicated crawl" and "linear in unique content".

The reference (single-corpus text demo, REF?lsh_matrix.py, UNVERIFIED --
empty mount) had no such layer; its semantics are preserved for distinct
content and extended to replicated content per BASELINE.json's 10^12-clip
north star.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.functions.text import normalize_text


def with_content_keys(clips: DataFrame) -> DataFrame:
    """(clip_id, text_key, audio_key) + norm -- one pass over the corpus.

    The only stage that reads both `transcript` and `bytes`; everything
    downstream joins on the 32-byte keys instead of hauling payloads.
    """
    # keys truncated to 128 bits (32 hex chars): still collision-free at
    # 10^12 rows (birthday bound ~2^-40), and the key strings ride every
    # downstream pair shuffle -- half the bytes of a full sha256 hex.
    return clips.select(
        "clip_id",
        normalize_text("transcript").alias("norm"),
        F.substring(F.sha2(normalize_text("transcript"), 256), 1, 32).alias("text_key"),
        F.substring(F.sha2(F.col("bytes"), 256), 1, 32).alias("audio_key"),
    )


def distinct_texts(keyed: DataFrame) -> DataFrame:
    """(text_key, norm): one row per distinct normalized transcript."""
    return keyed.groupBy("text_key").agg(F.min("norm").alias("norm"))


def audio_classes(
    keyed: DataFrame,
    clips: DataFrame | None = None,
    cfg: Config | None = None,
) -> DataFrame:
    """(text_key, audio_key, rep, n_members [, decode_ok, n_samples,
    digest, e_ok, e_shingles, e_sig]): one row per byte-identical payload
    class within a text group; rep = min clip_id.

    When ``clips`` is given, the representative payload is decoded ONCE
    per class and summarized (decodability, sample count, quantized sample
    digest) so pair verification can screen JVM-side on 256-byte digests
    instead of shuffling full payloads (operators/verify.py).  The SAME
    decode pass also emits the frame-energy content profile
    (operators/audio_lsh.py kernels: quantized log-energy shingles + the
    seed-pinned MinHash signature over them) and the gain-invariant
    Haitsma-Kalker sign-bit fingerprint
    (operators/audio_fingerprint.py: fp_codes + fp_active), so BOTH
    flagship audio-content detectors cost zero additional passes over
    payload bytes -- at 10^12 clips a second decode sweep would double
    the corpus-linear I/O for the audio axis.
    """
    cls = keyed.groupBy("text_key", "audio_key").agg(
        F.min("clip_id").alias("rep"), F.count("*").alias("n_members")
    )
    if clips is None:
        return cls
    meta = class_audio_meta_udf(cfg)
    return (
        cls.join(clips.select(F.col("clip_id").alias("rep"), "bytes"), "rep")
        .withColumn("_m", meta(F.col("bytes")))
        .select(
            "text_key", "audio_key", "rep", "n_members",
            F.col("_m.decode_ok").alias("decode_ok"),
            F.col("_m.n_samples").alias("n_samples"),
            F.col("_m.digest").alias("digest"),
            F.col("_m.e_ok").alias("e_ok"),
            F.col("_m.e_shingles").alias("e_shingles"),
            F.col("_m.e_sig").alias("e_sig"),
            F.col("_m.fp_codes").alias("fp_codes"),
            F.col("_m.fp_active").alias("fp_active"),
        )
    )


def class_audio_meta_udf(cfg: Config | None = None):
    """pandas UDF: wav bytes -> struct(decode_ok, n_samples, digest,
    e_ok, e_shingles, e_sig, fp_codes, fp_active).

    Runs once per audio class representative; the digest feeds the exact
    allclose pre-screen (audio.pcm_digest), the e_* columns feed the
    frame-energy content detector (operators/audio_lsh.py), and the fp_*
    columns feed the gain-invariant sign-bit fingerprint detector
    (operators/audio_fingerprint.py).  e_ok is the canonical-s16le parse
    flag shared by both content detectors -- their kernels only define
    semantics over canonical pcm_s16le payloads, matching the standalone
    detectors and their DuckDB oracles."""
    import numpy as np

    from locality_sensitive_hashing_spark import audio as A
    from locality_sensitive_hashing_spark import hashing as H
    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG
    from locality_sensitive_hashing_spark.operators.audio_fingerprint import (
        fingerprint_codes,
        frame_band_mags,
    )
    from locality_sensitive_hashing_spark.operators.audio_lsh import (
        _canonical_s16le_samples,
        frame_energy_symbols,
        shingle_encode,
    )

    c = cfg or DEFAULT_CONFIG
    ha, hb = H.hash_family(c)
    prime = c.modulo_prime

    @F.pandas_udf(
        "decode_ok boolean, n_samples long, digest array<long>, "
        "e_ok boolean, e_shingles array<int>, e_sig array<int>, "
        "fp_codes array<int>, fp_active int"
    )
    def compute(b: pd.Series) -> pd.DataFrame:
        oks, ns, digs, eoks, eshs, esigs = [], [], [], [], [], []
        fpcs, fpas = [], []
        for raw in b:
            raw = bytes(raw or b"")
            try:
                pcm, _ = A.decode_wav(raw)
                ok = pcm.size > 0
            except Exception:
                pcm, ok = None, False
            oks.append(ok)
            ns.append(int(pcm.size) if ok else 0)
            digs.append(A.pcm_digest(pcm).tolist() if ok else [])
            ints = _canonical_s16le_samples(raw)
            if ints is not None and ints.size > 0:
                sh = shingle_encode(frame_energy_symbols(ints))
                sig = H.minhash_signature(sh.astype(np.uint64), ha, hb, prime)
                eoks.append(True)
                eshs.append(sh.astype(np.int32).tolist())
                esigs.append(sig.astype(np.int32).tolist())
                codes, n_active = fingerprint_codes(frame_band_mags(ints))
                fpcs.append(codes.astype(np.int32).tolist())
                fpas.append(n_active)
            else:
                eoks.append(False)
                eshs.append([])
                esigs.append([])
                fpcs.append([])
                fpas.append(0)
        return pd.DataFrame({
            "decode_ok": oks, "n_samples": ns, "digest": digs,
            "e_ok": eoks, "e_shingles": eshs, "e_sig": esigs,
            "fp_codes": fpcs, "fp_active": fpas,
        })

    return compute


def chain_edges(keyed: DataFrame) -> DataFrame:
    """Star within-class edges: every member links to its class rep.

    Byte-equality is transitive, so a STAR on the representative (min
    clip_id) is as good as a clique for connected components -- O(n)
    edges like a path, but diameter 2 instead of n-1, so min-label
    propagation converges in O(1) rounds even for classes with millions
    of byte-identical members. Columns: (id1, id2, text_key, audio_key),
    id1 = rep < id2.
    """
    w = Window.partitionBy("text_key", "audio_key")
    return (
        keyed.withColumn("_rep", F.min("clip_id").over(w))
        .where(F.col("clip_id") != F.col("_rep"))
        .select(
            F.col("_rep").alias("id1"),
            F.col("clip_id").alias("id2"),
            "text_key",
            "audio_key",
        )
    )


def group_class_counts(classes: DataFrame) -> DataFrame:
    """(text_key, n_classes) -- audio-class count per text group."""
    return classes.groupBy("text_key").agg(F.count("*").alias("n_classes"))


def within_group_rep_pairs(classes: DataFrame, cfg: Config) -> DataFrame:
    """Cross-audio-class representative pairs inside each text group.

    Groups with more than ``bucket_cap`` audio classes are dropped (the
    bounded-explosion rule, surfaced via :func:`dropped_groups`).
    Columns: (id1, id2) with id1 < id2 (clip ids of class reps).
    """
    counts = group_class_counts(classes)
    elig = counts.where(
        (F.col("n_classes") > 1) & (F.col("n_classes") <= cfg.bucket_cap)
    ).select("text_key")
    reps = classes.join(elig, "text_key").select("text_key", "rep")
    l = reps.select("text_key", F.col("rep").alias("id1"))
    r = reps.select("text_key", F.col("rep").alias("id2"))
    return (
        l.join(r, "text_key")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )


def dropped_groups(classes: DataFrame, cfg: Config) -> DataFrame:
    """Text groups whose audio-class count exceeds the cap (logged)."""
    return group_class_counts(classes).where(F.col("n_classes") > cfg.bucket_cap)


