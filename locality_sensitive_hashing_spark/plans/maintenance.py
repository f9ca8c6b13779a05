"""Incremental-maintenance building blocks (the maintenance loop's
candidate/screen/edge operators), shared by the spark-submit job
(jobs/maintain_clusters.py), the driver-channel certification query
(entry_queries.q_incremental_maintenance_clusters), and the A/B
harnesses.

These operate on INTAKE-STORE-shaped tables (streaming/incremental.py
layout): ``signatures`` (text_key, norm, sig, band_hashes),
``fingerprints`` (text_key, fingerprint), ``anchors`` (text_key,
anchor), ``energy`` (audio_key, decode_ok, shingles, sig [, codes,
n_active -- the combined kernel's gain-fingerprint columns; stores
written before them run the audio axis energy-only]) and ``keyed``
(clip_id, text_key, audio_key).  Every function takes a (new, old) pair
of frames so the same code serves the bootstrap (old = empty) and the
fold (old = the committed corpus) paths.

Scale contract shared by all of them: candidate pairs and the pending
sets are BATCH-scale and broadcast; the corpus-scale stores are only
ever scanned and semi-restricted map-side (broadcast endpoint sets),
never shuffled wholesale.  See each docstring for the per-operator
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from locality_sensitive_hashing_spark.config import Config


def energy_pairs(cfg: Config, new_en: DataFrame, old_en: DataFrame) -> DataFrame:
    """Frame-energy LSH incremental candidates over DISTINCT PAYLOADS
    (the intake store's one-row-per-audio_key energy table): tuple-band
    blocking (audio_lsh.explode_energy_bands) restricted to blocks the
    pending set touches -- the audio analog of the MinHash/SimHash block
    pairing, same bucket-cap-at-emission semantics."""
    from locality_sensitive_hashing_spark.operators.audio_lsh import (
        explode_energy_bands,
    )
    from locality_sensitive_hashing_spark.operators.candidates import (
        incremental_pairs_from_blocks,
    )

    en = incremental_pairs_from_blocks(
        explode_energy_bands(new_en, cfg, id_col="audio_key"),
        explode_energy_bands(old_en, cfg, id_col="audio_key"),
        ["band_id", "bkey"], cfg.bucket_cap, "en", id_col="audio_key",
    )
    return en.select("id1", "id2")


def gain_pairs(cfg: Config, new_fp: DataFrame, old_fp: DataFrame) -> DataFrame:
    """Gain-axis incremental candidates over DISTINCT PAYLOADS: the
    Haitsma-Kalker sign-fingerprint pigeonhole window blocks
    (audio_fingerprint.fingerprint_blocks, eligibility floor included)
    restricted to blocks the pending set touches -- pairs +6 dB / -6 dB
    re-masters and dithered re-encodes the energy detector misses by
    construction.  Inputs are intake-store energy frames carrying the
    combined kernel's ``codes``/``n_active`` columns
    (audio_lsh.with_store_audio_features)."""
    from locality_sensitive_hashing_spark.operators.audio_fingerprint import (
        fingerprint_blocks,
    )
    from locality_sensitive_hashing_spark.operators.candidates import (
        incremental_pairs_from_blocks,
    )

    gp = incremental_pairs_from_blocks(
        fingerprint_blocks(new_fp, id_col="audio_key"),
        fingerprint_blocks(old_fp, id_col="audio_key"),
        ["win_idx", "wkey"], cfg.bucket_cap, "gfp", id_col="audio_key",
    )
    return gp.select("id1", "id2")


def audio_text_edges(apairs: DataFrame, new_en: DataFrame, old_en: DataFrame,
                     keyed_all: DataFrame, keyed_pending: DataFrame,
                     cfg: Config, gpairs: DataFrame | None = None) -> DataFrame:
    """Audio-axis edges in TEXT-KEY space, three dup classes:

    (a) EXACT -- an audio_key shared by clips with different transcripts:
        star edges from the key's min text_key to its other text_keys
        (byte equality via the sha2 content key -- stronger than any
        decode verify).  Emitted for every audio_key the pending set
        touches, resolved over the FULL keyed store, so a payload
        republished under a new transcript merges with every transcript
        it ever appeared under, whichever batch they landed in.
    (b) NEAR-DUP -- energy-LSH candidate pairs verified by EXACT Jaccard
        over the stored shingle sets (>= audio_lsh.JACCARD_THRESHOLD,
        JVM array_intersect/array_union -- no Python), endpoints mapped
        through the same min-text_key representative; the star edges
        make the representative choice immaterial to the components.
    (c) GAIN -- when ``gpairs`` is given (intake store carries the
        combined kernel's ``codes`` column), sign-fingerprint candidates
        verified by exact bit-error-rate over the stored code sequences
        (equal length, BER <= audio_fingerprint.BER_MAX -- JVM
        zip_with/bit_count, no Python), same representative mapping.

    Scale shape: candidate pairs and the pending/endpoint audio_key sets
    are batch-scale and BROADCAST; the corpus-scale energy and keyed
    stores are semi-restricted map-side before any shuffle (the
    :func:`screened_edges` discipline).  ``apairs`` (and ``gpairs``)
    must be materialized by the caller (they feed the endpoint broadcast
    and the verify joins)."""
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.operators import audio_lsh as AL
    from locality_sensitive_hashing_spark.operators import (
        audio_fingerprint as AFP,
    )

    def _eps(p):
        return (
            p.select(F.col("id1").alias("audio_key"))
            .unionByName(p.select(F.col("id2").alias("audio_key")))
            .distinct()
        )

    eps = _eps(apairs)
    if gpairs is not None:
        eps = eps.unionByName(_eps(gpairs)).distinct()
    en_all = (
        old_en.select("audio_key", "shingles")
        .unionByName(new_en.select("audio_key", "shingles"))
        .join(F.broadcast(eps), "audio_key")
    )
    s1 = en_all.select(
        F.col("audio_key").alias("id1"), F.col("shingles").alias("_h1"))
    s2 = en_all.select(
        F.col("audio_key").alias("id2"), F.col("shingles").alias("_h2"))
    jac = (
        F.size(F.array_intersect("_h1", "_h2")).cast("double")
        / F.size(F.array_union("_h1", "_h2"))
    )
    vpairs = (
        apairs.join(s1, "id1").join(s2, "id2")
        .where(jac >= AL.JACCARD_THRESHOLD)
        .select("id1", "id2")
    )
    if gpairs is not None:
        cd_all = (
            old_en.select("audio_key", "codes")
            .unionByName(new_en.select("audio_key", "codes"))
            .join(F.broadcast(eps), "audio_key")
        )
        c1 = cd_all.select(
            F.col("audio_key").alias("id1"), F.col("codes").alias("_c1"))
        c2 = cd_all.select(
            F.col("audio_key").alias("id2"), F.col("codes").alias("_c2"))
        ber = F.expr(
            "aggregate(zip_with(_c1, _c2, (a, b) -> bit_count(a ^ b)), 0, "
            "(acc, x) -> acc + x)"
        ).cast("double") / (F.lit(AFP.CODE_BITS) * F.size("_c1"))
        gv = (
            gpairs.join(c1, "id1").join(c2, "id2")
            .where(F.size("_c1") == F.size("_c2"))
            .where(F.round(ber, 6) <= AFP.BER_MAX)
            .select("id1", "id2")
        )
        vpairs = vpairs.unionByName(gv).distinct()
    touched = (
        keyed_pending.select("audio_key").unionByName(eps).distinct()
    )
    a2t = (
        keyed_all.select("audio_key", "text_key")
        .join(F.broadcast(touched), "audio_key")
        .distinct()
    )
    rep = a2t.groupBy("audio_key").agg(F.min("text_key").alias("rep"))
    stars = (
        a2t.join(rep, "audio_key")
        .where(F.col("text_key") != F.col("rep"))
        .select(F.col("rep").alias("id1"), F.col("text_key").alias("id2"))
    )
    r1 = rep.select(F.col("audio_key").alias("id1"), F.col("rep").alias("_t1"))
    r2 = rep.select(F.col("audio_key").alias("id2"), F.col("rep").alias("_t2"))
    near = (
        vpairs.join(r1, "id1").join(r2, "id2")
        .where(F.col("_t1") != F.col("_t2"))
        .select(F.col("_t1").alias("id1"), F.col("_t2").alias("id2"))
    )
    return stars.unionByName(near).distinct()


def sa_pairs(cfg: Config, new_anchors: DataFrame,
             old_anchors: DataFrame) -> DataFrame:
    """Substring-axis incremental candidates: winnowing-anchor blocks
    (suffix_array.with_anchors materialized in the intake store, one
    text_key per distinct text) restricted to anchors the pending set
    touches -- the incremental counterpart of sa_anchor_pairs.  Anchor
    candidacy is only safe together with its exact-LCS verify, which
    :func:`screened_edges` with ``lcs=True`` supplies (the same lazy
    shared-substring term the batch pipeline's text_ok carries,
    verify.py:105-149)."""
    from locality_sensitive_hashing_spark.operators.candidates import (
        incremental_pairs_from_blocks,
    )

    sa = incremental_pairs_from_blocks(
        new_anchors, old_anchors, ["anchor"], cfg.bucket_cap, "sa",
        id_col="text_key",
    )
    return sa.select("id1", "id2")


def batch_pairs(cfg: Config, new_sigs: DataFrame, old_sigs: DataFrame,
                new_fps: DataFrame, old_fps: DataFrame) -> DataFrame:
    """Two-detector incremental candidates: MinHash band buckets +
    SimHash pigeonhole chunks, both restricted to blocking groups the
    batch touches (the SA detector joins via :func:`sa_pairs` when the
    intake store materializes the anchor table -- its candidacy is only
    safe together with the LCS verify ``screened_edges(lcs=True)``
    adds)."""
    from pyspark.sql import functions as F  # noqa: F401  (parity w/ callers)

    from locality_sensitive_hashing_spark.operators.candidates import (
        incremental_pairs_from_blocks,
    )
    from locality_sensitive_hashing_spark.operators.minhash import explode_bands
    from locality_sensitive_hashing_spark.operators.simhash import explode_chunks

    mh = incremental_pairs_from_blocks(
        explode_bands(new_sigs, id_col="text_key"),
        explode_bands(old_sigs, id_col="text_key"),
        ["band_id", "band_hash"], cfg.bucket_cap, "mh", id_col="text_key",
    )
    sh = incremental_pairs_from_blocks(
        explode_chunks(new_fps, cfg, id_col="text_key"),
        explode_chunks(old_fps, cfg, id_col="text_key"),
        ["chunk_id", "chunk_val"], cfg.bucket_cap, "sh", id_col="text_key",
    )
    return (
        mh.select("id1", "id2")
        .unionByName(sh.select("id1", "id2"))
        .distinct()
    )


def screened_edges(pairs: DataFrame, new_sigs: DataFrame, old_sigs: DataFrame,
                   new_fps: DataFrame, old_fps: DataFrame, est, cfg: Config,
                   lcs: bool = False) -> DataFrame:
    """The text verdict screen over the candidate pairs: est-Jaccard >=
    threshold OR Hamming(fingerprints) <= t, plus -- when ``lcs=True``
    (intake store carries the anchor table) -- the lazy exact-LCS term,
    making this the batch pipeline's FULL text_ok (verify.py:142-146).
    One Arrow screen + one JVM bit_count per pair; the suffix-array
    build runs ONLY for pairs failing both cheap tests -- enforced
    INSIDE the kernel (lcs_refuted_udf), because verify.py's
    filter-below-Project discipline only survives when the cheap
    metrics come from a materialized stage; in a single query Catalyst
    re-fuses the UDFs (see the lcs branch below).

    ``pairs`` is batch-scale while the signature/fingerprint stores are
    corpus-scale, so joining them directly would shuffle the corpus.
    Instead the pair-endpoint id set (batch-scale) is BROADCAST and the
    corpus tables are semi-restricted map-side first -- the corpus is
    scanned, never shuffled (the same shape cluster_delta uses for its
    label lookup). ``pairs`` must be materialized by the caller
    (localCheckpoint) since it feeds both the endpoint broadcast and
    the final join.
    """
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.operators.simhash import (
        hamming_distance,
    )

    eps = (
        pairs.select(F.col("id1").alias("text_key"))
        .unionByName(pairs.select(F.col("id2").alias("text_key")))
        .distinct()
    )
    # text_keys are disjoint across batches (the intake store's anti-join
    # contract), so a plain union is one-row-per-key already; the
    # broadcast endpoint semi-join cuts it to batch-scale before any
    # shuffle-side use
    sig_cols = ["text_key", "sig"] + (["norm"] if lcs else [])
    all_sigs = (
        old_sigs.select(*sig_cols)
        .unionByName(new_sigs.select(*sig_cols))
        .join(F.broadcast(eps), "text_key")
    )
    all_fps = (
        old_fps.select("text_key", "fingerprint")
        .unionByName(new_fps.select("text_key", "fingerprint"))
        .join(F.broadcast(eps), "text_key")
    )
    s1c = [F.col("text_key").alias("id1"), F.col("sig").alias("_s1")] + (
        [F.col("norm").alias("_n1")] if lcs else [])
    s2c = [F.col("text_key").alias("id2"), F.col("sig").alias("_s2")] + (
        [F.col("norm").alias("_n2")] if lcs else [])
    s1 = all_sigs.select(*s1c)
    s2 = all_sigs.select(*s2c)
    f1 = all_fps.select(
        F.col("text_key").alias("id1"), F.col("fingerprint").alias("_f1"))
    f2 = all_fps.select(
        F.col("text_key").alias("id2"), F.col("fingerprint").alias("_f2"))
    joined = pairs.join(s1, "id1").join(s2, "id2").join(f1, "id1").join(
        f2, "id2")
    cheap_ok = (
        (est(F.col("_s1"), F.col("_s2")) >= cfg.jaccard_threshold)
        | (hamming_distance(F.col("_f1"), F.col("_f2")) <= cfg.hamming_t)
    )
    passed = joined.where(cheap_ok).select("id1", "id2")
    if not lcs:
        return passed
    # lazy LCS: suffix-array build only where the verdict depends on it.
    # Plan-level separation (refutation filter below an lcs Project) is
    # NOT stable -- Catalyst pushes a column filter back through the
    # projection and ExtractPythonUDFs then fuses the est and lcs UDFs
    # into ONE eager ArrowEvalPython -- so the est-refutation check is
    # fused INTO the kernel (lcs_refuted_udf: same bit-exact (B, H) est
    # compare, SA build only for est-refuted rows, -1 otherwise), while
    # the Hamming refutation stays a JVM bit_count predicate Catalyst
    # may push freely. Emission stays disjoint from `passed`: this
    # branch requires ham > t AND est < threshold.
    from locality_sensitive_hashing_spark.operators.suffix_array import (
        lcs_refuted_udf,
    )

    lcs_fn = lcs_refuted_udf(cfg.sa_min_len, cfg.jaccard_threshold)
    lcs_pass = (
        joined.where(
            hamming_distance(F.col("_f1"), F.col("_f2")) > cfg.hamming_t)
        .select(
            "id1", "id2",
            lcs_fn(F.col("_s1"), F.col("_s2"),
                   F.col("_n1"), F.col("_n2")).alias("_lcs"),
        )
        .where(F.col("_lcs") >= cfg.sa_min_len)
        .select("id1", "id2")
    )
    return passed.unionByName(lcs_pass)


def survivor_edges_builder(cfg: Config, est, sigs: DataFrame,
                           fps: DataFrame, keyed: DataFrame | None = None,
                           energy: DataFrame | None = None,
                           anchors: DataFrame | None = None):
    """Build the ``edges_fn`` a retraction needs
    (:meth:`ClusterStore.retract`): given a survivor text_key set,
    recompute ALL verified edges among it from the committed stores --
    the same three text detectors + full text_ok screen and the same
    audio star/near edge classes the maintenance loop folds forward,
    restricted to the survivors.

    Inputs are the (already tombstone-filtered) corpus-wide store
    frames; the audio/substring axes run iff their frames are given --
    the same presence contract as the job.  Scale shape: the survivor
    set is affected-clusters-sized and BROADCAST; every store is
    scanned once, semi-restricted map-side, never shuffled wholesale.
    In-set candidacy reuses the incremental blocking operators with an
    empty old side (the bootstrap shape), so cap semantics match the
    forward path.
    """
    from pyspark.sql import functions as F

    def edges_fn(survivors: DataFrame) -> DataFrame:
        st = survivors.select(
            F.col("clip_id").alias("text_key")
        ).localCheckpoint()
        sigs_s = sigs.join(F.broadcast(st), "text_key").localCheckpoint()
        fps_s = fps.join(F.broadcast(st), "text_key").localCheckpoint()
        pairs = batch_pairs(cfg, sigs_s, sigs_s.limit(0),
                            fps_s, fps_s.limit(0))
        has_sa = anchors is not None
        if has_sa:
            anch_s = anchors.join(F.broadcast(st), "text_key")
            pairs = pairs.unionByName(
                sa_pairs(cfg, anch_s, anch_s.limit(0))
            ).distinct()
        pairs = pairs.localCheckpoint()
        edges = screened_edges(pairs, sigs_s, sigs_s.limit(0),
                               fps_s, fps_s.limit(0), est, cfg, lcs=has_sa)
        if energy is not None and keyed is not None:
            keyed_s = keyed.join(
                F.broadcast(st), "text_key"
            ).localCheckpoint()
            akeys = keyed_s.select("audio_key").distinct()
            en_s = energy.join(
                F.broadcast(akeys), "audio_key"
            ).localCheckpoint()
            apairs = energy_pairs(cfg, en_s, en_s.limit(0)).localCheckpoint()
            # gain axis iff the store was written by the combined kernel
            # (codes column present) -- same presence contract as the job
            gp = (
                gain_pairs(cfg, en_s, en_s.limit(0)).localCheckpoint()
                if "codes" in en_s.columns else None
            )
            edges = edges.unionByName(
                audio_text_edges(apairs, en_s, en_s.limit(0),
                                 keyed_s, keyed_s, cfg, gpairs=gp)
            ).distinct()
        return edges

    return edges_fn
