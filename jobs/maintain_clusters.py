#!/usr/bin/env python
"""spark-submit entry point for INCREMENTAL cluster maintenance.

    spark-submit --master <cluster> --py-files lshdedup.zip \
        jobs/maintain_clusters.py --store /data/intake --workdir /data/clusters

The complete 10^12-row maintenance loop as one resumable job, built from
the incremental operators:

- the INTAKE STORE (streaming/incremental.py: `incremental_signatures`
  writes per-batch committed signature subdirs) is the source of truth
  for what has landed;
- ALL not-yet-processed committed batches are processed as ONE combined
  pending set per run: they contribute candidate pairs ONLY from
  blocking groups the set touches (`incremental_pairs_from_blocks` over
  the detectors the intake store materializes: MinHash band buckets
  from the signature store, SimHash pigeonhole chunks from the
  fingerprint store, winnowing-anchor blocks from the anchor store,
  and frame-energy tuple bands from the per-payload energy store),
  verified by the batch pipeline's FULL text_ok for the text axis
  (est-Jaccard OR Hamming OR lazy exact-LCS -- the suffix-array build
  runs only for pairs failing both cheap tests, exactly verify.py's
  discipline) and exact shingle-Jaccard for the audio axis.  Stores
  written before the anchor table existed run without the substring
  term (candidacy without the LCS verify would create false edges, so
  the two ship together).  The AUDIO axis adds two
  text-key edge classes (`_audio_text_edges`): byte-identical payloads
  shared across transcripts (star edges over the keyed store -- the
  incremental counterpart of the batch pipeline's audio content
  classes) and energy-LSH near-dup payloads (head-trimmed / noisy
  re-masters under different transcripts, which no text detector can
  pair).  Stores written before the energy table existed run text-only.
  Combining is free: the state manifest commits once per run either
  way (so per-batch looping adds no resumability), and CC edge folding
  is order-independent, while a per-batch loop would scan the prior
  corpus and compose the cluster mapping once PER PENDING BATCH --
  with T batches queued that is T corpus-sized reads where one
  suffices. Bucket caps are accordingly evaluated once per run over
  (prior corpus + the whole pending set), the same append-only
  cap-at-emission semantics with the run, not the micro-batch, as the
  emission unit;
- verified edges fold into the standing assignment MERGE-ON-READ
  (`ClusterStore.apply_batch`: contracted-graph CC -> composed broadcast
  mapping + batch-scale delta; the corpus-sized base is NOT rewritten);
- the base is rewritten only when the composed mapping outgrows
  `--fold-budget` rows (`ClusterStore.maybe_fold`) or on `--fold`.

State layout under --workdir (all parquet + one JSON manifest, committed
atomically manifest-last, so a crash mid-write resumes from the previous
consistent state and reprocesses at most the in-flight batches --
processing a batch twice is harmless: its pairs produce an identity
delta against an assignment that already contains them). The corpus-
sized base is versioned SEPARATELY from the batch-scale pending state,
so a maintenance run that does not fold never rewrites it -- the
merge-on-read contract holds ACROSS runs, not just within one:

    base/v<B>/        the standing (clip_id, cluster_id) assignment,
                      rewritten only at bootstrap or fold
    mapping/v<P>/     pending composed label remap (absent when folded)
    delta/v<P>/       pending new-clip assignments (absent when folded)
    state.json        {"processed": [...], "base_v": B,
                       "pend_v": P | null, "next_v": N}

Exit code 0 iff the state manifest committed. The current assignment is
always `read_current(spark, workdir)` -- base relabeled through the
broadcast mapping plus delta, the merge-on-read view.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _read_state(workdir: str) -> dict:
    p = os.path.join(workdir, "state.json")
    if not os.path.exists(p):
        return {"processed": [], "base_v": 0, "pend_v": None, "next_v": 1}
    with open(p) as f:
        return json.load(f)


def _write_state(workdir: str, state: dict) -> None:
    p = os.path.join(workdir, "state.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.rename(tmp, p)  # the commit point


def _load_store(spark, workdir: str, state: dict):
    """Reconstruct the ClusterStore from committed state WITHOUT folding:
    base, mapping, and delta load as separate parquet-backed frames."""
    from locality_sensitive_hashing_spark.operators.connected_components import (
        ClusterStore,
    )

    store = ClusterStore(
        spark.read.parquet(
            os.path.join(workdir, "base", f"v{state['base_v']}")
        )
    )
    if state["pend_v"] is not None:
        p = state["pend_v"]
        store.mapping = spark.read.parquet(
            os.path.join(workdir, "mapping", f"v{p}"))
        store.delta = spark.read.parquet(
            os.path.join(workdir, "delta", f"v{p}"))
    return store


def read_current(spark, workdir: str):
    """The merge-on-read view of the committed maintenance state."""
    state = _read_state(workdir)
    return _load_store(spark, workdir, state).current()


def main() -> int:
    ap = argparse.ArgumentParser(description="incremental cluster maintenance")
    ap.add_argument("--store", required=True,
                    help="intake store dir (incremental_signatures output)")
    ap.add_argument("--workdir", required=True,
                    help="cluster-state dir (base/mapping/delta + state.json)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--fold-budget", type=int, default=1_000_000,
                    help="fold the base when the composed mapping exceeds "
                         "this many rows (the broadcast budget)")
    ap.add_argument("--fold", action="store_true",
                    help="force a fold at the end of this run")
    ap.add_argument("--config-json", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.config import Config
    from locality_sensitive_hashing_spark.operators.connected_components import (
        ClusterStore,
        connected_components,
    )
    from locality_sensitive_hashing_spark.operators.minhash import (
        estimated_jaccard_udf,
    )
    from locality_sensitive_hashing_spark.session import get_spark
    from locality_sensitive_hashing_spark.streaming.incremental import (
        batch_paths,
        committed_batch_ids,
    )

    cfg = Config(**json.loads(args.config_json)) if args.config_json else Config()
    spark = get_spark(args.master or "local[*]",
                      app_name="lsh-maintain-clusters",
                      shuffle_partitions=cfg.shuffle_partitions)

    state = _read_state(args.workdir)
    done = set(state["processed"])
    todo = sorted(committed_batch_ids(args.store) - done)
    needs_fold = args.fold and state["pend_v"] is not None
    if not todo and not needs_fold:
        print(json.dumps({"status": "up-to-date", **state}))
        return 0

    # reconstruct the in-memory store from the committed state -- base,
    # mapping, delta as-is (reconstruction must NOT fold: the whole point
    # is that only fold() ever rewrites the corpus-sized base)
    base_new = False
    if not done:
        store = None  # bootstrapped from the first batch below
    else:
        store = _load_store(spark, args.workdir, state)

    est = estimated_jaccard_udf()
    if todo:
        # ONE combined pass over the whole pending set: reading each
        # pending batch separately would rescan the prior corpus and
        # re-compose the cluster mapping per batch for no resumability
        # gain (the manifest commits once per run regardless), and CC
        # edges fold order-independently, so the combined result equals
        # the sequential one (pinned by test).
        sigs = spark.read.parquet(*batch_paths(args.store, "signatures", todo))
        fps = spark.read.parquet(*batch_paths(args.store, "fingerprints", todo))
        new_nodes = sigs.select(F.col("text_key").alias("clip_id"))
        prior_sig = batch_paths(args.store, "signatures", sorted(done))
        prior_fp = batch_paths(args.store, "fingerprints", sorted(done))
        # audio axis is present iff the intake store materialized the
        # energy table (stores written before it existed stay readable:
        # the job simply runs text-only against them); same presence
        # contract for the substring axis' anchor table
        has_audio = os.path.isdir(os.path.join(args.store, "energy"))
        has_sa = os.path.isdir(os.path.join(args.store, "anchors"))
        if has_audio:
            en = spark.read.parquet(*batch_paths(args.store, "energy", todo))
            keyed_new = spark.read.parquet(
                *batch_paths(args.store, "keyed", todo))
        if has_sa:
            anch = spark.read.parquet(
                *batch_paths(args.store, "anchors", todo))
        if store is None:
            # bootstrap: no standing assignment -- the pending set
            # clusters from scratch (its own in-set pairs via the same
            # blocking + screen) and becomes base v1
            pairs = _batch_pairs(cfg, sigs, sigs.limit(0), fps, fps.limit(0))
            if has_sa:
                pairs = pairs.unionByName(
                    _sa_pairs(cfg, anch, anch.limit(0))).distinct()
            pairs = pairs.localCheckpoint()  # endpoint broadcast + final join
            edges = _screened_edges(
                pairs, sigs, sigs, fps, fps, est, cfg, lcs=has_sa)
            if has_audio:
                apairs = _energy_pairs(cfg, en, en.limit(0)).localCheckpoint()
                edges = edges.unionByName(_audio_text_edges(
                    apairs, en, en.limit(0), keyed_new, keyed_new, cfg
                )).distinct()
            base = connected_components(edges, new_nodes, cfg)
            store = ClusterStore(base.localCheckpoint())
            base_new = True
        else:
            old_sigs = spark.read.parquet(*prior_sig)
            old_fps = spark.read.parquet(*prior_fp)
            pairs = _batch_pairs(cfg, sigs, old_sigs, fps, old_fps)
            if has_sa:
                old_anch = spark.read.parquet(
                    *batch_paths(args.store, "anchors", sorted(done)))
                pairs = pairs.unionByName(
                    _sa_pairs(cfg, anch, old_anch)).distinct()
            pairs = pairs.localCheckpoint()  # endpoint broadcast + final join
            edges = _screened_edges(
                pairs, sigs, old_sigs, fps, old_fps, est, cfg, lcs=has_sa
            )
            if has_audio:
                old_en = spark.read.parquet(
                    *batch_paths(args.store, "energy", sorted(done)))
                keyed_all = spark.read.parquet(*batch_paths(
                    args.store, "keyed", sorted(done | set(todo))))
                apairs = _energy_pairs(cfg, en, old_en).localCheckpoint()
                edges = edges.unionByName(_audio_text_edges(
                    apairs, en, old_en, keyed_all, keyed_new, cfg
                )).distinct()
            store.apply_batch(edges, new_nodes, cfg)
        done.update(todo)

    folded = store.maybe_fold(args.fold_budget)
    if args.fold and not folded and (store.mapping is not None
                                     or store.delta is not None):
        store.fold()
        folded = True
    base_new = base_new or folded

    # commit: data dirs first, manifest (state.json) last
    v = state["next_v"]
    base_v = state["base_v"]
    if base_new:  # bootstrap or fold -- the ONLY corpus-sized writes
        store.base.write.mode("overwrite").parquet(
            os.path.join(args.workdir, "base", f"v{v}"))
        base_v = v
    pend_v = None
    if store.mapping is not None or store.delta is not None:
        store.mapping.write.mode("overwrite").parquet(
            os.path.join(args.workdir, "mapping", f"v{v}"))
        store.delta.write.mode("overwrite").parquet(
            os.path.join(args.workdir, "delta", f"v{v}"))
        pend_v = v
    new_state = {"processed": sorted(done), "base_v": base_v,
                 "pend_v": pend_v, "next_v": v + 1}
    _write_state(args.workdir, new_state)
    n = read_current(spark, args.workdir).count()
    print(json.dumps({"status": "ok", "n_assigned": n, **new_state}))
    return 0


def _energy_pairs(cfg, new_en, old_en):
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


def _audio_text_edges(apairs, new_en, old_en, keyed_all, keyed_pending, cfg):
    """Audio-axis edges in TEXT-KEY space, two dup classes:

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

    Scale shape: candidate pairs and the pending/endpoint audio_key sets
    are batch-scale and BROADCAST; the corpus-scale energy and keyed
    stores are semi-restricted map-side before any shuffle (the
    _screened_edges discipline).  ``apairs`` must be materialized by the
    caller (it feeds the endpoint broadcast and the verify join)."""
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.operators import audio_lsh as AL

    eps = (
        apairs.select(F.col("id1").alias("audio_key"))
        .unionByName(apairs.select(F.col("id2").alias("audio_key")))
        .distinct()
    )
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


def _sa_pairs(cfg, new_anchors, old_anchors):
    """Substring-axis incremental candidates: winnowing-anchor blocks
    (suffix_array.with_anchors materialized in the intake store, one
    text_key per distinct text) restricted to anchors the pending set
    touches -- the incremental counterpart of sa_anchor_pairs.  Anchor
    candidacy is only safe together with its exact-LCS verify, which
    `_screened_edges(lcs=True)` supplies (the same lazy shared-substring
    term the batch pipeline's text_ok carries, verify.py:105-149)."""
    from locality_sensitive_hashing_spark.operators.candidates import (
        incremental_pairs_from_blocks,
    )

    sa = incremental_pairs_from_blocks(
        new_anchors, old_anchors, ["anchor"], cfg.bucket_cap, "sa",
        id_col="text_key",
    )
    return sa.select("id1", "id2")


def _batch_pairs(cfg, new_sigs, old_sigs, new_fps, old_fps):
    """Two-detector incremental candidates: MinHash band buckets +
    SimHash pigeonhole chunks, both restricted to blocking groups the
    batch touches (the SA detector joins via :func:`_sa_pairs` when the
    intake store materializes the anchor table -- its candidacy is only
    safe together with the LCS verify `_screened_edges(lcs=True)` adds)."""
    from pyspark.sql import functions as F

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


def _screened_edges(pairs, new_sigs, old_sigs, new_fps, old_fps, est, cfg,
                    lcs=False):
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


if __name__ == "__main__":
    sys.exit(main())
