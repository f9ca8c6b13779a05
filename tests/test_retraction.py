"""Retraction (equality deletes) across the incremental stack.

Store level: retraction batches commit marker-last and are idempotent;
dead keys are DERIVED (zero surviving clips), so re-ingesting a dead
key's content revives it with no stored state to invalidate.

Cluster level: ClusterStore.retract is pinned in test_incremental.py;
here the full maintenance loop (jobs/maintain_clusters.py) is pinned
against from-scratch clustering over the surviving corpus -- including a
genuine cluster SPLIT when a bridge transcript is retracted, and a
MERGE when a retracted key's content is re-ingested (revival).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from locality_sensitive_hashing_spark.fixtures import make_clips
from locality_sensitive_hashing_spark.streaming.incremental import (
    BatchIngestor,
    commit_retraction,
    committed_retraction_ids,
    dead_keys,
    read_retractions,
    read_store,
)


def _retract(spark, out_dir, clip_ids, rid=None):
    df = spark.createDataFrame([(c,) for c in clip_ids], "clip_id string")
    return commit_retraction(out_dir, df, rid)


def test_commit_retraction_protocol(spark, cfg):
    out_dir = tempfile.mkdtemp(prefix="lsh_retr_")
    try:
        assert committed_retraction_ids(out_dir) == set()
        assert read_retractions(spark, out_dir).count() == 0
        r0 = _retract(spark, out_dir, ["clip00000001"])
        r1 = _retract(spark, out_dir, ["clip00000002", "clip00000003"])
        assert (r0, r1) == (0, 1)
        assert committed_retraction_ids(out_dir) == {0, 1}
        # replay of a committed id: no-op, data unchanged
        _retract(spark, out_dir, ["clipDIFFERENT"], rid=1)
        got = {r.clip_id for r in read_retractions(spark, out_dir).collect()}
        assert got == {"clip00000001", "clip00000002", "clip00000003"}
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_dead_keys_derived_and_revived(spark, cfg):
    """A key dies only when its LAST clip is retracted, and a later
    batch landing the same content (fresh clip_id) revives it."""
    out_dir = tempfile.mkdtemp(prefix="lsh_dead_")
    try:
        clips, _ = make_clips(24, seed=21)
        ing = BatchIngestor(spark, out_dir, cfg)
        ing.process(spark.createDataFrame(clips), 0)
        keyed = read_store(spark, out_dir, "keyed").toPandas()
        # pick a text_key carried by >= 2 clips (make_clips plants
        # exact-dup pairs) and one carried by exactly 1
        by_key = keyed.groupby("text_key")["clip_id"].apply(list)
        shared = by_key[by_key.str.len() >= 2].iloc[0]
        solo_key = by_key[by_key.str.len() == 1].index[0]
        solo_clip = by_key[solo_key][0]
        shared_key = keyed.set_index("clip_id").loc[shared[0], "text_key"]

        # retract ONE holder of the shared key: key survives
        _retract(spark, out_dir, [shared[0]])
        dt = {r.text_key for r in dead_keys(spark, out_dir, "text_key").collect()}
        assert shared_key not in dt

        # retract the rest + the solo clip: both keys now dead
        _retract(spark, out_dir, shared[1:] + [solo_clip])
        dt = {r.text_key for r in dead_keys(spark, out_dir, "text_key").collect()}
        assert {shared_key, solo_key} <= dt

        # audio keys die the same way
        da = {r.audio_key for r in dead_keys(spark, out_dir, "audio_key").collect()}
        retracted_clips = set(shared) | {solo_clip}
        surviving_akeys = set(
            keyed[~keyed.clip_id.isin(retracted_clips)].audio_key
        )
        assert da.isdisjoint(surviving_akeys)

        # REVIVAL: a new batch re-lands the solo clip's content under a
        # fresh clip_id -> the key has a surviving row again
        row = clips[clips.clip_id == solo_clip].copy()
        row["clip_id"] = "clipREPUBLISH"
        ing.process(spark.createDataFrame(row), 1)
        dt = {r.text_key for r in dead_keys(spark, out_dir, "text_key").collect()}
        assert solo_key not in dt
        assert shared_key in dt  # the other stays dead
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Full maintenance loop with retractions: jobs/maintain_clusters.py


import dataclasses
import json
import sys

import numpy as np
import pandas as pd

import jobs.maintain_clusters as MJ
from locality_sensitive_hashing_spark import audio as A
from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG

JCFG = json.dumps({"bucket_cap": 1 << 20})
JC = dataclasses.replace(DEFAULT_CONFIG, bucket_cap=1 << 20)


def _run_job(store, workdir, *extra):
    argv = ["maintain_clusters", "--store", store, "--workdir", workdir,
            "--config-json", JCFG, *extra]
    old = sys.argv
    sys.argv = argv
    try:
        assert MJ.main() == 0
    finally:
        sys.argv = old


def _assign(df) -> dict:
    return {r.clip_id: r.cluster_id for r in df.collect()}


def _toks(rng, n):
    return [
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), size=6))
        for _ in range(n)
    ]


def _row(rng, cid, transcript, raw=None):
    sr = 8000
    if raw is None:
        raw = A.encode_wav(A.synth_pcm(rng, sr, 400), sr, "pcm_s16le")
    return {"clip_id": cid, "bytes": raw, "sr_hz": sr, "dur_ms": 400,
            "codec": "pcm_s16le", "transcript": " ".join(transcript)}


def _retraction_corpus(rng):
    """Two engineered split scenarios on top of background noise:

    - bridge: TB = TA ++ TC chains two unrelated transcripts into one
      cluster; retracting TB's only clip must split it into {TA}, {TC};
    - severed star: unrelated T1, T2 merged ONLY by a shared payload
      (clip_s1/clip_s3 carry identical bytes); retracting those two
      clips kills the audio_key while BOTH texts survive (via s2/s4),
      so the cluster must split with no dead text node at all.
    """
    ta, tc, t1, t2 = (_toks(rng, 40) for _ in range(4))
    shared = A.encode_wav(A.synth_pcm(rng, 8000, 500), 8000, "pcm_s16le")
    rows = [
        _row(rng, "clip_a", ta),
        _row(rng, "clip_b", ta + tc),
        _row(rng, "clip_c", tc),
        _row(rng, "clip_s1", t1, raw=shared),
        _row(rng, "clip_s2", t1),
        _row(rng, "clip_s3", t2, raw=shared),
        _row(rng, "clip_s4", t2),
    ]
    for i in range(20):  # background noise, each its own cluster
        rows.append(_row(rng, f"clip_n{i:02d}", _toks(rng, 30)))
    return pd.DataFrame(rows), {"ta": ta, "tc": tc, "t1": t1, "t2": t2}


def _tkey(spark, store, clip_id):
    keyed = read_store(spark, store, "keyed").toPandas()
    return keyed.set_index("clip_id").text_key.to_dict()[clip_id]


def test_job_retraction_splits_and_matches_from_scratch(spark, cfg):
    root = tempfile.mkdtemp(prefix="lsh_retrjob_")
    try:
        rng = np.random.default_rng(33)
        clips, _ = _retraction_corpus(rng)
        store = os.path.join(root, "intake")
        wd = os.path.join(root, "clusters")
        BatchIngestor(spark, store, JC).process(
            spark.createDataFrame(clips), 0)
        _run_job(store, wd)

        k = {c: _tkey(spark, store, c) for c in
             ("clip_a", "clip_b", "clip_c", "clip_s1", "clip_s2",
              "clip_s3", "clip_s4")}
        before = _assign(MJ.read_current(spark, wd))
        assert before[k["clip_a"]] == before[k["clip_b"]] == before[k["clip_c"]]
        assert before[k["clip_s1"]] == before[k["clip_s3"]]  # star merge

        # retract the bridge clip + both holders of the shared payload
        _retract(spark, store, ["clip_b", "clip_s1", "clip_s3"])
        _run_job(store, wd)
        after = _assign(MJ.read_current(spark, wd))
        assert k["clip_b"] not in after                      # dead node gone
        assert after[k["clip_a"]] != after[k["clip_c"]]      # bridge split
        assert after[k["clip_s2"]] != after[k["clip_s4"]]    # star split
        assert k["clip_s2"] in after and k["clip_s4"] in after

        # from-scratch over the SURVIVING clips only: assignments equal
        # (text_keys and min-key cluster ids are content-determined, so
        # the maps compare directly across stores)
        surv = clips[~clips.clip_id.isin(["clip_b", "clip_s1", "clip_s3"])]
        store2 = os.path.join(root, "intake_surv")
        wd2 = os.path.join(root, "clusters_surv")
        BatchIngestor(spark, store2, JC).process(
            spark.createDataFrame(surv), 0)
        _run_job(store2, wd2)
        assert after == _assign(MJ.read_current(spark, wd2))

        # replaying the job with nothing new pending is a no-op
        _run_job(store, wd)
        assert _assign(MJ.read_current(spark, wd)) == after
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_job_revival_reingest_restores_dead_key(spark, cfg):
    """A dead key's content re-published under a fresh clip_id revives
    the node: the ingest anti-join skips recomputing its features (they
    are still committed), and the maintenance run moves those rows to
    the new side, re-pairing it against the corpus -- the cluster that
    split on retraction merges back."""
    root = tempfile.mkdtemp(prefix="lsh_revive_")
    try:
        rng = np.random.default_rng(44)
        clips, _ = _retraction_corpus(rng)
        store = os.path.join(root, "intake")
        wd = os.path.join(root, "clusters")
        ing = BatchIngestor(spark, store, JC)
        ing.process(spark.createDataFrame(clips), 0)
        _run_job(store, wd)
        k_b = _tkey(spark, store, "clip_b")
        k_a = _tkey(spark, store, "clip_a")
        k_c = _tkey(spark, store, "clip_c")

        _retract(spark, store, ["clip_b"])
        _run_job(store, wd)
        mid = _assign(MJ.read_current(spark, wd))
        assert k_b not in mid and mid[k_a] != mid[k_c]

        # republish the bridge transcript (fresh clip_id, fresh audio)
        rep = clips[clips.clip_id == "clip_b"].copy()
        rep["clip_id"] = "clip_b_repub"
        raw = A.encode_wav(A.synth_pcm(rng, 8000, 450), 8000, "pcm_s16le")
        rep["bytes"] = [raw]
        ing.process(spark.createDataFrame(rep), 1)
        # no new signature row was committed for the revived key -- the
        # features from batch 0 are the ones the revival must reuse
        sigs1 = read_store(spark, store, "signatures").toPandas()
        assert (sigs1.text_key == k_b).sum() == 1
        _run_job(store, wd)
        end = _assign(MJ.read_current(spark, wd))
        assert end[k_b] == end[k_a] == end[k_c]  # merged back

        # from-scratch on an equivalent store (survivors + republished)
        surv = pd.concat([clips[clips.clip_id != "clip_b"], rep])
        store2 = os.path.join(root, "intake2")
        wd2 = os.path.join(root, "clusters2")
        BatchIngestor(spark, store2, JC).process(
            spark.createDataFrame(surv), 0)
        _run_job(store2, wd2)
        assert end == _assign(MJ.read_current(spark, wd2))
    finally:
        shutil.rmtree(root, ignore_errors=True)
