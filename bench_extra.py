#!/usr/bin/env python
"""Round-6 optimization profiler: per-stage noop-sink isolation (guide
section 1.4) + sub-plan A/B timings for the flagship pipeline's hot
stages.  NOT the driver bench -- bench.py stays frozen; this file exists
so OPTIMIZATION_r06.md can cite stage-level evidence.

Usage:
    python bench_extra.py prepare   # run pipeline once, commit stages
    python bench_extra.py stats     # row counts of the hot intermediates
    python bench_extra.py text     # text_metrics / text_verified timings
    python bench_extra.py cand     # candidates subtree timings
    python bench_extra.py plans    # dump explain('formatted') per stage

Stage tables are committed once to $BENCH_EXTRA_DIR (default
/dev/shm/lsh_r06_profile) and reused across invocations, so each timing
isolates exactly one stage's computation from its committed inputs --
the same boundary the pipeline's resume contract defines.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
import pyarrow as pa  # noqa: F401  (arrow_udf type-hint resolution)

PROFILE_DIR = os.environ.get("BENCH_EXTRA_DIR", "/dev/shm/lsh_r06_profile")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def get_session():
    from locality_sensitive_hashing_spark.session import get_spark

    return get_spark(f"local[{CPUS}]", app_name="lsh-r06-profile",
                     shuffle_partitions=max(CPUS, 8))


def load_corpus(spark):
    cache_root = os.environ.get("BENCH_CACHE", "/tmp/lsh_bench_cache")
    tag = f"{os.path.basename(SF_DIR.rstrip('/'))}_x20"
    path = os.path.join(cache_root, f"clips_{tag}.parquet")
    if not os.path.exists(path):
        from locality_sensitive_hashing_spark.fixtures import bench_clips_df

        os.makedirs(cache_root, exist_ok=True)
        bench_clips_df(spark, SF_DIR, replicate=20).write.mode(
            "overwrite").parquet(path)
    return spark.read.parquet(path)


def read_candidates(io):
    """Committed candidates table decoded to the detectors-array form
    (round 6: the stage stores the raw bitmask; same decode as the
    pipeline's read-back).  Falls through for pre-mask workdirs."""
    from locality_sensitive_hashing_spark.operators.candidates import (
        decode_detector_mask,
    )

    df = io.read("candidates")
    if "detectors_mask" in df.columns:
        df = decode_detector_mask(df, ["minhash", "simhash", "sa"])
    return df


def make_io(spark):
    from locality_sensitive_hashing_spark.sources.tables import TableIO

    return TableIO(spark, PROFILE_DIR)


def cmd_prepare():
    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
    from locality_sensitive_hashing_spark.plans.pipeline import DedupPipeline

    spark = get_session()
    clips = load_corpus(spark)
    io = make_io(spark)
    t0 = time.time()
    pipe = DedupPipeline(spark, CFG, io, run_id="r06profile")
    clusters = pipe.run(clips)
    n = clusters.select("cluster_id").distinct().count()
    print(json.dumps({"wall": round(time.time() - t0, 2), "n_clusters": n,
                      "skipped": pipe.skipped_stages,
                      "aux": pipe.aux_walls}))


def cmd_stats():
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as cfg

    spark = get_session()
    io = make_io(spark)
    sigs = io.read("signatures")
    cands = read_candidates(io)
    out = {
        "signatures": sigs.count(),
        "candidates": cands.count(),
        "tv": io.read("text_verified").count(),
    }
    tv = io.read("text_verified")
    out["needs_lcs(computed lcs != -1 sentinel rows)"] = tv.where(
        "lcs != -1").count()
    out["text_ok"] = tv.where("text_ok").count()
    det = cands.select(F.explode("detectors").alias("d")).groupBy("d").count()
    out["by_detector"] = {r["d"]: r["count"] for r in det.collect()}
    from locality_sensitive_hashing_spark.operators.minhash import explode_bands
    from locality_sensitive_hashing_spark.operators.suffix_array import (
        with_anchors,
    )

    out["band_rows"] = explode_bands(sigs, id_col="text_key").count()
    out["anchor_rows"] = with_anchors(
        sigs.select("text_key", "norm"), cfg, "norm", "text_key").count()
    print(json.dumps(out, indent=1))


def cmd_text():
    """text_metrics + text_verified isolation from committed inputs."""
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as cfg
    from locality_sensitive_hashing_spark.operators.verify import (
        text_pair_metrics,
        verify_text_pairs,
    )

    spark = get_session()
    sc = spark.sparkContext
    io = make_io(spark)
    sigs, fps, cands = (io.read("signatures"), io.read("fingerprints"),
                        read_candidates(io))
    res = {}

    sc.setJobDescription("r06: candidates read only")
    res["cands_scan"] = noop(cands)

    sc.setJobDescription("r06: metrics joins only (no UDF)")
    feats = sigs.select("text_key", "sig").join(
        fps.select("text_key", "fingerprint"), "text_key")
    f1 = feats.select(F.col("text_key").alias("id1"),
                      F.col("sig").alias("sig1"),
                      F.col("fingerprint").alias("f1"))
    f2 = feats.select(F.col("text_key").alias("id2"),
                      F.col("sig").alias("sig2"),
                      F.col("fingerprint").alias("f2"))
    joins_only = cands.join(f1, "id1").join(f2, "id2")
    res["metrics_joins_only"] = noop(joins_only)

    sc.setJobDescription("r06: full text_pair_metrics (joins + est UDF)")
    tm = text_pair_metrics(cands, sigs, fps)
    res["text_pair_metrics"] = noop(tm)

    sc.setJobDescription("r06: verify_text_pairs on persisted metrics")
    tm2 = text_pair_metrics(cands, sigs, fps).persist()
    t0 = time.time()
    tm2.count()
    res["metrics_persist_count"] = time.time() - t0
    tv = verify_text_pairs(tm2, sigs, cfg)
    res["verify_text_pairs(from cache)"] = noop(tv)

    # -- variant A: union instead of left-join-back (persisted metrics) --
    needs_lcs = (
        F.array_contains("detectors", "sa")
        & (F.col("est_jaccard") < F.lit(cfg.jaccard_threshold))
        & (F.col("hamming") > F.lit(cfg.hamming_t))
    )
    from locality_sensitive_hashing_spark.operators.suffix_array import lcs_udf

    n1 = sigs.select(F.col("text_key").alias("tk1"),
                     F.col("norm").alias("norm1"))
    n2 = sigs.select(F.col("text_key").alias("tk2"),
                     F.col("norm").alias("norm2"))
    lcs = lcs_udf(cfg.sa_min_len)
    lcs_rows = (
        tm2.where(needs_lcs)
        .join(n1, "tk1").join(n2, "tk2")
        .select("tk1", "tk2", "detectors", "est_jaccard", "hamming",
                lcs(F.col("norm1"), F.col("norm2")).alias("lcs"))
    )
    cheap_rows = tm2.where(~needs_lcs).select(
        "tk1", "tk2", "detectors", "est_jaccard", "hamming",
        F.lit(-1).cast("long").alias("lcs"))
    text_ok = (
        (F.col("est_jaccard") >= F.lit(cfg.jaccard_threshold))
        | (F.col("hamming") <= F.lit(cfg.hamming_t))
        | (F.col("lcs") >= F.lit(cfg.sa_min_len))
    )
    union_tv = cheap_rows.unionByName(lcs_rows).withColumn("text_ok", text_ok)
    sc.setJobDescription("r06: variant A union-not-join (from cache)")
    res["variantA_union(from cache)"] = noop(union_tv)
    tm2.unpersist()

    # -- variant B: fully fused one-pass (no persist, no metrics stage).
    # The SA/hamming gate rides INTO the kernel as a boolean column --
    # a when(cond, udf) would be hoisted into an eager ArrowEvalPython
    # and SA-build every est-refuted pair (the documented Catalyst
    # hazard, suffix_array.lcs_refuted_udf docstring).
    sc.setJobDescription("r06: variant B fused one-pass")
    from locality_sensitive_hashing_spark import hashing as HH
    from locality_sensitive_hashing_spark.operators.simhash import (
        hamming_distance,
    )

    min_len, thr = cfg.sa_min_len, cfg.jaccard_threshold

    @F.pandas_udf("est double, lcs long")
    def est_lcs(sig1: pd.Series, sig2: pd.Series, t1: pd.Series,
                t2: pd.Series, flag: pd.Series) -> pd.DataFrame:
        import numpy as np

        n = len(sig1)
        if n == 0:
            return pd.DataFrame({"est": pd.Series([], dtype="float64"),
                                 "lcs": pd.Series([], dtype="int64")})
        a1, a2 = sig1.to_numpy(), sig2.to_numpy()
        lens = np.fromiter((v.size for v in a1), dtype=np.int64, count=n)
        est = np.empty(n, dtype=np.float64)
        for h in np.unique(lens):
            idx = np.nonzero(lens == h)[0]
            s1 = np.vstack([a1[i] for i in idx])
            s2 = np.vstack([a2[i] for i in idx])
            est[idx] = (s1 == s2).mean(axis=1)
        out = np.full(n, -1, dtype=np.int64)
        fl = flag.to_numpy()
        for i in np.nonzero(fl & (est < thr))[0]:
            out[i] = HH.lcs_at_least(t1.iloc[i] or "", t2.iloc[i] or "",
                                     min_len)
        return pd.DataFrame({"est": est, "lcs": out})

    featsn = sigs.select("text_key", "norm", "sig").join(
        fps.select("text_key", "fingerprint"), "text_key")
    g1 = featsn.select(F.col("text_key").alias("id1"),
                       F.col("sig").alias("sig1"),
                       F.col("norm").alias("norm1"),
                       F.col("fingerprint").alias("fp1"))
    g2 = featsn.select(F.col("text_key").alias("id2"),
                       F.col("sig").alias("sig2"),
                       F.col("norm").alias("norm2"),
                       F.col("fingerprint").alias("fp2"))
    fused = (
        cands.join(g1, "id1").join(g2, "id2")
        .withColumn("hamming",
                    hamming_distance(F.col("fp1"), F.col("fp2")).cast("int"))
        .withColumn(
            "_saflag",
            F.array_contains("detectors", "sa")
            & (F.col("hamming") > F.lit(cfg.hamming_t)),
        )
        .withColumn("_el", est_lcs(F.col("sig1"), F.col("sig2"),
                                   F.col("norm1"), F.col("norm2"),
                                   F.col("_saflag")))
        .select(F.col("id1").alias("tk1"), F.col("id2").alias("tk2"),
                "detectors", F.col("_el.est").alias("est_jaccard"),
                "hamming", F.col("_el.lcs").alias("lcs"))
        .withColumn("text_ok", text_ok)
    )
    res["variantB_fused_onepass"] = noop(fused)

    # -- variant C: fused one-pass + broadcast feats (no pair shuffle) ---
    sc.setJobDescription("r06: variant C fused + broadcast feats")
    fusedC = (
        cands.join(F.broadcast(g1), "id1").join(F.broadcast(g2), "id2")
        .withColumn("hamming",
                    hamming_distance(F.col("fp1"), F.col("fp2")).cast("int"))
        .withColumn(
            "_saflag",
            F.array_contains("detectors", "sa")
            & (F.col("hamming") > F.lit(cfg.hamming_t)),
        )
        .withColumn("_el", est_lcs(F.col("sig1"), F.col("sig2"),
                                   F.col("norm1"), F.col("norm2"),
                                   F.col("_saflag")))
        .select(F.col("id1").alias("tk1"), F.col("id2").alias("tk2"),
                "detectors", F.col("_el.est").alias("est_jaccard"),
                "hamming", F.col("_el.lcs").alias("lcs"))
        .withColumn("text_ok", text_ok)
    )
    res["variantC_fused_bcast"] = noop(fusedC)

    # -- variant D: broadcast feats + mapInArrow kernel (no pandas) ------
    sc.setJobDescription("r06: variant D mapInArrow + broadcast feats")
    import pyarrow as pa

    from locality_sensitive_hashing_spark import hashing as HH2

    def arrow_fn(it):
        import numpy as np

        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            s1 = batch.column("sig1")
            s2 = batch.column("sig2")
            if isinstance(s1, pa.ChunkedArray):
                s1 = s1.combine_chunks()
                s2 = s2.combine_chunks()
            o1 = s1.offsets.to_numpy()
            widths = np.diff(o1)
            h = widths[0] if n else 0
            flat1 = s1.flatten().to_numpy(zero_copy_only=False)
            flat2 = s2.flatten().to_numpy(zero_copy_only=False)
            if (widths == h).all():
                m1 = flat1.reshape(n, h)
                m2 = flat2.reshape(n, h)
                est = (m1 == m2).mean(axis=1)
            else:  # ad-hoc mixed-length inputs
                est = np.empty(n, dtype=np.float64)
                o2 = s2.offsets.to_numpy()
                for i in range(n):
                    a = flat1[o1[i]:o1[i + 1]]
                    b = flat2[o2[i]:o2[i + 1]]
                    est[i] = (a == b).mean()
            flag = batch.column("_saflag").to_numpy(zero_copy_only=False)
            lcs = np.full(n, -1, dtype=np.int64)
            refuted = np.nonzero(flag & (est < thr))[0]
            if refuted.size:
                t1v = batch.column("norm1").take(
                    pa.array(refuted)).to_pylist()
                t2v = batch.column("norm2").take(
                    pa.array(refuted)).to_pylist()
                for j, i in enumerate(refuted):
                    lcs[i] = HH2.lcs_at_least(
                        t1v[j] or "", t2v[j] or "", min_len)
            yield pa.RecordBatch.from_arrays(
                [batch.column("id1"), batch.column("id2"),
                 batch.column("detectors"), pa.array(est),
                 batch.column("hamming"), pa.array(lcs)],
                names=["tk1", "tk2", "detectors", "est_jaccard", "hamming",
                       "lcs"],
            )

    pre = (
        cands.join(F.broadcast(g1), "id1").join(F.broadcast(g2), "id2")
        .withColumn("hamming",
                    hamming_distance(F.col("fp1"), F.col("fp2")).cast("int"))
        .withColumn(
            "_saflag",
            F.array_contains("detectors", "sa")
            & (F.col("hamming") > F.lit(cfg.hamming_t)),
        )
        .select("id1", "id2", "detectors", "hamming", "_saflag",
                "sig1", "sig2", "norm1", "norm2")
    )
    fusedD = pre.mapInArrow(
        arrow_fn,
        "tk1 string, tk2 string, detectors array<string>, "
        "est_jaccard double, hamming int, lcs long",
    ).withColumn("text_ok", text_ok)
    res["variantD_arrow_bcast"] = noop(fusedD)

    # -- variant E: broadcast feats + native arrow_udf (zero pandas, only
    # UDF inputs cross the boundary) --------------------------------------
    sc.setJobDescription("r06: variant E arrow_udf + broadcast feats")

    @F.arrow_udf("est double, lcs long")
    def est_lcs_arrow(sig1: pa.Array, sig2: pa.Array, t1: pa.Array,
                      t2: pa.Array, flag: pa.Array) -> pa.Array:
        import numpy as np

        n = len(sig1)
        if n == 0:
            return pa.StructArray.from_arrays(
                [pa.array([], type=pa.float64()),
                 pa.array([], type=pa.int64())],
                names=["est", "lcs"])
        o1 = sig1.offsets.to_numpy()
        o2 = sig2.offsets.to_numpy()
        w1 = np.diff(o1)
        flat1 = sig1.flatten().to_numpy(zero_copy_only=False)
        flat2 = sig2.flatten().to_numpy(zero_copy_only=False)
        h = w1[0]
        if (w1 == h).all() and (np.diff(o2) == h).all():
            est = (flat1.reshape(n, h) == flat2.reshape(n, h)).mean(axis=1)
        else:  # ad-hoc mixed-length inputs
            est = np.empty(n, dtype=np.float64)
            b1 = o1 - o1[0]
            b2 = o2 - o2[0]
            for i in range(n):
                est[i] = (flat1[b1[i]:b1[i + 1]]
                          == flat2[b2[i]:b2[i + 1]]).mean()
        lcs = np.full(n, -1, dtype=np.int64)
        fl = flag.to_numpy(zero_copy_only=False)
        refuted = np.nonzero(fl & (est < thr))[0]
        if refuted.size:
            t1v = t1.take(pa.array(refuted)).to_pylist()
            t2v = t2.take(pa.array(refuted)).to_pylist()
            for j, i in enumerate(refuted):
                lcs[i] = HH.lcs_at_least(t1v[j] or "", t2v[j] or "", min_len)
        return pa.StructArray.from_arrays(
            [pa.array(est), pa.array(lcs)], names=["est", "lcs"])

    fusedE = (
        cands.join(F.broadcast(g1), "id1").join(F.broadcast(g2), "id2")
        .withColumn("hamming",
                    hamming_distance(F.col("fp1"), F.col("fp2")).cast("int"))
        .withColumn(
            "_saflag",
            F.array_contains("detectors", "sa")
            & (F.col("hamming") > F.lit(cfg.hamming_t)),
        )
        .withColumn("_el", est_lcs_arrow(F.col("sig1"), F.col("sig2"),
                                         F.col("norm1"), F.col("norm2"),
                                         F.col("_saflag")))
        .select(F.col("id1").alias("tk1"), F.col("id2").alias("tk2"),
                "detectors", F.col("_el.est").alias("est_jaccard"),
                "hamming", F.col("_el.lcs").alias("lcs"))
        .withColumn("text_ok", text_ok)
    )
    res["variantE_arrowudf_bcast"] = noop(fusedE)

    sc.setJobDescription(None)
    print(json.dumps({k: round(v, 2) for k, v in res.items()}, indent=1))


def cmd_cand():
    """candidates subtree isolation from the committed signature tables."""
    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as cfg
    from locality_sensitive_hashing_spark.operators.candidates import (
        pairs_from_blocks,
        union_candidates,
    )
    from locality_sensitive_hashing_spark.operators.minhash import explode_bands
    from locality_sensitive_hashing_spark.operators.simhash import (
        simhash_candidates,
    )
    from locality_sensitive_hashing_spark.operators.suffix_array import (
        sa_anchor_pairs,
        with_anchors,
    )

    spark = get_session()
    sc = spark.sparkContext
    io = make_io(spark)
    sigs, fps = io.read("signatures"), io.read("fingerprints")
    res = {}

    sc.setJobDescription("r06: anchors UDF single pass")
    res["anchors_udf_1pass"] = noop(
        with_anchors(sigs.select("text_key", "norm"), cfg, "norm", "text_key"))

    sc.setJobDescription("r06: cand_minhash only")
    res["cand_minhash"] = noop(pairs_from_blocks(
        explode_bands(sigs, id_col="text_key"), ["band_id", "band_hash"],
        cfg.bucket_cap, "minhash", id_col="text_key", dedup=False))

    sc.setJobDescription("r06: cand_simhash only")
    res["cand_simhash"] = noop(
        simhash_candidates(fps, cfg, id_col="text_key", dedup=False))

    sc.setJobDescription("r06: cand_sa only")
    res["cand_sa"] = noop(
        sa_anchor_pairs(sigs, cfg, id_col="text_key", dedup=False))

    sc.setJobDescription("r06: full candidates union")
    full = union_candidates(
        pairs_from_blocks(
            explode_bands(sigs, id_col="text_key"), ["band_id", "band_hash"],
            cfg.bucket_cap, "minhash", id_col="text_key", dedup=False),
        simhash_candidates(fps, cfg, id_col="text_key", dedup=False),
        sa_anchor_pairs(sigs, cfg, id_col="text_key", dedup=False),
    )
    res["candidates_union_full"] = noop(full)

    sc.setJobDescription(None)
    print(json.dumps({k: round(v, 2) for k, v in res.items()}, indent=1))


def cmd_plans():
    """Dump explain('formatted') for the kernel-touched stages to
    $PLAN_OUT (default plans/r06) with suffix $PLAN_SUFFIX (after).

    Inputs come from the committed profile tables (run `prepare` first),
    so each dump is the stage's own plan from its real upstream schema.
    Run from a round-start worktree with PLAN_SUFFIX=before for the
    before-side of each pair.
    """
    import contextlib
    import io as _io

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as cfg
    from locality_sensitive_hashing_spark.operators.connected_components import (
        connected_components,
    )
    from locality_sensitive_hashing_spark.operators.minhash import (
        with_signatures,
    )
    from locality_sensitive_hashing_spark.operators.simhash import (
        with_fingerprint,
    )
    from locality_sensitive_hashing_spark.operators.textgroup import (
        audio_classes,
        distinct_texts,
    )

    out_dir = os.environ.get("PLAN_OUT", "plans/r06")
    suffix = os.environ.get("PLAN_SUFFIX", "after")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session()
    clips = load_corpus(spark)
    io = make_io(spark)
    keyed = io.read("keyed")
    texts = distinct_texts(keyed)

    def plan(df) -> str:
        jvm = df.sparkSession._jvm
        return str(jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))

    frames = {
        "signatures": lambda: with_signatures(
            texts, cfg, text_col="norm", id_col="text_key",
            pre_normalized=True),
        "fingerprints": lambda: with_fingerprint(
            texts, text_col="norm", id_col="text_key"),
        "audio_classes": lambda: audio_classes(keyed, clips, cfg),
        # building CC runs its (observe-gated) iterations; the returned
        # frame's plan is the final label assembly
        "clusters": lambda: connected_components(
            io.read("verified").where("is_dup").select("id1", "id2"),
            clips.select("clip_id"), cfg),
    }
    only = os.environ.get("PLAN_ONLY")
    for name, build in frames.items():
        if only and name not in only.split(","):
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):  # silence observe prints
            text = plan(build())
        with open(path, "w") as f:
            f.write(text)
        print(f"{path}: {len(text.splitlines())} lines")
    spark.stop()


def _neighbor_window():
    import bench_util

    s = bench_util.NeighborSampler()
    s.start()
    return s


def cmd_ab():
    """Interleaved min-of-N A/B of the text_verified build variants:
    current two-stage path vs fused one-pass (B), fused+broadcast (C),
    fused+broadcast+arrow_udf (E).  Interleaving rounds makes neighbor
    bursts hit every variant equally in expectation; min-of-N discards
    burst-inflated samples."""
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as cfg
    from locality_sensitive_hashing_spark.operators.verify import (
        text_pair_metrics,
        verify_text_pairs,
    )

    spark = get_session()
    sc = spark.sparkContext
    io = make_io(spark)
    sigs, fps, cands = (io.read("signatures"), io.read("fingerprints"),
                        read_candidates(io))

    def run_current():
        tm = text_pair_metrics(cands, sigs, fps).persist()
        tm.count()
        w = noop(verify_text_pairs(tm, sigs, cfg))
        tm.unpersist()
        return w  # caller adds the persist wall separately

    def current_total():
        tm = text_pair_metrics(cands, sigs, fps).persist()
        t0 = time.time()
        tm.count()
        tv = verify_text_pairs(tm, sigs, cfg)
        tv.write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        tm.unpersist()
        return w

    import bench_extra_variants as V

    sig_dir = os.path.join(PROFILE_DIR, "signatures")
    fp_dir = os.path.join(PROFILE_DIR, "fingerprints")
    variants = {
        "current(persist+verify)": current_total,
        "E_fused_bcast_arrow": lambda: noop(V.fused_text_verified(
            cands, sigs, fps, cfg, broadcast=True, arrow=True)),
        "H_fused_bcast_arrow_gatednorm": lambda: noop(
            V.fused_text_verified_gated(cands, sigs, fps, cfg)),
        "J_lookup_kernel": lambda: noop(V.fused_text_verified_lookup(
            cands, sig_dir, fp_dir, cfg)),
    }
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    walls = {k: [] for k in variants}
    sampler = _neighbor_window()
    for r in range(rounds):
        for k, fn in variants.items():
            sc.setJobDescription(f"r06ab[{r}]: {k}")
            walls[k].append(round(fn(), 2))
    win = sampler.stop()
    sc.setJobDescription(None)
    print(json.dumps({
        "min": {k: min(v) for k, v in walls.items()},
        "all": walls,
        "neighbor_cores": win["neighbor_cores_avg"],
    }, indent=1))


def cmd_abcand():
    """Interleaved min-of-N A/B of the candidates union variants."""
    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as cfg
    from locality_sensitive_hashing_spark.operators.candidates import (
        pairs_from_blocks,
        union_candidates,
    )
    from locality_sensitive_hashing_spark.operators.minhash import explode_bands
    from locality_sensitive_hashing_spark.operators.simhash import (
        simhash_candidates,
    )
    from locality_sensitive_hashing_spark.operators.suffix_array import (
        sa_anchor_pairs,
    )

    import bench_extra_variants as V

    spark = get_session()
    sc = spark.sparkContext
    io = make_io(spark)
    sigs, fps = io.read("signatures"), io.read("fingerprints")

    def subtrees():
        return [
            pairs_from_blocks(
                explode_bands(sigs, id_col="text_key"),
                ["band_id", "band_hash"], cfg.bucket_cap, "minhash",
                id_col="text_key", dedup=False),
            simhash_candidates(fps, cfg, id_col="text_key", dedup=False),
            sa_anchor_pairs(sigs, cfg, id_col="text_key", dedup=False),
        ]

    variants = {
        "current_collect_set": lambda: noop(union_candidates(*subtrees())),
        "bitmask_bit_or": lambda: noop(V.union_candidates_bitmask(
            subtrees(), ["minhash", "simhash", "sa"])),
    }
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    walls = {k: [] for k in variants}
    sampler = _neighbor_window()
    for r in range(rounds):
        for k, fn in variants.items():
            sc.setJobDescription(f"r06abcand[{r}]: {k}")
            walls[k].append(round(fn(), 2))
    win = sampler.stop()
    sc.setJobDescription(None)
    print(json.dumps({
        "min": {k: min(v) for k, v in walls.items()},
        "all": walls,
        "neighbor_cores": win["neighbor_cores_avg"],
    }, indent=1))


def cmd_pipe():
    """One full pipeline run (bench.py's timed region) with optional
    extra session conf from $AB_CONF ('k=v;k=v') -- the A/B harness for
    execution-only session knobs."""
    import shutil
    import tempfile

    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
    from locality_sensitive_hashing_spark.plans.pipeline import DedupPipeline
    from locality_sensitive_hashing_spark.session import get_spark
    from locality_sensitive_hashing_spark.sources.tables import TableIO

    extra = {}
    for kv in os.environ.get("AB_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark(f"local[{CPUS}]", app_name="lsh-r06-pipe",
                      shuffle_partitions=max(CPUS, 8), extra_conf=extra)
    clips = load_corpus(spark)
    clips.count()
    runs = int(os.environ.get("AB_PIPE_RUNS", "1"))
    # small warmup (bench.py's "sample" mode)
    walls = []
    for i in range(-1, runs):
        workdir = tempfile.mkdtemp(prefix="lsh_ab_pipe_", dir="/dev/shm")
        io = TableIO(spark, workdir)
        pipe = DedupPipeline(spark, CFG, io, run_id="abpipe")
        t0 = time.time()
        src = clips.limit(5000) if i < 0 else clips
        pipe.run(src).select("cluster_id").distinct().count()
        if i >= 0:
            walls.append(round(time.time() - t0, 2))
            m = io.read("metrics").where("partition_id = -1").toPandas()
            stages = {r.stage: round(float(r.wall_sec), 2)
                      for r in m.itertuples()}
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps({"walls": walls, "stages": stages, "conf": extra}))
    spark.stop()


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "prepare"
    {"prepare": cmd_prepare, "stats": cmd_stats, "text": cmd_text,
     "cand": cmd_cand, "ab": cmd_ab, "abcand": cmd_abcand,
     "pipe": cmd_pipe, "plans": cmd_plans}[cmd]()


if __name__ == "__main__":
    main()
