"""Eval module (O27-O28): pair metrics, cluster agreement, top-k report."""

from __future__ import annotations

from locality_sensitive_hashing_spark.plans.eval import (
    cluster_agreement,
    cluster_size_histogram,
    pair_metrics,
    topk_pairs_report,
)


def test_pair_metrics_counts(spark):
    found = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("x", "y")], "id1 string, id2 string"
    )
    expected = spark.createDataFrame(
        [("b", "a"), ("c", "d"), ("p", "q")], "id1 string, id2 string"
    )
    m = pair_metrics(found, expected)
    assert m["n_hit"] == 2  # (a,b) matches despite reversed order
    assert m["n_missed"] == 1 and m["n_spurious"] == 1
    assert abs(m["recall"] - 2 / 3) < 1e-12
    assert abs(m["precision"] - 2 / 3) < 1e-12


def test_pipeline_recall_via_eval(pipeline_run, corpus, spark):
    io, _, clusters = pipeline_run
    _, _, oracle = corpus
    found = io.read("verified").where("is_dup").select("id1", "id2")
    expected = spark.createDataFrame(
        oracle.verified[oracle.verified.is_dup][["id1", "id2"]]
    )
    m = pair_metrics(found, expected)
    assert m["recall"] >= 0.99 and m["precision"] >= 0.99

    agree = cluster_agreement(clusters, spark.createDataFrame(oracle.clusters))
    assert agree["agreement"] == 1.0


def test_topk_and_histogram(pipeline_run):
    io, _, clusters = pipeline_run
    top = topk_pairs_report(io.read("verified"), k=5).toPandas()
    assert len(top) <= 5
    assert (top.est_jaccard.values == sorted(top.est_jaccard.values)[::-1]).all()
    hist = cluster_size_histogram(clusters).toPandas()
    assert hist.n_clusters.sum() == clusters.select("cluster_id").distinct().count()
    assert (hist.cluster_size * hist.n_clusters).sum() == clusters.count()
