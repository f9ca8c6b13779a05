"""Driver-contract harness replica: every queries() entry runs; every
oracle_sql() entry matches via DuckDB (row count + schema-width +
order-insensitive value hash), mirroring the driver's compare at sf0.01."""

from __future__ import annotations

import hashlib
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> str:
    """Order-insensitive value hash: sort columns by name, normalize cell
    text, sort rows, hash.

    FIRST reproduces the driver's pandas ``sort_values`` over raw cells --
    that call raises ``TypeError: unhashable type`` on array-typed columns,
    which is exactly how the round-1 ``minhash_signatures`` red row failed
    in the driver while the old stringify-first replica passed locally.
    Every queries() entry must therefore return scalar columns only.
    """
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort")  # driver replica

    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    rows = sorted(
        ",".join(cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


ORACLE = E.oracle_sql()
SQL_CHECKED = sorted(ORACLE)
ROWS_ONLY = sorted(set(E.queries()) - set(ORACLE))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query_matches_duckdb(spark, duck, name):
    q = E.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    assert len(got) > 0, f"{name}: degenerate empty result proves nothing"
    exp = duck.execute(ORACLE[name]).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns), f"{name}: columns differ"
    assert _canon(got) == _canon(exp), f"{name}: value hash mismatch"
    _check_aux_snapshot_fresh(name)


def _check_aux_snapshot_fresh(name: str) -> None:
    """The committed aux snapshot (seeded into /tmp at import so oracles
    work in any evaluation order) must match what the query just wrote --
    regenerate via jobs/make_aux_snapshot.py on deliberate kernel change."""
    from locality_sensitive_hashing_spark.entry_queries import (
        AUX_ROOT,
        AUX_TABLES_BY_QUERY,
    )

    for table in AUX_TABLES_BY_QUERY.get(name, []):
        snap_dir = os.path.join(os.path.dirname(__file__), "aux_snapshot",
                                "sf0.01", table)
        assert os.path.isdir(snap_dir), f"snapshot missing for {table}"
        live = pd.read_parquet(os.path.join(AUX_ROOT, "sf0.01", table))
        snap = pd.read_parquet(snap_dir)
        assert _canon(live) == _canon(snap), (
            f"aux snapshot stale for {table}: rerun jobs/make_aux_snapshot.py"
        )


# The driver's correctness harness checks exactly the first 50 names in
# queries() dict order (VERDICT r4). These 38 queries had no driver-side
# CORRECTNESS row in rounds 1-4 (35 round-4 additions + the round-5
# gain-invariant fingerprint trio), so round 5 pins them inside the
# window (tier 1 of the ordering contract in
# entry_queries.QUERIES_SQL_CHECKED).
_ROUND5_WINDOW_REQUIRED = {
    "audio_fingerprints", "audio_gain_near_dups", "audio_gain_eval_recall",
    "audio_temporal_stats", "audio_spectral_profile", "audio_resample_check",
    "audio_silence_runs", "shingle_hll", "audio_energy_profile",
    "audio_content_near_dups", "audio_content_clusters",
    "audio_eval_planted_recall", "incremental_audio_clusters",
    "incremental_substring_clusters", "incremental_maintenance_clusters",
    "detector_attribution", "decontamination", "semantic_dedup",
    "stratified_sample", "shard_layout", "token_budget_mix",
    "token_cms_estimate", "lang_shingle_similarity", "unigram_lm_score",
    "bpe_token_counts", "ngram_heavy_hitters", "boilerplate_coverage",
    "repetition_report", "doclen_quantiles", "doc_top_terms",
    "setsim_join_pairs", "bloom_membership", "transcript_rate_screen",
    "event_type_rollup", "purchase_view_window", "weighted_doc_sample",
    "daily_type_pivot", "zorder_layout",
    # tier-2 sentinels: the core pipeline must stay driver-certified
    "full_pipeline_clusters", "eval_planted_recall", "minhash_candidates",
    "simhash_candidates", "sa_substring_candidates", "audio_features",
    "incremental_relabel_view", "streaming_dedup_state",
}


def test_driver_window_ordering_contract():
    """The driver certifies list(queries())[:50]; every name above must
    occupy one of those 50 slots or its correctness evidence silently
    degrades to local-only (the r4 verdict's top finding)."""
    window = set(list(E.queries())[:50])
    missing = _ROUND5_WINDOW_REQUIRED - window
    assert missing == set(), f"pushed out of driver window: {sorted(missing)}"


def test_no_rows_only_queries_remain():
    """Since round 3 every queries() entry has an oracle_sql() replica
    (audio_features gained a full-decode DuckDB oracle) -- a regression
    that drops a query to rows-only shows up here, not as a silent
    weaker driver check."""
    assert ROWS_ONLY == []


def test_entry_smoke(spark):
    df = E.entry(spark)
    n = df.count()
    assert n > 0
    assert [f.name for f in df.schema.fields] == ["clip_id", "cluster_id"]
    # planted exact/near dups must cluster with their source doc
    pdf = df.toPandas()
    cl = dict(zip(pdf.clip_id, pdf.cluster_id))
    planted = [c for c in cl if c.endswith("x")]
    assert len(planted) > 0
    for cid in planted:
        assert cl[cid] == cl[cid[:-1]], f"{cid} not clustered with source"
