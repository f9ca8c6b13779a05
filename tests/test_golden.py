"""Committed golden fixtures stay reproducible (SURVEY.md section 5.2(3)).

If these fail, a kernel or fixture-generation change silently altered the
pinned semantics -- that's a deliberate decision (regenerate via
tests/make_golden.py and explain in the commit), never an accident.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN_DIR, "meta.json")),
    reason="golden fixtures not generated",
)


@pytest.fixture(scope="module")
def regenerated():
    from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as CFG
    from locality_sensitive_hashing_spark.fixtures import make_clips
    from locality_sensitive_hashing_spark.oracle import run_oracle

    with open(os.path.join(GOLDEN_DIR, "meta.json")) as f:
        meta = json.load(f)
    assert meta["config_id"] == CFG.config_id, (
        "Config changed without regenerating golden fixtures"
    )
    clips, planted = make_clips(meta["n_rows"], seed=meta["seed"])
    return run_oracle(clips, CFG), planted


def _golden(name: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"))


def test_signatures_stable(regenerated):
    res, _ = regenerated
    g = _golden("expected_signatures")
    r = res.signatures
    assert list(g.text_key) == list(r.text_key)
    for a, b in zip(g.sig, r.sig):
        assert list(a) == list(b)


def test_buckets_stable(regenerated):
    res, _ = regenerated
    g = _golden("expected_buckets")
    assert g.band_hash.tolist() == res.buckets.band_hash.tolist()


def test_simhash_stable(regenerated):
    res, _ = regenerated
    assert _golden("expected_simhash").fingerprint.tolist() == \
        res.simhash.fingerprint.tolist()


def test_candidates_stable(regenerated):
    res, _ = regenerated
    g = _golden("expected_candidates")
    assert list(map(tuple, g[["id1", "id2"]].values)) == \
        list(map(tuple, res.candidates[["id1", "id2"]].values))


def test_verified_and_clusters_stable(regenerated):
    res, _ = regenerated
    g = _golden("expected_verified")
    r = res.verified
    assert g.is_dup.tolist() == r.is_dup.tolist()
    assert g.id1.tolist() == r.id1.tolist()
    gc = _golden("expected_clusters")
    assert gc.cluster_id.tolist() == res.clusters.cluster_id.tolist()


def test_planted_pairs_stable(regenerated):
    _, planted = regenerated
    g = _golden("planted_pairs")
    assert g.equals(planted.reset_index(drop=True))
