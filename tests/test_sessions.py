"""Session analytics: gap-based sessionization + as-of attribution.

Hand-computed fixtures pin the boundary semantics (gap strictly greater
than the threshold starts a new session; attribution is strictly
earlier, ties broken by event_id); a plan test pins the single-shuffle
claim both operators are built on.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark.operators.sessions import (
    SESSION_GAP_US,
    as_of_attach,
    session_rollup,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (event_id, user_id, offset_seconds, event_type, value)."""
    pdf = pd.DataFrame(
        [
            {
                "event_id": e,
                "user_id": u,
                "ts": T0 + dt.timedelta(seconds=s),
                "event_type": t,
                "value": v,
            }
            for e, u, s, t, v in rows
        ]
    )
    return spark.createDataFrame(pdf)


def test_sessionize_gap_boundary(spark):
    """Gap == threshold stays in the session; one microsecond over
    starts a new one."""
    gap_s = SESSION_GAP_US / 1_000_000
    ev = _events(
        spark,
        [
            (0, 1, 0, "view", 1.0),
            (1, 1, gap_s, "view", 1.0),          # exactly 30 min -> same
            (2, 1, 2 * gap_s + 0.000001, "view", 1.0),  # 1 us over -> new
            (3, 2, 5, "click", 1.0),              # other user independent
        ],
    )
    got = (
        sessionize(ev)
        .select("event_id", "session_id")
        .toPandas()
        .set_index("event_id")["session_id"]
        .to_dict()
    )
    assert got == {0: 1, 1: 1, 2: 2, 3: 1}


def test_session_rollup_hand_computed(spark):
    ev = _events(
        spark,
        [
            (0, 7, 0, "view", 1.25),
            (1, 7, 60, "click", 2.50),
            (2, 7, 7200, "view", 4.00),   # 2h gap -> session 2
            (3, 7, 7230, "view", 0.25),
        ],
    )
    got = (
        session_rollup(ev)
        .toPandas()
        .sort_values("session_id")
        .reset_index(drop=True)
    )
    assert list(got.n_events) == [2, 2]
    assert list(got.n_types) == [2, 1]
    assert list(got.duration_us) == [60_000_000, 30_000_000]
    assert list(got.sum_value) == [3.75, 4.25]


def test_as_of_attach_strictly_earlier_and_ties(spark):
    """A view at the SAME timestamp as the click attributes only when
    its event_id orders it earlier (the pinned tiebreak); later views
    never attribute."""
    ev = _events(
        spark,
        [
            (10, 1, 100, "view", 0.0),
            (11, 1, 200, "view", 0.0),
            (12, 1, 300, "click", 0.0),   # -> view 11 (most recent prior)
            (13, 1, 300, "view", 0.0),    # same ts as click, LATER id
            (20, 2, 50, "click", 0.0),
            (19, 2, 50, "view", 0.0),     # same ts, EARLIER id -> attributes
        ],
    )
    got = as_of_attach(
        ev,
        anchor_filter=F.col("event_type") == "click",
        ref_filter=F.col("event_type") == "view",
        attach_cols=["event_id"],
    ).toPandas().set_index("event_id")["ref_event_id"].to_dict()
    assert got[12] == 11
    assert got[20] == 19


def test_sessionize_partition_invariance(spark):
    rows = [
        (i, i % 5, (i * 777) % 90000, ("view", "click")[i % 2], float(i))
        for i in range(200)
    ]
    ev = _events(spark, rows)
    a = (
        session_rollup(ev)
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    b = (
        session_rollup(ev.repartition(13))
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_session_plan_single_exchange(spark, tmp_path):
    """The whole sessionize -> rollup chain costs ONE shuffle of the
    events: exactly one Exchange in the physical plan (the rollup's
    partial agg rides the window's user clustering; AQE reads are not
    Exchanges), and no Python/Arrow nodes anywhere."""
    rows = [(i, i % 3, i * 10, "view", 1.0) for i in range(30)]
    p = str(tmp_path / "ev.parquet")
    _events(spark, rows).write.parquet(p)
    df = session_rollup(spark.read.parquet(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = sum(
        1 for ln in plan.splitlines() if "Exchange " in ln and "reuse" not in ln
    )
    assert n_exchange == 1, plan
    assert "ArrowEval" not in plan and "BatchEvalPython" not in plan, plan
