"""Session analytics: gap-based sessionization + as-of attribution.

Hand-computed fixtures pin the boundary semantics (gap strictly greater
than the threshold starts a new session; attribution is strictly
earlier, ties broken by event_id); a plan test pins the single-shuffle
claim both operators are built on.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
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


# --------------------------------------------------------------------------
# bounded interval join (windowed_count_join)
# --------------------------------------------------------------------------

def test_windowed_count_join_boundaries(spark):
    from locality_sensitive_hashing_spark.operators.sessions import (
        windowed_count_join,
    )

    W = 30 * 60  # seconds; window_us = W * 1e6
    rows = [
        # anchor purchase at t=10000
        (1, 1, 10000, "purchase", 0.0),
        (2, 1, 10000 - W, "view", 0.0),       # exactly window before: IN
        (3, 1, 10000 - W - 1, "view", 0.0),   # one past the window: OUT
        (4, 1, 9999, "view", 0.0),            # strictly earlier: IN
        (5, 1, 10000, "view", 0.0),           # simultaneous: OUT (strict)
        (6, 1, 10001, "view", 0.0),           # later: OUT
        (7, 2, 9999, "view", 0.0),            # other user: OUT
        (8, 2, 500, "purchase", 0.0),         # anchor with zero views
    ]
    got = windowed_count_join(
        _events(spark, rows),
        F.col("event_type") == "purchase",
        F.col("event_type") == "view",
        W * 1_000_000,
    ).toPandas().set_index("event_id")
    assert got.loc[1].n_in_window == 2  # events 2 and 4
    assert got.loc[8].n_in_window == 0
    assert len(got) == 2  # anchors only


def test_windowed_count_join_vs_brute_force(spark):
    from locality_sensitive_hashing_spark.operators.sessions import (
        windowed_count_join,
    )

    rng = np.random.default_rng(31)
    rows = [
        (i, int(rng.integers(0, 6)), int(rng.integers(0, 20000)),
         ("view", "purchase")[int(rng.integers(0, 2))], 0.0)
        for i in range(400)
    ]
    W_US = 1800 * 1_000_000
    ev = _events(spark, rows).repartition(7)
    got = windowed_count_join(
        ev, F.col("event_type") == "purchase",
        F.col("event_type") == "view", W_US,
    ).toPandas().set_index("event_id")["n_in_window"].to_dict()
    views = [(u, s * 1_000_000) for _, u, s, t, _ in rows if t == "view"]
    exp = {}
    for e, u, s, t, _ in rows:
        if t != "purchase":
            continue
        a_us = s * 1_000_000
        exp[e] = sum(
            1 for vu, v_us in views
            if vu == u and v_us < a_us and v_us >= a_us - W_US
        )
    assert got == exp and sum(exp.values()) > 0


def test_windowed_count_join_no_cartesian_plan(spark):
    """The binned formulation must plan as an equality join -- never a
    BroadcastNestedLoop/Cartesian over the inequality predicate."""
    from locality_sensitive_hashing_spark.operators.sessions import (
        windowed_count_join,
    )

    rows = [(i, i % 3, i * 100, ("view", "purchase")[i % 2], 0.0)
            for i in range(50)]
    df = windowed_count_join(
        _events(spark, rows),
        F.col("event_type") == "purchase",
        F.col("event_type") == "view",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
    assert "Python" not in plan
