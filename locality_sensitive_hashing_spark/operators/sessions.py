"""Event-stream session analytics: gap-based sessionization and as-of
(point-in-time) attribution as pure window expressions.

Both operators are single-shuffle by the entity key (``user_id``): every
window below shares one ``partitionBy(user) orderBy(ts, tiebreak)`` spec,
so Catalyst plans ONE Exchange + stacked Window nodes — no join, no UDF,
no second pass over the corpus.  That is the shape that survives 100 TB:
event logs partition naturally by user, per-user streams are small, and
the only skew hazard (a robot user with millions of events) degrades one
task, not the plan.

Timestamps are carried as epoch MICROSECONDS (bigint) end to end — the
testdata's parquet column is timestamp_ntz and the session timezone is
pinned UTC (session.py), so ``unix_micros(cast(ts as timestamp))`` here
and ``epoch_us(ts)`` in the DuckDB oracle agree bit-for-bit with no
rounding contract.

Provenance: gap-based sessionization and last-touch attribution are
standard event-analytics operators (REF? no reference file to cite —
mount empty, see SURVEY.md §0.1 — semantics follow the ubiquitous
lag/flag/cumsum formulation, e.g. the classic sessionization idiom in
ANSI-SQL window-function literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 30 min of silence ends a session — the conventional web-analytics gap.
SESSION_GAP_US = 30 * 60 * 1_000_000


def epoch_us(ts_col) -> F.Column:
    """Epoch microseconds of a timestamp/timestamp_ntz column (ntz is
    reinterpreted in the session's pinned UTC, matching DuckDB's naive
    ``epoch_us``)."""
    return F.unix_micros(F.col(ts_col).cast("timestamp") if isinstance(
        ts_col, str) else ts_col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """Assign a per-user 1-based ``session_id`` to every event.

    A new session starts at the first event of a user and whenever the
    gap since the previous event exceeds ``gap_us``: lag → boundary flag
    → running sum, all over the SAME window spec (one Exchange).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    us = epoch_us(ts_col)
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("ts_us", us).withColumn(
        "session_id", F.sum(new_sess).over(running).cast("int")
    )


def session_rollup(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """One row per (user, session): bounds, size, type breadth, value
    mass.  Downstream of ``sessionize`` the rollup groups on the SAME
    key prefix the window just partitioned by, so the aggregation reuses
    the existing (user) clustering — map-side partial aggs, no second
    full shuffle of the corpus."""
    s = sessionize(events, user_col, ts_col, tiebreak_col, gap_us)
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def as_of_attach(
    events: DataFrame,
    anchor_filter: F.Column,
    ref_filter: F.Column,
    attach_cols: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """As-of join without a join: for every ANCHOR event, attach the
    most recent strictly-earlier REFERENCE event of the same user.

    The generic formulation (range join / MERGE ASOF) explodes candidate
    pairs; partitioned by user it is one window pass —
    ``last(ref_value ignore nulls) over (rows unbounded preceding → 1
    preceding)`` — so the cost is the single user-key shuffle shared
    with every other session operator.  Attached columns come back as
    ``ref_<name>`` (null when no prior reference exists)."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = events
    for c in attach_cols:
        out = out.withColumn(
            f"ref_{c}",
            F.last(F.when(ref_filter, F.col(c)), ignorenulls=True).over(w),
        )
    return out.where(anchor_filter)
