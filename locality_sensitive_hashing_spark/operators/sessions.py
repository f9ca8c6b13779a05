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


def windowed_count_join(
    events: DataFrame,
    anchor_filter: F.Column,
    ref_filter: F.Column,
    window_us: int = SESSION_GAP_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Bounded INTERVAL join via time binning: for every ANCHOR event,
    count same-user REFERENCE events in the half-open window
    ``[anchor_ts - window_us, anchor_ts)`` (strictly earlier, like the
    as-of join; an event exactly window_us before IS counted).

    The naive range join is a per-user cartesian filtered by the time
    predicate — quadratic in a hot user's event count and un-plannable
    as a hash join (inequality key).  The scalable form bins time into
    ``window_us``-wide buckets: an in-window reference is always in the
    anchor's bin or the one before, so each reference row is emitted
    into exactly TWO (user, bin) join keys and the join is pure
    EQUALITY — shuffle 2|refs| + |anchors| rows, hash-joinable, AQE-
    splittable on skew; the exact time predicate then filters the
    <= 2-bin candidates.  Anchors with no in-window references are
    restored by a left join against the anchor projection (count 0).

    Returns (id, user, ts_us, n_in_window).
    """
    us = epoch_us(ts_col)
    # `div` = exact integer division (a double quotient cast could misbin
    # a value within rounding distance of a bin edge)
    anchors = events.where(anchor_filter).select(
        F.col(id_col), F.col(user_col), us.alias("ts_us"),
    ).withColumn("_bin", F.expr(f"ts_us div {int(window_us)}"))
    refs = events.where(ref_filter).select(
        F.col(user_col), us.alias("_ref_us"),
    ).withColumn("_rbin", F.expr(f"_ref_us div {int(window_us)}"))
    # each ref lands in candidate anchor-bins rbin and rbin+1
    ref2 = refs.select(
        user_col, "_ref_us",
        F.explode(F.array(F.col("_rbin"), F.col("_rbin") + 1)).alias("_bin"),
    )
    hits = (
        anchors.join(ref2, [user_col, "_bin"])
        .where(
            (F.col("_ref_us") < F.col("ts_us"))
            & (F.col("_ref_us") >= F.col("ts_us") - F.lit(window_us))
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_in_window"))
    )
    return (
        anchors.select(id_col, user_col, "ts_us")
        .join(hits, id_col, "left")
        .select(
            id_col, user_col, "ts_us",
            F.coalesce("n_in_window", F.lit(0)).alias("n_in_window"),
        )
    )
