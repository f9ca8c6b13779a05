"""Per-stage lineage & counters (O23).

BASELINE.json: "every stage writes per-partition lineage and counters to
Iceberg metadata tables". In the sandbox's parquet fallback the same rows
land in an append-only ``metrics`` table: one row per (run, stage,
partition) with row counts, plus stage-level wall-clock rows.  On a real
Iceberg deployment the identical DataFrame appends to a metadata table and
the snapshot id joins it to the data commit.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "run_id string, config_id string, stage string, partition_id int, "
    "rows long, wall_sec double, ts double"
)


def partition_lineage(
    spark: SparkSession,
    df: DataFrame,
    run_id: str,
    config_id: str,
    stage: str,
    wall_sec: float,
) -> DataFrame:
    """Per-partition row counts of a stage output + one stage-total row
    (partition_id = -1). One extra narrow aggregation over the stage
    output; the groupBy key is the physical partition id so the count is
    map-side only."""
    per_part = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(config_id).alias("config_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows",
            F.lit(float(wall_sec)).alias("wall_sec"),
            F.lit(time.time()).alias("ts"),
        )
    )
    total = per_part.groupBy("run_id", "config_id", "stage").agg(
        F.lit(-1).alias("partition_id"),
        F.sum("rows").alias("rows"),
        F.first("wall_sec").alias("wall_sec"),
        F.first("ts").alias("ts"),
    )
    return per_part.unionByName(total)
