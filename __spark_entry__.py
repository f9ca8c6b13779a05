"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in
``locality_sensitive_hashing_spark.entry_queries``; the bit-exact
pipeline-vs-numpy-oracle gate is ``python -m pytest tests/ -x -q``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from locality_sensitive_hashing_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full MinHash/SimHash/suffix-array + audio-verify dedup
    pipeline over clips synthesized from sf0.001 documents; returns the
    cluster-assignment DataFrame (clip_id, cluster_id)."""
    return EQ.run_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return EQ.all_queries()


def oracle_sql() -> dict[str, str]:
    """One DuckDB replica per queries() entry -- NO rows-only queries
    remain (since round 3): UDF-kernel queries commit their kernel
    output to aux parquet tables and the oracle replays the entire
    downstream derivation relationally (hash family as literals,
    byte-arithmetic WAV decode, recursive-CTE closures), so every
    driver query is value-hash-checked."""
    return dict(EQ.ORACLE_SQL)
