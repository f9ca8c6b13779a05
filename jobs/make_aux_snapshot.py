#!/usr/bin/env python
"""Regenerate tests/aux_snapshot/sf0.01 — the committed copy of the
oracle aux tables.

The aux-table oracle pattern (entry_queries docstring) has each
UDF-kernel query write its kernel output to /tmp/lsh_oracle_aux/<sf>/
for the DuckDB oracle to replay. All of those tables are DETERMINISTIC
functions of (testdata, Config seed, code), so a snapshot is committed
under tests/ and seeded into /tmp at import time — the oracle SQL then
works even if a harness evaluates it before running the matching Spark
query. tests/test_entry.py compares the live tables against this
snapshot value-for-value; when a kernel change legitimately shifts them,
rerun this script and commit (same policy as tests/make_golden.py).
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from locality_sensitive_hashing_spark import entry_queries as EQ
    from locality_sensitive_hashing_spark.session import get_spark

    spark = get_spark("local[8]", app_name="aux-snapshot", shuffle_partitions=8)
    for name in sorted(EQ.AUX_TABLES_BY_QUERY):
        print(f"running {name} ...", file=sys.stderr)
        EQ.all_queries()[name](spark, SF_DIR).count()  # triggers _aux_write
    src_root = os.path.join(EQ.AUX_ROOT, os.path.basename(SF_DIR))
    dst_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "aux_snapshot", os.path.basename(SF_DIR),
    )
    if os.path.exists(dst_root):
        shutil.rmtree(dst_root)
    for table in sorted(
        {t for q in EQ.AUX_TABLES_BY_QUERY.values() for t in q}
    ):
        os.makedirs(os.path.join(dst_root, table))
        for f in sorted(glob.glob(os.path.join(src_root, table, "*.parquet"))):
            shutil.copy(f, os.path.join(dst_root, table, os.path.basename(f)))
    print(dst_root)
    spark.stop()


if __name__ == "__main__":
    main()
