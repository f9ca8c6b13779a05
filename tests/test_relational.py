"""Relational analytics tier (TPC-H Q1/Q3/Q5 patterns): plan hygiene.

Value correctness is the parity suite's job (test_entry); these tests pin
the PHYSICAL properties the 100 TB story depends on — filter pushdown and
column pruning on the fact scan, dimension joins broadcasting, and the
whole tier staying JVM-side (zero Python nodes).
"""

from __future__ import annotations

from locality_sensitive_hashing_spark.entry_queries import (
    q_pricing_summary,
    q_regional_nation_revenue,
    q_shipping_priority,
)

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pricing_summary_scan_pushdown_and_pruning(spark):
    plan = _plan(q_pricing_summary(spark, SF_DIR))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "l_shipdate" in pushed[0], plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # 7 needed columns only -- the scan must not read keys it never uses
    assert "l_orderkey" not in read and "l_partkey" not in read, read
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_shipping_priority_dims_broadcast(spark):
    plan = _plan(q_shipping_priority(spark, SF_DIR))
    # formatted explain prints each node in tree + detail: count tree lines
    assert plan.count("BroadcastHashJoin Inner") == 2, plan  # cust + orders
    assert "SortMergeJoin" not in plan, plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_shipdate" in l for l in pushed), plan
    assert any("c_mktsegment" in l for l in pushed), plan


def test_regional_revenue_tiny_dims_broadcast(spark):
    plan = _plan(q_regional_nation_revenue(spark, SF_DIR))
    # region->nation, nation->supplier, supplier->fact: three explicit
    # broadcasts; customer deliberately unhinted (fact-scaled at 100 TB).
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert any(
        "r_name" in l for l in plan.splitlines() if "PushedFilters" in l
    ), plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
