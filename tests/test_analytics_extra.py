"""Checks that can't be SQL-oracled: sketch accuracy, plan shape."""

from __future__ import annotations

from urban_mobility_data_pipeline_spark.plans.analytics import (
    approx_distinct_users,
)
from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES


def test_approx_distinct_within_tolerance(spark, sf_dir):
    rows = approx_distinct_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_users"] - r["exact_users"]) / max(
            r["exact_users"], 1
        )
        assert rel_err < 0.1, (r["event_type"], rel_err)


def test_incremental_slice_pushes_filters_to_scan(spark, sf_dir):
    """P1/P2 predicates must reach the parquet scan (PushedFilters)."""
    df = QUERIES["incremental_order_slice"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(o_orderdate)" in plan or "GreaterThan(o_orderdate" in plan


def test_fk_validation_broadcasts_dim(spark, sf_dir):
    df = QUERIES["orders_fk_validated"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_topk_plans_take_ordered(spark, sf_dir):
    df = QUERIES["top_customers_by_spend"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
