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


def test_flagship_plan_shape(spark, sf_dir):
    """The flagship rollup must map-side combine (partial agg before the
    exchange), push its date filter into the parquet scan, and stay
    JVM-side (no Python eval)."""
    df = QUERIES["pricing_summary"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "BatchEvalPython" not in plan


def test_no_row_at_a_time_python_in_catalog(spark, sf_dir):
    """No catalog query may fall back to row-at-a-time Python UDF
    execution — Python is allowed only as Arrow-batched eval."""
    for name, fn in sorted(QUERIES.items()):
        if name.startswith("streaming_"):
            continue  # streaming twins execute, not just plan
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name


def test_narrow_projection_prunes_scan_columns(spark, sf_dir):
    """A 2-column query must not scan all 9 orders columns."""
    df = QUERIES["latest_order_per_customer"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas
    for s in schemas:
        cols = [c.split(":")[0] for c in s.split(",") if c]
        assert len(cols) <= 6, cols


def test_near_dup_pairs_stages_shingles_once(spark, sf_dir):
    """The shingle table must be computed once (persisted stage) and the
    candidate pairs broadcast into the verify joins — the corpus text is
    tokenized a single time, never reshuffled (extensions/dedup.py
    near_dup_pairs)."""
    df = QUERIES["doc_near_dup_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # staged shingles + staged band keys serve every consumer
    assert plan.count("InMemoryTableScan") >= 4
    # candidates broadcast into both verify joins
    assert plan.count("BroadcastHashJoin") >= 2
    # every documents FileScan in the text sits inside a cached-relation
    # repr: outside the two in-memory stages nothing rescans the corpus
    assert plan.count("InMemoryRelation") >= plan.count("FileScan parquet") - 1
