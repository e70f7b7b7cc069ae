"""as-of join and bucketed range join — semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_join,
)
from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k int, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 200, 2.0), (2, 60, 3.0)],
        "k int, rts long, rv double",
    )
    return left, right


def test_asof_backward_with_exact_match(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        payload={"rts": "m_ts", "rv": "m_v"},
    )
    got = {r["lv"]: (r["m_ts"], r["m_v"]) for r in out.collect()}
    assert got == {
        "a": (100, 1.0),  # exact ts match included
        "b": (200, 2.0),  # most recent prior
        "c": (None, None),  # right exists but only in the future
        "d": (None, None),  # no right rows for key
    }


def test_asof_forward_and_tolerance(spark):
    left, right = _asof_fixture(spark)
    fwd = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        payload={"rts": "m_ts"},
        direction="forward",
    )
    got = {r["lv"]: r["m_ts"] for r in fwd.collect()}
    assert got == {"a": 100, "b": None, "c": 60, "d": None}

    tol = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        payload={"rts": "m_ts"},
        tolerance=5,
    )
    got = {r["lv"]: r["m_ts"] for r in tol.collect()}
    assert got == {"a": 100, "b": 200, "c": None, "d": None}


def test_asof_carries_null_payload_of_latest_row(spark):
    """A NULL inside the latest right row must be carried as NULL, not
    skipped for an older non-NULL value."""
    left = spark.createDataFrame([(1, 300, "x")], "k int, ts long, lv string")
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 200, None)], "k int, rts long, rv double"
    )
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        payload={"rts": "m_ts", "rv": "m_v"},
    )
    row = out.collect()[0]
    assert (row["m_ts"], row["m_v"]) == (200, None)


def test_range_join_bucket_edges(spark):
    left = spark.createDataFrame([(1, 95), (2, 200)], "lid int, ts long")
    right = spark.createDataFrame(
        [(10, 95), (11, 104), (12, 105), (13, 199), (14, 290)],
        "rid int, rts long",
    )
    out = range_join(left, right, left_ts="ts", right_ts="rts", window=10)
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    # [95,105): exact start in; 104 crosses the bucket boundary; 105 out
    assert pairs == {(1, 10), (1, 11)}


def test_range_join_plans_hash_join_not_nested_loop(spark, sf_dir):
    """The bucketed rewrite must avoid BroadcastNestedLoopJoin."""
    df = QUERIES["events_range_join_error_counts"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_single_exchange(spark):
    """union-sort-carry must shuffle once on the key, not join."""
    left, right = _asof_fixture(spark)
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        payload={"rv": "m_v"},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
