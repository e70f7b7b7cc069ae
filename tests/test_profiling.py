"""Unit tests for the single-pass profiler (operators/profiling.py):
metric correctness on a frame with known nulls, and the documented
plan difference between exact (Expand) and approx (no Expand)
distinct counting. The catalog query orders_data_profile is
hash-checked against its generated oracle by test_parity_oracle."""

from __future__ import annotations

from urban_mobility_data_pipeline_spark.operators.profiling import (
    NUMERIC,
    STRING,
    profile,
)


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, None, "b"),
            (3, 30.0, None),
            (4, 30.0, "b"),
        ],
        "id bigint, amount double, tag string",
    )


def test_profile_metrics(spark):
    rows = {
        r["col_name"]: r
        for r in profile(
            _fixture(spark),
            {"id": NUMERIC, "amount": NUMERIC, "tag": STRING},
        ).collect()
    }
    assert set(rows) == {"id", "amount", "tag"}
    assert all(r["n_rows"] == 4 for r in rows.values())

    assert rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 4
    assert rows["id"]["min_num"] == 1.0 and rows["id"]["max_num"] == 4.0
    assert rows["id"]["min_str"] is None

    assert rows["amount"]["n_nulls"] == 1
    assert rows["amount"]["n_distinct"] == 2  # nulls excluded, 30.0 deduped
    assert rows["amount"]["min_num"] == 10.0
    assert rows["amount"]["max_num"] == 30.0

    assert rows["tag"]["n_nulls"] == 1
    assert rows["tag"]["n_distinct"] == 2
    assert rows["tag"]["min_str"] == "a" and rows["tag"]["max_str"] == "b"
    assert rows["tag"]["min_num"] is None


def test_exact_vs_approx_plan(spark):
    df = _fixture(spark)
    cols = {"id": NUMERIC, "amount": NUMERIC, "tag": STRING}
    exact_plan = (
        profile(df, cols)._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        profile(df, cols, exact_distinct=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # NEITHER mode may pay the multi-distinct Expand: exact mode runs
    # per-column distinct subtrees instead (visible as one extra
    # aggregate subtree per column), approx uses HLL in the base agg
    assert "Expand" not in exact_plan
    assert "Expand" not in approx_plan
    assert exact_plan.count("HashAggregate") > approx_plan.count(
        "HashAggregate"
    )


def test_approx_sane(spark):
    rows = {
        r["col_name"]: r
        for r in profile(
            _fixture(spark),
            {"id": NUMERIC, "tag": STRING},
            exact_distinct=False,
        ).collect()
    }
    # HLL on 4 values is exact in practice
    assert rows["id"]["n_distinct"] == 4
    assert rows["tag"]["n_distinct"] == 2
