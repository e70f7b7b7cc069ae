"""The size-gated compute-spread on dense-table scans (r13).

Testdata tables arrive as ONE parquet row group, so every scan —
and every compute-dense tokenize/shingle stage above it — runs as a
single task regardless of core count. ``plans._helpers.table`` can
hash-repartition the documents table to ``defaultParallelism``, but
ONLY when the caller opts in (``spread=True``) AND the whole table is
at most ``spark.umdp.spread.maxBytes`` on disk: past the gate the file
layout already parallelizes the scan and the rule must degrade to a
no-op. The opt-in exists because the spread is a measured net LOSS for
explode-to-wide-key aggregations and cheap map/agg rows (see the
decision rule on ``_helpers._SPREAD_KEYS``); only per-doc compute-dense
consumers ask for it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.plans._helpers import table

SF = "/root/testdata/sf0.001"


def _n_parts(df) -> int:
    # physical partition count without .rdd (banned): the number of
    # distinct spark_partition_id values after materialization
    return df.select(F.spark_partition_id().alias("p")).distinct().count()


def test_spread_is_opt_in(spark):
    # default load: no spread exchange, whatever the table size
    docs = table(spark, SF, "documents")
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tiny_documents_scan_is_spread(spark):
    docs = table(spark, SF, "documents", spread=True)
    assert _n_parts(docs) > 1
    assert "Exchange hashpartitioning(doc_id" in (
        docs._jdf.queryExecution().executedPlan().toString()
    )


def test_gate_disables_spread_for_big_tables(spark):
    spark.conf.set("spark.umdp.spread.maxBytes", "1")
    try:
        docs = table(spark, SF, "documents", spread=True)
        plan = docs._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.umdp.spread.maxBytes")


def test_numeric_tables_never_spread(spark):
    li = table(spark, SF, "lineitem", spread=True)
    plan = li._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pushdown_reaches_scan_below_spread(spark):
    docs = table(spark, SF, "documents", spread=True)
    plan = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "(doc_id" in plan.split("FileScan", 1)[-1]  # DataFilters
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_spread_identical_rows(spark):
    spread = table(spark, SF, "documents", spread=True)
    plain = table(spark, SF, "documents")
    assert sorted(map(repr, spread.collect())) == sorted(
        map(repr, plain.collect())
    )
