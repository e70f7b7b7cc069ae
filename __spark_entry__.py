"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``urban_mobility_data_pipeline_spark.plans`` — one
entry per implemented operator from SURVEY.md §2 plus the LLM-pipeline
extensions; this module only adapts them to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from urban_mobility_data_pipeline_spark.plans.catalog import (
    DRIVER_ORACLES,
    DRIVER_QUERIES,
    FLAGSHIP,
    QUERIES,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (conditional daily-rollup aggregation, SURVEY §2.5
    A1) on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[FLAGSHIP](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The curated 50 driver slots (catalog.DRIVER_QUERY_NAMES): one per
    implemented operator from SURVEY.md §2 (+extensions). The full
    catalog (plans.catalog.QUERIES) is larger; the remainder is covered
    by bench.py and tests/test_parity_oracle.py."""
    return dict(DRIVER_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable driver query."""
    return dict(DRIVER_ORACLES)
