"""File sources & sinks (SURVEY.md §2.1 S3-S10).

The reference stores every layer as Delta (reference
``src/silver/trips_bronze_to_silver.py:121``, write patterns at
``src/bronze/trips_oltp_to_bronze.py:146-153``). delta-spark is not
available in this environment, so the managed-table layer
(:mod:`..operators.merge`) documents a Parquet read-modify-overwrite
strategy with the same output semantics; plain scans/sinks below are
format-parameterized and work with either.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables shipped in /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one test table (reference S3: Delta/Parquet scan).

    A bare ``spark.read.parquet`` keeps predicate pushdown & column pruning
    available to Catalyst — filters applied by callers reach the scan.
    """
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def table_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe gating create-vs-merge (reference S4:
    ``DeltaTable.isDeltaTable`` at ``src/bronze/trips_oltp_to_bronze.py:32``)."""
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def empty_table(spark: SparkSession, ddl_schema: str) -> DataFrame:
    """Empty-table bootstrap (reference S9,
    ``src/bronze/trips_oltp_to_bronze.py:35-43``)."""
    return spark.createDataFrame([], ddl_schema)


def literal_rows(spark: SparkSession, rows: list[tuple], ddl_schema: str) -> DataFrame:
    """Single/few-row literal source for watermark rows, UNKNOWN dim rows,
    date endpoints (reference S10, ``static/dim_date.py:150-157``)."""
    return spark.createDataFrame(rows, ddl_schema)


def write_append_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Partitioned append sink (reference S5,
    ``src/bronze/trips_oltp_to_bronze.py:146-153``). Partitioning by
    ``load_date`` is what makes downstream watermark reads prune at scale."""
    df.write.format(fmt).mode("append").partitionBy(*partition_cols).save(path)


def write_overwrite(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Overwrite-with-schema sink (reference S6,
    ``src/silver/trips_bronze_to_silver.py:326-332``)."""
    df.write.format(fmt).mode("overwrite").save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Bucketed table write (catalog-managed): co-locates both sides of a
    recurring equi-join so the join runs with ZERO exchange — the
    pre-shuffle is paid once at write time. This is the 100 TB lever for
    fact⋈fact joins the reference never needed (its dims broadcast);
    asserted shuffle-free in tests/test_bucketing.py."""
    writer = (
        df.write.format(fmt)
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
