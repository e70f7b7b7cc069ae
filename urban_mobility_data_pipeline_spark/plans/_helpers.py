"""Shared helpers for the query catalog.

Cross-engine parity rules used by every query (the driver compares our
Spark result against a DuckDB oracle by row-count + schema +
order-insensitive value hash):

- **Timestamps** never leave a query raw: the testdata parquet stores
  naive timestamps (micros for the TPC-H-ish tables, nanos for
  ``events``), DuckDB reads them naive, and Spark reads them as
  ``timestamp_ntz`` — except nanos, which Spark 4 only reads with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` (as a ``long``). We emit
  formatted date/time strings or epoch-microsecond longs.
- **Doubles** are rounded explicitly on BOTH sides after aggregation, so
  sub-ulp fold-order differences can't flip the value hash.
- **Integer sums** are ``CAST(... AS BIGINT)`` in DuckDB (whose sum(int)
  is HUGEINT) to match Spark's long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.session import configure_session
from urban_mobility_data_pipeline_spark.sources.files import load_table

#: 30-minute sessionization gap, in microseconds.
SESSION_GAP_US = 30 * 60 * 1_000_000


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table with parity-safe session settings."""
    configure_session(spark)
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS); Spark 4 refuses it unless
        # read as long. ts_us = floor-division to micros matches DuckDB's
        # micro-truncated TIMESTAMP reading (epoch_us).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return load_table(spark, sf_dir, name).withColumn(
            "ts_us", F.expr("ts div 1000")
        )
    return load_table(spark, sf_dir, name)


def date_str(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """Format a date/timestamp column as string (engine-neutral output)."""
    return F.date_format(col, fmt)


def event_time(ts_us: Column | str = "ts_us") -> Column:
    """Event-time timestamp from epoch micros. Session TZ is pinned to UTC
    by configure_session, so formatting matches DuckDB's naive reading."""
    c = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    return F.timestamp_micros(c)


def duck_md5_int_key(expr: str) -> str:
    """DuckDB SQL reproducing functions.hashing.md5_int_key bit-for-bit:
    first 15 hex chars of md5 parsed base-16 → pmod 2147483646 → +1."""
    return (
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substring(md5(coalesce({expr}, '')), 1, 15), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        "(a, b) -> a * 16 + b) % 2147483646 + 1 AS INTEGER)"
    )
