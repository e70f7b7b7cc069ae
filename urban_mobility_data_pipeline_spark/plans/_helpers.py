"""Shared helpers for the query catalog.

Cross-engine parity rules used by every query (the driver compares our
Spark result against a DuckDB oracle by row-count + schema +
order-insensitive value hash):

- **Timestamps** never leave a query raw: the testdata parquet stores
  naive timestamps, DuckDB reads them naive, and Spark reads them as
  ``timestamp_ntz`` — except TIMESTAMP(NANOS), which Spark 4 only reads
  with ``spark.sql.legacy.parquet.nanosAsLong=true`` (as a ``long``).
  ``events.ts`` has shipped as BOTH physical types across testdata
  regenerations, so :func:`table` adapts to the loaded dtype and always
  derives the same ``ts_us`` epoch-microsecond long; queries only ever
  consume ``ts_us``. We emit formatted date/time strings or
  epoch-microsecond longs.
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
    """Load a testdata table with parity-safe session settings.

    For ``events``, the physical type of ``ts`` has varied across testdata
    generations (TIMESTAMP(NANOS) vs TIMESTAMP(MICROS)), so the derivation
    of the canonical ``ts_us`` (epoch micros, bigint) branches on the
    dtype Spark actually loaded:

    - ``timestamp``/``timestamp_ntz`` (micros/millis physical): cast to
      ``timestamp`` (session TZ is pinned UTC by ``configure_session``, so
      the naive value maps to the same wall-clock instant DuckDB's
      ``epoch_us(ts)`` sees) then ``unix_micros``. ``unix_micros`` rejects
      TIMESTAMP_NTZ directly, hence the cast.
    - nanos: Spark 4 refuses TIMESTAMP(NANOS) unless
      ``spark.sql.legacy.parquet.nanosAsLong=true`` reads it as a long;
      then ``ts div 1000`` floor-divides to micros, matching DuckDB's
      micro-truncated reading.
    """
    configure_session(spark)
    if name == "events":
        try:
            df = load_table(spark, sf_dir, name)
            ts_type = dict(df.dtypes).get("ts")
        except Exception:
            # TIMESTAMP(NANOS) without nanosAsLong fails at schema
            # inference — flip the legacy flag and read as long.
            ts_type = None
        if ts_type is None:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = load_table(spark, sf_dir, name)
            ts_type = dict(df.dtypes).get("ts")
        return df.withColumn("ts_us", events_ts_us(ts_type))
    return load_table(spark, sf_dir, name)


def events_ts_us(ts_type: str | None) -> Column:
    """Epoch-micros bigint from ``events.ts``, adapted to the dtype Spark
    loaded it as (``bigint`` = nanos-as-long; otherwise a timestamp type)."""
    if ts_type == "bigint":
        return F.expr("ts div 1000")
    return F.unix_micros(F.col("ts").cast("timestamp"))


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
