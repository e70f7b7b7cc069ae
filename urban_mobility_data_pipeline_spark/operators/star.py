"""Star-schema conformance operators (SURVEY.md §2.3 J1-J2, §2.8 U1, dims).

Reference: gold facts validate FKs against dims and map misses to the
reserved key ``0 = UNKNOWN`` (``src/gold/_marts/facts/fact_trips.py:140-201``);
dims are unioned with a materialized UNKNOWN row
(``src/gold/_conformed/static/dim_date.py:150-159``); the date dim is a
``sequence``+``explode`` calendar spine (``dim_date.py:131-148``).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNKNOWN_KEY = 0


def validate_fk(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    out_col: str | None = None,
    broadcast_dim: bool = True,
    orphan_flag_col: str | None = None,
) -> DataFrame:
    """Dim-validation left join: orphan FKs → reserved key 0 (reference J1,
    ``src/gold/_marts/facts/fact_trips.py:154-201``).

    The dim side is projected to its key column only (column pruning) and
    broadcast by default — dims are small relative to facts, so at 100 TB
    this stays a map-side join with zero shuffle of the fact.
    """
    out_col = out_col or fact_key
    dim_keys = dim.select(F.col(dim_key).alias("__dim_key")).distinct()
    if broadcast_dim:
        dim_keys = F.broadcast(dim_keys)
    joined = fact.join(dim_keys, fact[fact_key] == dim_keys["__dim_key"], "left")
    orphan = F.col("__dim_key").isNull()
    out = joined.withColumn(
        out_col,
        F.when(orphan, F.lit(UNKNOWN_KEY)).otherwise(F.col(fact_key)),
    )
    if orphan_flag_col:
        out = out.withColumn(orphan_flag_col, orphan)
    return out.drop("__dim_key")


def with_unknown_row(
    dim: DataFrame, unknown_values: Mapping[str, Column]
) -> DataFrame:
    """Union a reserved UNKNOWN row into a dim (reference U1,
    ``static/dim_date.py:150-159``, ``static/dim_payment.py:128-137``).

    Missing columns are allowed on either side, mirroring
    ``unionByName(allowMissingColumns=True)``.
    """
    spark = dim.sparkSession
    row = spark.range(1).select(
        *[v.alias(c) for c, v in unknown_values.items()]
    )
    return dim.unionByName(row, allowMissingColumns=True)


def calendar_attributes(spine: DataFrame, date_col: str = "date") -> DataFrame:
    """Date attributes over a calendar spine (reference
    ``src/gold/_conformed/static/dim_date.py:131-148``).

    ``spine`` is typically built with ``sequence`` + ``explode`` over a
    1-row min/max bounds frame, so no driver-side collect is needed.
    """
    spine = spine.select(F.col(date_col).cast("date").alias("date"))
    return spine.select(
        "date",
        F.date_format("date", "yyyyMMdd").cast("int").alias("date_key"),
        F.year("date").alias("year"),
        F.month("date").alias("month"),
        F.dayofmonth("date").alias("day"),
        F.weekofyear("date").alias("week_of_year"),
        F.dayofweek("date").alias("day_of_week"),  # 1 = Sunday, reference semantics
        F.date_format("date", "EEEE").alias("day_name"),
        F.quarter("date").alias("quarter"),
        F.dayofweek("date").isin(1, 7).alias("is_weekend"),
    )
