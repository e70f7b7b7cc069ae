"""Skew-aware aggregation (100 TB design note, SURVEY.md §7 phase 6).

AQE's skew-join splitting handles joins; for *aggregations* over hot
keys (the classic: one user_id is 30% of events), two-phase salted
aggregation bounds any single task's input: phase 1 aggregates
(key, salt) partials, phase 2 merges per key. Correct for any
algebraic aggregate (sum/count/min/max); count-distinct needs the
two-level exact form below.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: Mapping[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``partials`` maps output name ->
    (phase1_expr, phase2_expr-over-phase1-column). Example::

        salted_agg(ev, ["user_id"], {
            "n":   (F.count(F.lit(1)),  F.sum("n")),
            "v":   (F.sum("value"),     F.sum("v")),
            "mx":  (F.max("value"),     F.max("mx")),
        })
    """
    # deterministic salt: hash of (keys, input partition) — stable under
    # task retry and across runs for the same file layout, unlike
    # monotonically_increasing_id, which renumbers on every attempt
    salted = df.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()),
            F.lit(buckets),
        ),
    )
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()]
    )


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    out_col: str = "n_distinct",
    buckets: int = 32,
) -> DataFrame:
    """Exact count-distinct for skewed keys: salt by hash of the distinct
    value (so equal values land in the same bucket — no double count),
    count distinct per (key, salt), then sum buckets per key."""
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets))
    )
    per_bucket = salted.groupBy(*keys, SALT_COL).agg(
        F.countDistinct(distinct_col).alias("__partial")
    )
    return per_bucket.groupBy(*keys).agg(
        F.sum("__partial").alias(out_col)
    )
