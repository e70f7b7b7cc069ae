"""Skew-aware aggregation and joins (100 TB design note, SURVEY.md §7
phase 6).

AQE's skew-join splitting handles oversized shuffle partitions of a
sort-merge join; :func:`salted_join` covers the case it can't — one hot
KEY that must be split by changing the join key itself. For
*aggregations* over hot keys (the classic: one user_id is 30% of
events), two-phase salted aggregation bounds any single task's input:
phase 1 aggregates (key, salt) partials, phase 2 merges per key.
Correct for any algebraic aggregate (sum/count/min/max);
count-distinct needs the two-level exact form below.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _row_salt(keys: Sequence[str], buckets: int) -> Column:
    """Per-ROW salt: hash of (keys, monotonically_increasing_id).

    A per-partition salt (hash of keys + spark_partition_id) degenerates
    when the hot key arrives in few input partitions — one big file or a
    post-coalesce stage gives every hot-key row the same salt and the
    split never happens. The row-id component spreads hot-key rows across
    all ``buckets`` regardless of input layout. Which bucket a row lands
    in never affects results (aggregation merges all buckets; the join's
    small side is replicated across all buckets), so the id's
    partition-layout sensitivity is harmless; for file-based scans the
    ids are stable under task retry (partition index + row order).
    """
    return F.pmod(
        F.xxhash64(
            *[F.col(k) for k in keys], F.monotonically_increasing_id()
        ),
        F.lit(buckets),
    )


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
    salted = df.withColumn(SALT_COL, _row_salt(keys, buckets))
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Explicit salted equi-join for hot keys in the window AQE's
    skew-split doesn't cover: AQE splits an oversized *shuffle
    partition* of a sort-merge join, but a single hot KEY inside one
    partition can't be split without changing the join key — which is
    exactly what salting does. The big side gets a deterministic
    per-row salt appended to the key; the small side is replicated
    across all ``buckets`` salt values, so every (key, salt) pair still
    matches. Cost: |small| × buckets rows shuffled — use when the small
    side is too big to broadcast but modest enough to replicate.

    Supports ``inner`` and ``left`` (big side preserved) joins; the
    salt column never escapes."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    salted_big = big.withColumn(SALT_COL, _row_salt(keys, buckets))
    replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    out = salted_big.join(replicated, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)


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
