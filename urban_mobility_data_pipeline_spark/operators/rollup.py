"""Multi-resolution rollup cascade (continuous-aggregate / hypertable
rollup pattern).

No reference counterpart (the reference's agg layer — SURVEY.md §2.5,
`gold/agg_trips_daily.py` — always re-aggregates from silver facts).
At 100 TB the coarser grains must derive from the finer grain's
*partial* aggregates, not from a raw rescan: a daily rollup built from
24 hourly partials reads ~3 orders of magnitude less input, and the
hourly layer is already materialized for its own dashboards.

Correctness requirement is algebraic decomposability: count/sum/min/max
compose (sum of sums, min of mins); avg is derived at finalize time as
sum/count. Non-decomposable aggregates (exact median, exact distinct)
must NOT pass through a cascade — use sketches (HLL in
`operators/skew.py` terms) or aggregate from raw.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: partial-state column names produced by partial_rollup per measure m:
#: m_cnt, m_sum, m_min, m_max


def time_bucket(ts_col: Column | str, grain: int) -> Column:
    """Floor an epoch-integer column to a grain-sized bucket start."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (c - (c % F.lit(int(grain)))).alias("bucket")


def partial_rollup(
    df: DataFrame,
    *,
    ts: str,
    grain: int,
    keys: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Aggregate raw rows to per-bucket partial states (one map-side
    combinable groupBy). ``ts`` is an epoch-integer column; ``grain`` in
    the same unit."""
    aggs = []
    for m in measures:
        aggs += [
            F.count(F.col(m)).alias(f"{m}_cnt"),
            F.sum(F.col(m)).alias(f"{m}_sum"),
            F.min(F.col(m)).alias(f"{m}_min"),
            F.max(F.col(m)).alias(f"{m}_max"),
        ]
    return df.groupBy(time_bucket(ts, grain), *keys).agg(*aggs)


def cascade(
    partials: DataFrame,
    *,
    grain: int,
    keys: Sequence[str],
    measures: Sequence[str],
) -> DataFrame:
    """Re-aggregate finer partial states to a coarser ``grain`` without
    touching raw data (sum of counts/sums, min of mins, max of maxes)."""
    aggs = []
    for m in measures:
        aggs += [
            F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return partials.groupBy(time_bucket("bucket", grain), *keys).agg(*aggs)


def finalize(
    partials: DataFrame,
    *,
    keys: Sequence[str],
    measures: Sequence[str],
    round_to: int = 2,
) -> DataFrame:
    """Close partial states into user-facing columns (avg derived as
    sum/count — never averaged across partials)."""
    cols: list[Column] = [F.col("bucket"), *[F.col(k) for k in keys]]
    for m in measures:
        cols += [
            F.col(f"{m}_cnt").alias(f"n_{m}"),
            F.round(F.col(f"{m}_sum"), round_to).alias(f"total_{m}"),
            F.round(F.col(f"{m}_min"), round_to).alias(f"min_{m}"),
            F.round(F.col(f"{m}_max"), round_to).alias(f"max_{m}"),
            # avg from the ROUNDED total: cross-engine fold-order noise
            # in the raw sum would otherwise flip the last avg digit
            F.round(
                F.round(F.col(f"{m}_sum"), round_to) / F.col(f"{m}_cnt"),
                round_to,
            ).alias(f"avg_{m}"),
        ]
    return partials.select(*cols)


def sketch_rollup(
    df: DataFrame,
    *,
    ts: str,
    grain: int,
    keys: Sequence[str],
    distinct_cols: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-bucket HLL sketches for distinct counts — the cascade-safe
    form of the ONE aggregate the plain rollup cannot carry:
    count-distinct is not algebraic (distinct-of-day != sum of
    distinct-of-hours), but its Datasketches HLL state is mergeable, so
    sketches cascade exactly like sums. ~2^lg_k bytes per sketch,
    relative error ~1.04/sqrt(2^lg_k) (~1.6% at the default)."""
    aggs = [
        F.hll_sketch_agg(F.col(c), F.lit(lg_k)).alias(f"{c}_hll")
        for c in distinct_cols
    ]
    return df.groupBy(time_bucket(ts, grain), *keys).agg(*aggs)


def sketch_cascade(
    sketches: DataFrame,
    *,
    grain: int,
    keys: Sequence[str],
    distinct_cols: Sequence[str],
) -> DataFrame:
    """Union finer-grain HLL sketches to a coarser grain (lossless merge
    of the sketch states — no raw rescan)."""
    aggs = [
        F.hll_union_agg(F.col(f"{c}_hll")).alias(f"{c}_hll")
        for c in distinct_cols
    ]
    return sketches.groupBy(time_bucket("bucket", grain), *keys).agg(*aggs)


def sketch_estimate(
    sketches: DataFrame, *, distinct_cols: Sequence[str]
) -> DataFrame:
    """Close HLL states into approximate distinct counts."""
    out = sketches
    for c in distinct_cols:
        out = out.withColumn(
            f"approx_distinct_{c}",
            F.hll_sketch_estimate(F.col(f"{c}_hll")),
        ).drop(f"{c}_hll")
    return out
