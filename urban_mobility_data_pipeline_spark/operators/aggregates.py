"""Recompute-affected incremental aggregation engine (SURVEY.md §2.3
J3-J4 + §2.5 A1-A2 + §2.4 M6, §7 phase 4).

The reference's late-data strategy: instead of streaming state, find the
grain keys touched by the new fact slice, re-aggregate *all* rows for
those keys, and MERGE by grain key (``agg_trips_daily.py:83-190``,
``agg_driver_daily.py:141-282``). Late arrivals are safe because
affected grains are always fully recomputed.

``agg_trips_daily`` / ``agg_driver_daily`` are two configs of this one
operator (grain=date_key vs grain=(date, driver)).

Scale: the affected-key set is tiny relative to the fact, so it is
broadcast — the fact table never reshuffles; the re-aggregation reads
only partitions containing affected keys when the fact is partitioned by
the grain date.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable


def recompute_affected(
    fact: DataFrame,
    fact_increment: DataFrame,
    grain: Sequence[str],
    measures: Mapping[str, Column],
) -> DataFrame:
    """J3/J4 + A1/A2: distinct affected grain keys from the increment,
    broadcast-inner-join the full fact to slice it, full re-aggregate."""
    affected = fact_increment.select(*grain).distinct()
    sliced = fact.join(F.broadcast(affected), list(grain), "inner")
    return sliced.groupBy(*grain).agg(
        *[expr.alias(name) for name, expr in measures.items()]
    )


def upsert_aggregate(
    table: MergeTable,
    recomputed: DataFrame,
    grain: Sequence[str],
    freshness_col: str | None = None,
) -> None:
    """M6 aggregate upsert by grain key; when a freshness column (e.g.
    ``max_raw_loaded_at``) is present, only strictly-fresher recomputes
    overwrite (``agg_trips_daily.py:174-190``)."""
    if not table.exists():
        table.create(recomputed)
        return
    cond = (
        F.col(f"s.{freshness_col}") > F.col(f"t.{freshness_col}")
        if freshness_col
        else None
    )
    non_grain = [c for c in recomputed.columns if c not in grain]
    table.merge(
        recomputed,
        keys=grain,
        update_condition=cond,
        update_set={c: F.col(f"s.{c}") for c in non_grain},
        insert=True,
    )
