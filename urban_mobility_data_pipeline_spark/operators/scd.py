"""SCD historization engines (SURVEY.md §2.4 M2-M5, §7 phase 3).

The reference hand-writes these per table (30 scripts); here each flavor
is one parameterized engine over :class:`~.merge.MergeTable`:

- **SCD1** (`scd1_upsert`): snapshot upsert — newest version wins, no
  history (reference ``fact_trips.py:215-231``,
  ``snapshot/dim_driver.py:187-208``).
- **SCD2** (`scd2_apply`): close-current + insert-new two-phase MERGE
  with the reference's healing property (``silver/trips:347-432``).
- **SCD3** (`scd3_apply`): current + ``prev_*`` columns shifted on
  change (``scd3/dim_passenger.py:240-264``), seeded from 2-deep history
  (``:63-95``).

All engines require a W1-deduplicated source (one row per key per run),
exactly as the reference's jobs guarantee before merging.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.functions.hashing import scd_hash
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable


def _keys_eq(keys: Sequence[str]) -> Column:
    return reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
    )


def with_scd2_columns(
    df: DataFrame, hash_cols: Sequence[str], order_col: str
) -> DataFrame:
    """Attach scd_hash / valid_from / valid_to / is_current to a cleaned
    batch (reference ``silver/trips:283-323``)."""
    return (
        df.withColumn("scd_hash", scd_hash(list(hash_cols)))
        .withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.lit(None).cast(df.schema[order_col].dataType))
        .withColumn("is_current", F.lit(True))
    )


def scd1_upsert(
    table: MergeTable,
    source: DataFrame,
    keys: Sequence[str],
    order_col: str,
    hash_col: str | None = None,
) -> None:
    """M4 SCD1 snapshot upsert: update all non-key columns when the
    source version is strictly newer (``s.order > t.order``) and, when a
    change hash is present, actually different (skip no-op rewrites —
    reference write-amplification guard ``snapshot/dim_driver.py:194-197``);
    insert unseen keys. Late (older) versions never overwrite
    (``fact_trips.py:225-228``)."""
    if not table.exists():
        table.create(source)
        return
    cond = F.col(f"s.{order_col}") > F.col(f"t.{order_col}")
    if hash_col:
        cond = cond & (F.col(f"s.{hash_col}") != F.col(f"t.{hash_col}"))
    non_keys = [c for c in source.columns if c not in keys]
    table.merge(
        source,
        keys=keys,
        update_condition=cond,
        update_set={c: F.col(f"s.{c}") for c in non_keys},
        insert=True,
        evolve_schema=True,  # autoMerge parity (silver/trips:340-345)
    )


def scd2_apply(
    table: MergeTable,
    source: DataFrame,
    keys: Sequence[str],
    order_col: str,
    hash_col: str = "scd_hash",
    fused: bool = True,
) -> None:
    """M2+M3 SCD2 merge, preserving the reference's healing semantics
    (``silver/trips:347-432``):

    Phase 1 (close-current): match ``key AND t.is_current``; when the
    source is newer and the hash differs, set
    ``valid_to = s.valid_from, is_current = false``.

    Phase 2 (insert-new): same match condition; any source row without a
    *current* target row is inserted as the new current version — which
    both adds the new version closed in phase 1 AND resurrects keys left
    current-less by a crash between the two phases (reference comment at
    ``silver/trips:364``).

    ``fused=True`` (default) computes both phases in ONE copy-on-write
    rewrite: a source row inserts iff its key has no current target row
    OR that row is being closed in the same pass — provably the same
    outcome as the sequential merges (pinned by the lifecycle/healing/
    idempotence tests), at half the rewrite cost and atomically (no
    crash window between the commits, SURVEY §7 risk 1). ``fused=False``
    keeps the reference's literal two-commit shape.
    """
    if not table.exists():
        table.create(source)
        return
    is_current_t = F.col("t.is_current") == True  # noqa: E712
    newer_and_changed = (
        F.col(f"s.{order_col}") > F.col(f"t.{order_col}")
    ) & (F.col(f"s.{hash_col}") != F.col(f"t.{hash_col}"))

    if fused:
        closing = F.coalesce(newer_and_changed, F.lit(False))
        table.merge(
            source,
            keys=keys,
            extra_match=is_current_t,
            update_condition=newer_and_changed,
            update_set={
                "valid_to": F.col("s.valid_from"),
                "is_current": F.lit(False),
            },
            insert=True,
            # insert when: no current row matched (new key / healing) —
            # handled by merge() for unmatched source rows — PLUS the
            # matched-and-closing case, via insert_companion below.
            insert_companion_condition=closing,
            evolve_schema=True,  # autoMerge parity (silver/trips:340-345)
        )
        return

    table.merge(  # phase 1: close current on change
        source,
        keys=keys,
        extra_match=is_current_t,
        update_condition=newer_and_changed,
        update_set={
            "valid_to": F.col("s.valid_from"),
            "is_current": F.lit(False),
        },
    )
    table.merge(  # phase 2: insert new current (and heal)
        source,
        keys=keys,
        extra_match=is_current_t,
        insert=True,
        evolve_schema=True,
    )


def scd3_apply(
    table: MergeTable,
    source: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tracked_cols: Sequence[str],
    hash_col: str = "scd_hash",
    prev_prefix: str = "prev_",
) -> None:
    """M5 SCD3 shift-and-update: on change, ``prev_c ← t.c`` and
    ``c ← s.c`` for every tracked column; inserts carry typed-NULL
    ``prev_*`` (reference ``scd3/dim_passenger.py:240-264`` +
    ``add_prev_null_columns:48-60``).

    The initial seed from 2-deep history (J7) is
    ``operators.dedup.current_and_previous``.
    """
    src_cols = list(source.columns)
    with_prev = source.select(
        *src_cols,
        *[
            F.lit(None).cast(source.schema[c].dataType).alias(f"{prev_prefix}{c}")
            for c in tracked_cols
        ],
    )
    if not table.exists():
        table.create(with_prev)
        return
    changed = (
        F.col(f"s.{order_col}") > F.col(f"t.{order_col}")
    ) & (F.col(f"s.{hash_col}") != F.col(f"t.{hash_col}"))
    update_set: dict[str, Column] = {}
    for c in tracked_cols:
        update_set[f"{prev_prefix}{c}"] = F.col(f"t.{c}")
        update_set[c] = F.col(f"s.{c}")
    for c in src_cols:
        if c in keys or c in tracked_cols:
            continue
        update_set[c] = F.col(f"s.{c}")
    table.merge(
        with_prev,
        keys=keys,
        update_condition=changed,
        update_set=update_set,
        insert=True,
        evolve_schema=True,
    )
