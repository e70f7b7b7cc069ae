"""Retention cleanup (SURVEY.md §2.2 P11 + §2.1 S11-S12, §7 phase 5).

Reference jobs: Bronze drops partitions older than N days and VACUUMs
(``retention/bronze_retention_cleanup.py:59-86``); Silver deletes only
*closed* SCD2 history (``is_current = false AND valid_to < now - N``) so
current rows survive indefinitely
(``retention/silver_retention_cleanup.py:79-92``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable


def age_predicate(
    ts_col: str, days: int, now: dt.datetime | None = None
) -> Column:
    """P11 age predicate. ``now`` is injectable for determinism; the
    reference uses ``current_timestamp()``/``current_date()``
    (``retention/bronze:59-67``)."""
    anchor = F.lit(now) if now is not None else F.current_timestamp()
    return F.col(ts_col) < anchor - F.expr(f"INTERVAL {int(days)} DAYS")


def closed_history_predicate(
    days: int,
    now: dt.datetime | None = None,
    valid_to_col: str = "valid_to",
    is_current_col: str = "is_current",
) -> Column:
    """Silver SCD2 retention: only closed versions age out
    (``retention/silver:79-84``)."""
    return (F.col(is_current_col) == False) & age_predicate(  # noqa: E712
        valid_to_col, days, now
    )


def apply_retention(
    table: MergeTable, condition: Column, vacuum: bool = True
) -> None:
    """S11 DELETE + S12 VACUUM (``retention/bronze:81-86``)."""
    table.delete(condition)
    if vacuum:
        table.vacuum()


def apply_age_retention(
    table: MergeTable,
    ts_col: str,
    days: int,
    now: dt.datetime,
    vacuum: bool = True,
) -> dict[str, int]:
    """Age retention through the zone maps: ``delete_older_than``
    dereferences wholly-expired files with ZERO IO and rewrites only
    straddlers — the 100 TB shape (age-clustered data mostly drops
    whole files), vs :func:`apply_retention`'s predicate DELETE which
    must at least scan matching partitions. ``now`` is explicit: the
    cutoff must be a zone-map-orderable literal, not
    ``current_timestamp()``. Returns the per-file-disposition counts
    from :meth:`MergeTable.delete_older_than`."""
    cutoff = now - dt.timedelta(days=int(days))
    counts = table.delete_older_than(ts_col, cutoff)
    if vacuum:
        table.vacuum()
    return counts
