"""Incremental watermark control table (SURVEY.md §2.4 M1, §3.1, §7
phase 2 — the one layer Catalyst doesn't give us).

Reference: ``etl_control`` Delta table keyed by ``job_name`` holding
``last_loaded_ts / last_success_ts / last_status``
(``migrations/000_create_control_tables.py:11-16``), upserted by every
job with the never-regress coalesce MERGE
(``src/bronze/trips_oltp_to_bronze.py:62-94``): a FAIL writes status with
a NULL timestamp, and ``coalesce(s.last_loaded_ts, t.last_loaded_ts)``
keeps the old watermark so the next run re-reads the failed slice.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import (
    ConcurrentWriteError,
    MergeTable,
)

EPOCH = dt.datetime(1970, 1, 1)

#: Optimistic-concurrency retries for control-row upserts. Contention is
#: per-control-table (a handful of jobs), so collisions are rare and a
#: retry re-reads the new head — bounded so a livelock can't hang a job.
_UPSERT_ATTEMPTS = 8


def _merge_with_retry(table: MergeTable, **kwargs) -> None:
    for attempt in range(_UPSERT_ATTEMPTS):
        try:
            table.merge(**kwargs)
            return
        except ConcurrentWriteError:
            if attempt == _UPSERT_ATTEMPTS - 1:
                raise

CONTROL_SCHEMA = (
    "job_name string, last_loaded_ts timestamp, "
    "last_success_ts timestamp, last_status string"
)


class ControlTable:
    """Per-job watermark store with M1 never-regress semantics."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.table = MergeTable(spark, path)

    def _ensure(self) -> None:
        if not self.table.exists():
            self.table.create(self.spark.createDataFrame([], CONTROL_SCHEMA))

    def read_watermark(self, job_name: str) -> dt.datetime:
        """Last loaded ts for a job, EPOCH when unknown (reference
        ``read_last_loaded_ts``, ``bronze/trips:46-59``)."""
        self._ensure()
        row = (
            self.table.read()
            .filter(F.col("job_name") == job_name)
            .select("last_loaded_ts")
            .first()
        )
        return row[0] if row and row[0] is not None else EPOCH

    def upsert(
        self, job_name: str, loaded_ts: dt.datetime | None, status: str
    ) -> None:
        """M1 watermark upsert with ``coalesce(s.ts, t.ts)`` semantics so
        a FAIL (NULL ts) never regresses the watermark
        (``bronze/trips:62-94``) — the reference's 1-row MERGE, executed
        as ``MergeTable.merge`` on ``job_name``. Routing through the
        transaction log makes concurrent upserts from different jobs
        safe: a losing racer gets ``ConcurrentWriteError`` at commit and
        retries against the new head, so both control rows survive
        (VERDICT r3 item 5; tested two-threaded in
        test_watermark_gdpr_retention.py)."""
        self._ensure()
        now = dt.datetime.utcnow()
        src = self.spark.createDataFrame(
            [(job_name, loaded_ts, now if status == "OK" else None, status)],
            CONTROL_SCHEMA,
        )
        _merge_with_retry(
            self.table,
            source=src,
            keys=["job_name"],
            update_set={
                "last_loaded_ts": F.coalesce(
                    F.col("s.last_loaded_ts"), F.col("t.last_loaded_ts")
                ),
                "last_success_ts": F.coalesce(
                    F.col("s.last_success_ts"), F.col("t.last_success_ts")
                ),
                "last_status": F.col("s.last_status"),
            },
            insert=True,
        )


def incremental_slice(
    df: DataFrame,
    watermark: dt.datetime,
    ts_col: str,
    partition_date_col: str | None = None,
) -> DataFrame:
    """P1+P2 incremental read: coarse partition-prune predicate on the
    partition date, then the fine watermark filter (reference
    ``silver/trips:121-130``). Both predicates push down to the scan;
    the coarse one prunes whole ``load_date`` partitions at the file
    listing level — the reason Bronze is partitioned by day."""
    out = df
    if partition_date_col:
        out = out.filter(
            F.col(partition_date_col) >= F.lit(watermark.date().isoformat()).cast("date")
        )
    return out.filter(F.col(ts_col) > F.lit(watermark))


def target_max_watermark(
    table: MergeTable, ts_col: str
) -> dt.datetime:
    """Target-derived watermark: max(ts) of the target itself — the
    self-describing pattern Gold uses instead of the control table
    (reference ``fact_trips.py:43-56``)."""
    if not table.exists():
        return EPOCH
    row = table.read().agg(F.max(ts_col)).first()
    return row[0] if row and row[0] is not None else EPOCH


CURSOR_SCHEMA = "job_name string, last_version long, last_status string"


class VersionCursor:
    """Log-position control: per-job last consumed ``MergeTable``
    version — the change-feed twin of :class:`ControlTable` (offsets
    instead of timestamps, like a streaming checkpoint). Pairs with
    ``MergeTable.read_changes``: a consumer reads exactly the rows
    committed after its cursor, with no timestamp column and no coarse
    partition-prune predicate needed at all.

    Same MERGE-on-``job_name`` upsert strategy and M1 never-regress
    semantics as ControlTable: a FAIL (NULL version) keeps the old
    cursor so the next run re-reads the failed slice."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.table = MergeTable(spark, path)

    def _ensure(self) -> None:
        if not self.table.exists():
            self.table.create(self.spark.createDataFrame([], CURSOR_SCHEMA))

    def read_version(self, job_name: str) -> int:
        self._ensure()
        row = (
            self.table.read()
            .filter(F.col("job_name") == job_name)
            .select("last_version")
            .first()
        )
        return int(row[0]) if row and row[0] is not None else 0

    def upsert(
        self, job_name: str, version: int | None, status: str
    ) -> None:
        """Never-regress cursor upsert: kept = max(prev, new), NULL new
        keeps prev — as a ``MergeTable.merge`` with optimistic-
        concurrency retry, like :meth:`ControlTable.upsert`."""
        self._ensure()
        src = self.spark.createDataFrame(
            [(job_name, version, status)], CURSOR_SCHEMA
        )
        s_ver, t_ver = F.col("s.last_version"), F.col("t.last_version")
        _merge_with_retry(
            self.table,
            source=src,
            keys=["job_name"],
            update_set={
                "last_version": F.greatest(
                    F.coalesce(s_ver, t_ver), F.coalesce(t_ver, s_ver)
                ),
                "last_status": F.col("s.last_status"),
            },
            insert=True,
        )
