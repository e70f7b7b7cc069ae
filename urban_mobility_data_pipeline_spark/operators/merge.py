"""MERGE-capable managed table on Parquet (SURVEY.md §2.4, §7 fallback).

The reference runs on Delta Lake and drives everything through
``DeltaTable.merge`` (e.g. ``src/bronze/trips_oltp_to_bronze.py:79-94``).
delta-spark is unavailable in this environment, so ``MergeTable``
implements the same MERGE semantics as a read → join → rewrite (staging
dir + atomic swap), which is exactly Delta's copy-on-write physical plan
minus the transaction log. Semantics are identical for a single writer;
the docstrings note where Delta would add optimistic concurrency. On a
real deployment, swap the I/O layer for Delta and every operator above
this module is unchanged.

MERGE contract (mirrors Delta):

- match on equi-keys plus an optional extra condition over ``t``/``s``
  aliases (the reference uses ``t.key = s.key AND t.is_current = true``);
- at most one source row may match one target row (the reference
  guarantees this by W1-deduplicating the source first);
- ``when_matched_update(condition, set)`` / ``when_not_matched_insert``.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class MergeTable:
    """A path-addressed Parquet table supporting create / merge / update /
    delete with overwrite-swap durability."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- existence / IO ----------------------------------------------------
    def exists(self) -> bool:
        """S4 existence probe (reference ``DeltaTable.isDeltaTable``,
        ``src/bronze/trips_oltp_to_bronze.py:32``).

        Checks the filesystem directly when the path is local (avoids a
        JVM AnalysisException + stack-trace log per probe); falls back to
        a schema read for remote filesystems."""
        import glob

        if "://" not in self.path or self.path.startswith("file://"):
            local = self.path.removeprefix("file://")
            if not os.path.isdir(local):
                return False
            return bool(
                glob.glob(os.path.join(local, "**", "*.parquet"), recursive=True)
            ) or bool(glob.glob(os.path.join(local, "_SUCCESS")))
        try:
            self.spark.read.parquet(self.path).schema
            return True
        except Exception:
            return False

    def read(self, merge_schema: bool = False) -> DataFrame:
        """``merge_schema=True`` unions the schemas of all files — needed
        on append tables whose writers evolved the schema over time
        (bronze). Delta gets this from the transaction log; plain parquet
        pays a footer-merge pass, so it's opt-in."""
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(self.path)

    def create(self, df: DataFrame, partition_by: Sequence[str] = ()) -> None:
        """S6 first-run create (``silver/trips:326-332``)."""
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path)

    def append(self, df: DataFrame, partition_by: Sequence[str] = ()) -> None:
        """S5/S7 append sink (``bronze/trips:146-153``)."""
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path)

    def _rewrite(self, df: DataFrame) -> None:
        """Copy-on-write rewrite: stage to a sibling dir, swap, drop old.

        Delta equivalent: one transactional commit. Single-writer only —
        documented deviation (SURVEY.md §7 phase 0)."""
        staging = f"{self.path}__stage_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(staging)
        backup = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(self.path, backup)
        os.rename(staging, self.path)
        shutil.rmtree(backup)

    # -- mutations ----------------------------------------------------------
    def merge(
        self,
        source: DataFrame,
        keys: Sequence[str],
        extra_match: Column | None = None,
        update_condition: Column | None = None,
        update_set: Mapping[str, Column] | None = None,
        insert: bool = False,
        insert_values: Mapping[str, Column] | None = None,
        insert_companion_condition: Column | None = None,
        evolve_schema: bool = False,
    ) -> None:
        """Delta-style MERGE (reference S8/M1-M10 surface).

        ``extra_match``/``update_condition``/``update_set``/
        ``insert_values`` may reference columns as ``F.col("t.x")`` /
        ``F.col("s.x")``.

        ``insert_companion_condition``: for MATCHED rows satisfying it,
        additionally emit the source row as an insert (next to the
        updated target row) — the fused-SCD2 primitive that Delta needs
        two sequential MERGE commits for.

        ``evolve_schema``: source columns absent from the target are
        appended to the table (NULL for pre-existing rows) — the
        reference's ``spark.databricks.delta.schema.autoMerge.enabled``
        behavior (``silver/trips:340-345``, SURVEY §1.2). Off by default,
        like Delta: silent widening should be a per-call decision.
        """
        t_marker, s_marker = "__t_present", "__s_present"
        raw_target = self.read()
        t_cols = [c for c in raw_target.columns]
        if evolve_schema:
            new_cols = [
                f for f in source.schema.fields if f.name not in t_cols
            ]
            if new_cols:
                raw_target = raw_target.select(
                    "*",
                    *[
                        F.lit(None).cast(f.dataType).alias(f.name)
                        for f in new_cols
                    ],
                )
                t_cols = list(raw_target.columns)
        target = raw_target.withColumn(t_marker, F.lit(True)).alias("t")
        src = source.withColumn(s_marker, F.lit(True)).alias("s")
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
        )
        if extra_match is not None:
            cond = cond & extra_match

        joined = target.join(src, cond, "full_outer")
        t_matched = F.col(t_marker).isNotNull()
        matched = t_matched & F.col(s_marker).isNotNull()

        do_update = matched
        if update_condition is not None:
            do_update = do_update & F.coalesce(update_condition, F.lit(False))

        def insert_expr(c: str) -> Column:
            if insert_values and c in insert_values:
                return insert_values[c]
            return F.col(f"s.{c}") if c in source.columns else F.lit(None)

        out_cols = []
        for c in t_cols:
            keep = F.col(f"t.{c}")
            val = keep
            if update_set and c in update_set:
                val = F.when(do_update, update_set[c]).otherwise(keep)
            if insert:
                val = F.when(
                    ~t_matched & F.col(s_marker).isNotNull(), insert_expr(c)
                ).otherwise(val)
            out_cols.append(val.alias(c))

        keep_row = t_matched | (F.col(s_marker).isNotNull() & F.lit(insert))
        result = joined.filter(keep_row).select(*out_cols)
        if insert_companion_condition is not None:
            companions = joined.filter(
                matched & F.coalesce(insert_companion_condition, F.lit(False))
            ).select(*[insert_expr(c).alias(c) for c in t_cols])
            result = result.unionByName(companions)
        self._rewrite(result)

    def update(
        self, set_map: Mapping[str, Column], condition: Column
    ) -> None:
        """Delta UPDATE-where (used by GDPR flag-consistency passes)."""
        df = self.read()
        cond = F.coalesce(condition, F.lit(False))
        self._rewrite(
            df.withColumns(
                {
                    c: F.when(cond, v).otherwise(F.col(c))
                    for c, v in set_map.items()
                }
            )
        )

    def delete(self, condition: Column) -> None:
        """S11 retention DELETE (reference
        ``retention/bronze_retention_cleanup.py:81-82``)."""
        self._rewrite(self.read().filter(~F.coalesce(condition, F.lit(False))))

    def vacuum(self) -> None:
        """S12 VACUUM (``retention/bronze:84-86``). The rewrite strategy
        leaves no stale files, so this is a documented no-op; under Delta
        it would call ``DeltaTable.vacuum``."""
        return None

    def compact(self, target_partitions: int | None = None) -> None:
        """Small-file compaction (Delta OPTIMIZE analogue). Streaming
        foreachBatch appends and per-batch bronze appends accumulate
        small files; periodic compaction keeps scan task counts sane at
        100 TB. ``target_partitions`` defaults to AQE's advisory size by
        letting coalesce pick 1 file per current partition worth of
        data."""
        df = self.read()
        if target_partitions is not None:
            df = df.coalesce(max(1, target_partitions))
        else:
            df = df.coalesce(max(1, df.rdd.getNumPartitions() // 8))
        self._rewrite(df)
