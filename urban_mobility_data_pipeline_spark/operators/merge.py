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

Incremental cost (the 100 TB property): like Delta's dynamic file
pruning, ``merge``/``delete`` only read and rewrite the *partitions the
source (or predicate) touches* when the physical layout allows it:

- tables partitioned by a column that is part of the merge keys (bronze
  ``load_date``) prune to the source's distinct partition values;
- for merges keyed on non-partition business keys (silver/gold dims),
  ``bucket_keys`` at ``create`` adds a hidden ``__kb =
  pmod(xxhash64(keys), N)`` hive partition, so an SCD upsert of B rows
  rewrites at most ``min(N, B)`` buckets, never the whole history.

The layout is recorded in a ``_graft_table_meta.json`` sidecar (the
underscore prefix makes Spark's file listing ignore it, like
``_SUCCESS``) — the moral equivalent of Delta's table metadata.

MERGE contract (mirrors Delta):

- match on equi-keys plus an optional extra condition over ``t``/``s``
  aliases (the reference uses ``t.key = s.key AND t.is_current = true``);
- at most one source row may match one target row (the reference
  guarantees this by W1-deduplicating the source first);
- ``when_matched_update(condition, set)`` / ``when_not_matched_insert``.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid
from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

META_FILE = "_graft_table_meta.json"
BUCKET_COL = "__kb"
#: beyond this many touched partitions a pruned rewrite stops paying for
#: itself (driver-side value list + per-dir swaps) — fall back to one
#: full rewrite, which is what Delta's MERGE does past its DFP threshold.
MAX_PRUNED_PARTITIONS = 4096


class MergeTable:
    """A path-addressed Parquet table supporting create / merge / update /
    delete with overwrite-swap durability.

    ``bucket_keys``/``num_buckets`` apply at ``create`` time: the table is
    hive-partitioned by a hidden ``__kb`` key-hash bucket so later merges
    on those keys rewrite only touched buckets. Once a table exists its
    persisted metadata wins; the constructor args are only a creation
    spec.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        bucket_keys: Sequence[str] = (),
        num_buckets: int = 32,
    ):
        self.spark = spark
        self.path = path
        self.bucket_keys = list(bucket_keys)
        self.num_buckets = num_buckets

    # -- layout metadata ----------------------------------------------------
    def _local_path(self) -> str:
        return self.path.removeprefix("file://")

    def _write_meta(self, meta: Mapping[str, object]) -> None:
        tmp = os.path.join(self._local_path(), f".{META_FILE}.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self._local_path(), META_FILE))

    def _meta(self) -> dict:
        """Table layout: sidecar if present, else inferred from the hive
        directory structure (covers tables written by plain Spark jobs
        without going through ``create``)."""
        p = os.path.join(self._local_path(), META_FILE)
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
        return {
            "partition_by": self._infer_partition_cols(),
            "bucket_keys": [],
            "num_buckets": 0,
        }

    def _infer_partition_cols(self) -> list[str]:
        """Walk the directory tree collecting ``col=value`` levels."""
        cols: list[str] = []
        cur = self._local_path()
        while os.path.isdir(cur):
            subdirs = [
                d
                for d in os.listdir(cur)
                if "=" in d and os.path.isdir(os.path.join(cur, d))
            ]
            if not subdirs:
                break
            name = subdirs[0].split("=", 1)[0]
            if any(d.split("=", 1)[0] != name for d in subdirs):
                break
            cols.append(name)
            cur = os.path.join(cur, subdirs[0])
        return cols

    def _bucket_expr(self, meta: Mapping[str, object]) -> Column:
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in meta["bucket_keys"]]),
            F.lit(meta["num_buckets"]),
        ).cast("int")

    # -- existence / IO ----------------------------------------------------
    def exists(self) -> bool:
        """S4 existence probe (reference ``DeltaTable.isDeltaTable``,
        ``src/bronze/trips_oltp_to_bronze.py:32``).

        Checks the filesystem directly when the path is local (avoids a
        JVM AnalysisException + stack-trace log per probe); falls back to
        a schema read for remote filesystems."""
        if "://" not in self.path or self.path.startswith("file://"):
            local = self._local_path()
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

    def read(
        self, merge_schema: bool = False, include_internal: bool = False
    ) -> DataFrame:
        """``merge_schema=True`` unions the schemas of all files — needed
        on append tables whose writers evolved the schema over time
        (bronze). Delta gets this from the transaction log; plain parquet
        pays a footer-merge pass, so it's opt-in.

        The hidden ``__kb`` bucket column is dropped unless
        ``include_internal=True`` (mutation paths need it to preserve the
        physical layout)."""
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        try:
            df = reader.parquet(self.path)
        except Exception:
            # a delete-all leaves a partitioned table with zero data
            # files (dynamic partitioning writes nothing for an empty
            # frame) — recover the schema from the sidecar, like Delta
            # serves an empty snapshot from its log
            schema_json = self._meta().get("schema")
            if not schema_json:
                raise
            from pyspark.sql.types import StructType

            df = self.spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema_json))
            )
        if not include_internal and BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        return df

    def create(self, df: DataFrame, partition_by: Sequence[str] = ()) -> None:
        """S6 first-run create (``silver/trips:326-332``)."""
        meta = {
            "partition_by": list(partition_by),
            "bucket_keys": [],
            "num_buckets": 0,
        }
        if self.bucket_keys and not partition_by:
            df = df.withColumn(
                BUCKET_COL,
                F.pmod(
                    F.xxhash64(*[F.col(k) for k in self.bucket_keys]),
                    F.lit(self.num_buckets),
                ).cast("int"),
            )
            meta = {
                "partition_by": [BUCKET_COL],
                "bucket_keys": self.bucket_keys,
                "num_buckets": self.num_buckets,
            }
        meta["schema"] = df.schema.json()
        w = df.write.mode("overwrite")
        if meta["partition_by"]:
            w = w.partitionBy(*meta["partition_by"])
        w.parquet(self.path)
        self._write_meta(meta)

    def append(self, df: DataFrame, partition_by: Sequence[str] = ()) -> None:
        """S5/S7 append sink (``bronze/trips:146-153``)."""
        meta = self._meta() if self.exists() else None
        if meta and meta["bucket_keys"] and BUCKET_COL not in df.columns:
            df = df.withColumn(BUCKET_COL, self._bucket_expr(meta))
        pcols = list(partition_by) or (meta["partition_by"] if meta else [])
        w = df.write.mode("append")
        if pcols:
            w = w.partitionBy(*pcols)
        w.parquet(self.path)
        if meta is None:
            self._write_meta(
                {
                    "partition_by": pcols,
                    "bucket_keys": [],
                    "num_buckets": 0,
                    "schema": df.schema.json(),
                }
            )

    def replace(self, df: DataFrame) -> None:
        """Atomic full overwrite: stage + swap, never an in-place
        ``mode("overwrite")`` on the live directory (a crash mid-write
        must not lose the previous version — the control table relies on
        this)."""
        if not self.exists():
            self.create(df)
            return
        self._rewrite(df)

    def _rewrite(
        self, df: DataFrame, partition_by: Sequence[str] | None = None
    ) -> None:
        """Copy-on-write full rewrite: stage to a sibling dir, swap, drop
        old. Preserves the table's hive/bucket partition layout
        (``partition_by=None`` → read it from the sidecar).

        Delta equivalent: one transactional commit. Single-writer only —
        documented deviation (SURVEY.md §7 phase 0)."""
        meta = self._meta()
        meta["schema"] = df.schema.json()
        pcols = list(partition_by) if partition_by is not None else meta["partition_by"]
        staging = f"{self.path}__stage_{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if pcols:
            w = w.partitionBy(*pcols)
        w.parquet(staging)
        backup = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(self.path, backup)
        os.rename(staging, self.path)
        shutil.rmtree(backup)
        self._write_meta(meta)

    def _leaf_partition_dirs(self, base: str, depth: int) -> list[str]:
        """Relative ``col=val[/col2=val2...]`` paths at partition depth."""
        if depth == 0:
            return []
        out: list[str] = []

        def walk(cur: str, rel: str, d: int) -> None:
            for entry in os.listdir(cur):
                full = os.path.join(cur, entry)
                if "=" not in entry or not os.path.isdir(full):
                    continue
                nxt = os.path.join(rel, entry) if rel else entry
                if d == 1:
                    out.append(nxt)
                else:
                    walk(full, nxt, d - 1)

        walk(base, "", depth)
        return out

    def _swap_partitions(self, staging: str, pcols: Sequence[str]) -> None:
        """Move only the partition dirs present in ``staging`` into the
        live table; everything else is untouched (bytes, mtimes, file
        identity). Crash window: the per-dir renames are not one atomic
        commit — same exposure as Hive dynamic-partition overwrite;
        Delta's transaction log is what this emulation trades away."""
        live = self._local_path()
        backups: list[str] = []
        for rel in self._leaf_partition_dirs(staging, len(pcols)):
            dst = os.path.join(live, rel)
            parent = os.path.dirname(dst)
            if parent != live:
                os.makedirs(parent, exist_ok=True)
            if os.path.exists(dst):
                bak = f"{dst}__old_{uuid.uuid4().hex[:8]}"
                os.rename(dst, bak)
                backups.append(bak)
            os.rename(os.path.join(staging, rel), dst)
        for bak in backups:
            shutil.rmtree(bak)
        shutil.rmtree(staging)

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

        Incremental cost: when the table's partition columns (hive cols
        or the ``__kb`` key-hash bucket) are derivable from the merge
        keys — and no update/insert expression reassigns them — only the
        partitions holding the source's key values are read, joined, and
        rewritten (Delta dynamic file pruning analogue). A one-day batch
        into a years-deep ``load_date``-partitioned table costs O(batch),
        not O(table).
        """
        meta = self._meta()
        pcols: list[str] = list(meta["partition_by"])
        bucketed = bool(meta["bucket_keys"]) and pcols == [BUCKET_COL]
        # the source only gets a bucket column when the bucket keys are
        # part of the merge keys (a merge on other columns — e.g. a GDPR
        # scrub by trip_id on a rating_id-bucketed table — can't place
        # source rows in buckets and takes the full-rewrite path, where
        # bucket membership is recomputed from the merged result)
        if bucketed and set(meta["bucket_keys"]) <= set(keys):
            source = source.withColumn(BUCKET_COL, self._bucket_expr(meta))

        assigned = set((update_set or {}).keys()) | set(
            (insert_values or {}).keys()
        )
        if bucketed:
            prunable = BUCKET_COL in source.columns and not (
                assigned & ({BUCKET_COL} | set(meta["bucket_keys"]))
            )
        else:
            prunable = bool(pcols) and set(pcols) <= set(keys) and not (
                assigned & set(pcols)
            )

        t_marker, s_marker = "__t_present", "__s_present"
        raw_target = self.read(include_internal=True)
        if evolve_schema and prunable:
            # adding a column must touch every file — plain parquet has
            # no transaction log to reconcile per-partition schemas
            prunable = not [
                f for f in source.schema.fields
                if f.name not in raw_target.columns
            ]

        part_vals: list[tuple] = []
        if prunable:
            part_vals = [
                tuple(r)
                for r in source.select(*pcols)
                .distinct()
                .limit(MAX_PRUNED_PARTITIONS + 1)
                .collect()
            ]
            if len(part_vals) > MAX_PRUNED_PARTITIONS or any(
                v is None for t in part_vals for v in t
            ):
                # NULL partition values land in Hive's default-partition
                # dir — not worth special-casing; full rewrite is correct.
                prunable = False

        if prunable:
            if len(pcols) == 1:
                pred = F.col(pcols[0]).isin([t[0] for t in part_vals])
            else:
                pred = reduce(
                    lambda a, b: a | b,
                    [
                        reduce(
                            lambda a, b: a & b,
                            [F.col(c) == F.lit(v) for c, v in zip(pcols, t)],
                        )
                        for t in part_vals
                    ],
                )
            raw_target = raw_target.filter(pred)

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

        if prunable:
            staging = f"{self.path}__stage_{uuid.uuid4().hex[:8]}"
            result.write.mode("overwrite").partitionBy(*pcols).parquet(staging)
            self._swap_partitions(staging, pcols)
            return
        if bucketed:
            # an update may have reassigned a bucket-key column (that is
            # why this path isn't prunable) — recompute bucket membership
            result = result.withColumn(BUCKET_COL, self._bucket_expr(meta))
        self._rewrite(result, pcols)

    def update(
        self, set_map: Mapping[str, Column], condition: Column
    ) -> None:
        """Delta UPDATE-where (used by GDPR flag-consistency passes)."""
        meta = self._meta()
        df = self.read(include_internal=True)
        cond = F.coalesce(condition, F.lit(False))
        out = df.withColumns(
            {
                c: F.when(cond, v).otherwise(F.col(c))
                for c, v in set_map.items()
            }
        )
        if meta["bucket_keys"] and set(set_map) & set(meta["bucket_keys"]):
            out = out.withColumn(BUCKET_COL, self._bucket_expr(meta))
        self._rewrite(out)

    def delete(self, condition: Column) -> None:
        """S11 retention DELETE (reference
        ``retention/bronze_retention_cleanup.py:81-82``)."""
        self._rewrite(
            self.read(include_internal=True).filter(
                ~F.coalesce(condition, F.lit(False))
            )
        )

    def vacuum(self) -> None:
        """S12 VACUUM (``retention/bronze:84-86``). The rewrite strategy
        leaves no stale files, so this is a documented no-op; under Delta
        it would call ``DeltaTable.vacuum``."""
        return None

    def compact(self, target_partitions: int | None = None) -> None:
        """Small-file compaction (Delta OPTIMIZE analogue). Streaming
        foreachBatch appends and per-batch bronze appends accumulate
        small files; periodic compaction keeps scan task counts sane at
        100 TB. Without an explicit target, aims for ~1 output file per 8
        current data files (file count from a listing, not an RDD
        materialization — planning stays no-cost)."""
        df = self.read(include_internal=True)
        if target_partitions is not None:
            df = df.coalesce(max(1, target_partitions))
        else:
            n_files = len(
                glob.glob(
                    os.path.join(self._local_path(), "**", "*.parquet"),
                    recursive=True,
                )
            )
            df = df.coalesce(max(1, n_files // 8))
        self._rewrite(df)
