"""MERGE-capable managed table on Parquet with a manifest transaction
log (SURVEY.md §2.4, §7 fallback).

The reference runs on Delta Lake and drives everything through
``DeltaTable.merge`` (e.g. ``src/bronze/trips_oltp_to_bronze.py:79-94``).
delta-spark is unavailable in this environment, so ``MergeTable``
implements the same storage contract natively on parquet:

- **Manifest log.** Every table version is a JSON manifest in
  ``<table>/_graft_log/<n>.json`` listing the data files of that
  snapshot plus layout (partition columns, key-hash bucketing) and
  schema. A commit writes the next-numbered manifest via hard-link
  publication (``os.link`` fails if the name exists), so commits are
  **atomic and totally ordered** — the moral core of Delta's
  ``_delta_log``.
- **Snapshot isolation / copy-on-write.** Mutations write *new* files
  and flip the manifest; files of the previous version are untouched on
  disk until ``vacuum``. Readers pinned to a version never see a
  half-applied mutation (the old ``_swap_partitions`` per-directory
  rename crash window is gone).
- **Dynamic file pruning.** ``merge``/``update``/``delete`` rewrite only
  the partitions the source or predicate touches when the layout allows
  it: hive partition columns that are part of the merge keys (bronze
  ``load_date``), or the hidden ``__kb = pmod(xxhash64(keys), N)``
  bucket added by ``bucket_keys`` at ``create`` — an SCD upsert of B
  rows rewrites at most ``min(N, B)`` buckets, never the whole history.
  Untouched files are not read, not rewritten, not even renamed.
- **Time travel & audit.** ``read(version=n)``, ``history()``,
  ``restore(n)`` — parquet-native equivalents of Delta's
  ``versionAsOf`` / ``DESCRIBE HISTORY`` / ``RESTORE``.
- **VACUUM (S12).** Physically deletes files no manifest inside the
  retention window references (reference
  ``retention/bronze_retention_cleanup.py:84-86``). Like Delta, a GDPR
  anonymize/delete is only *logically* complete at commit; ``vacuum``
  is what removes the PII bytes from disk.
- **Concurrent-writer detection.** A lost commit race raises
  ``ConcurrentWriteError``; blind appends retry against the new head
  (they commute), conflicting mutations surface to the caller —
  single-log optimistic concurrency, same model as Delta, scoped to a
  shared POSIX filesystem.
- **File-skipping sidecars.** Per-file min/max zone maps
  (``analyze``/``read_between``/``delete_older_than``) and per-file
  bloom filters (``build_blooms``/``read_by_keys``/``delete_by_keys``)
  — range scans and point lookups skip files before Spark lists any
  parquet; both incremental, both vacuumed with the data.
- **CHECK constraints** (``add_constraint``) enforced INSIDE every
  write job via ``observe()`` — violations abort before the staged
  files publish. **Shallow clone** (``clone``) hard-links a snapshot
  as a new table in O(files). **Row-level diff** (``diff``) tags
  insert/delete between versions reading only non-shared files.
  **OPTIMIZE** (``compact``: bin-pack / sort / multi-column Z-ORDER),
  **VACUUM DRY RUN**, and atomic **partition-layout evolution**
  (``repartition_table``).

Directories written by plain Spark jobs (no log) are still readable and
are adopted into the log on their first mutation. On a real deployment,
swap this I/O layer for Delta and every operator above this module is
unchanged.

Schema evolution (``autoMerge`` parity, SURVEY §1.2) is log-cheap: the
manifest schema is the source of truth and readers apply it explicitly,
so files from before a column was added simply read NULL for it — no
footer-merge pass, no rewrite of old partitions.

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
import time
import uuid
from collections.abc import Mapping, Sequence
from functools import reduce
from urllib.parse import unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

META_FILE = "_graft_table_meta.json"
LOG_DIR = "_graft_log"
BUCKET_COL = "__kb"
#: beyond this many touched partitions a pruned rewrite stops paying for
#: itself (driver-side value list + manifest bookkeeping) — fall back to
#: one full rewrite, which is what Delta's MERGE does past its DFP
#: threshold.
MAX_PRUNED_PARTITIONS = 4096
#: partition-column types whose hive directory encoding round-trips
#: through ``str(python_value)`` — the set for which a pruned DELETE can
#: map predicate values to existing directories without a Spark write.
_PRUNABLE_DELETE_TYPES = {
    # Catalyst simpleString() names — NOT the python-side class names
    # ("int"/"bigint"/"smallint"/"tinyint" are what StructField
    # reports; the long-form aliases are kept for schemas written by
    # hand)
    "string", "int", "bigint", "smallint", "tinyint", "date",
    "integer", "long", "short", "byte",
}


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the version this transaction targeted."""


class ConstraintViolationError(RuntimeError):
    """A write produced rows failing a CHECK constraint; nothing was
    committed."""


class MergeTable:
    """A path-addressed parquet table with a manifest transaction log
    supporting create / append / merge / update / delete / vacuum /
    time travel.

    ``bucket_keys``/``num_buckets`` apply at ``create`` time: the table
    is hive-partitioned by a hidden ``__kb`` key-hash bucket so later
    merges on those keys rewrite only touched buckets. Once a table
    exists its persisted metadata wins; the constructor args are only a
    creation spec.
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

    # -- log ---------------------------------------------------------------
    def _local_path(self) -> str:
        return self.path.removeprefix("file://")

    def _log_dir(self) -> str:
        return os.path.join(self._local_path(), LOG_DIR)

    def _versions(self) -> list[int]:
        d = self._log_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[:-5])
            for f in os.listdir(d)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._log_dir(), f"{version:08d}.json")

    def _data_files(self) -> list[str]:
        """Relative paths of all parquet files under the table dir,
        excluding internal (``_``-prefixed) directories."""
        local = self._local_path()
        out: list[str] = []
        for dirpath, dirs, files in os.walk(local):
            # prune internal dirs (_graft_log, _staged-*) but NOT hive
            # partition dirs, whose names contain '=' — the hidden
            # bucket column's dirs are underscore-prefixed (__kb=7)
            dirs[:] = [
                d
                for d in dirs
                if "=" in d or not d.startswith(("_", "."))
            ]
            for f in files:
                if f.endswith(".parquet"):
                    out.append(
                        os.path.relpath(os.path.join(dirpath, f), local)
                    )
        return out

    def _adopted_manifest(self) -> dict:
        """Snapshot of an unlogged directory (plain Spark writer or a
        pre-log table): file listing + sidecar/inferred layout. Never
        committed by readers; the first mutation commits it as v1."""
        meta_path = os.path.join(self._local_path(), META_FILE)
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        else:
            meta = {
                "partition_by": self._infer_partition_cols(),
                "bucket_keys": [],
                "num_buckets": 0,
            }
        return {
            "op": "adopt",
            "files": self._data_files(),
            "partition_by": meta.get("partition_by", []),
            "bucket_keys": meta.get("bucket_keys", []),
            "num_buckets": meta.get("num_buckets", 0),
            "schema": meta.get("schema"),
            "ts": time.time(),
        }

    def _load(self, version: int | None = None) -> tuple[dict, int]:
        """(manifest, version). Version 0 = adopted/unlogged snapshot."""
        versions = self._versions()
        if not versions:
            if version is not None:
                raise ValueError(f"table at {self.path} has no version log")
            return self._adopted_manifest(), 0
        v = versions[-1] if version is None else version
        if v not in versions:
            raise ValueError(
                f"version {v} not in log (have {versions[0]}..{versions[-1]})"
            )
        with open(self._manifest_path(v)) as f:
            return json.load(f), v

    def _commit(self, manifest: dict, parent: int) -> int:
        """Atomically publish ``manifest`` as version ``parent+1``.
        Hard-link publication: ``os.link`` onto an existing name raises,
        so exactly one of two racing writers wins the version."""
        os.makedirs(self._log_dir(), exist_ok=True)
        manifest.setdefault("ts", time.time())
        # operationMetrics: rows written by the staging job that fed
        # this commit (observed during the write itself — no extra
        # count). Metadata-only commits carry none.
        rows = getattr(self, "_last_write_rows", None)
        if rows is not None:
            manifest.setdefault("metrics", {"written_rows": rows})
            self._last_write_rows = None
        tmp = os.path.join(self._log_dir(), f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        target = self._manifest_path(parent + 1)
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise ConcurrentWriteError(
                f"version {parent + 1} of {self.path} was committed by "
                "another writer"
            ) from None
        finally:
            os.unlink(tmp)
        return parent + 1

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

    # -- data-file IO ------------------------------------------------------
    def _write_files(
        self, df: DataFrame, pcols: Sequence[str]
    ) -> tuple[list[str], set[str]]:
        """Write ``df`` into the table directory as *new uniquely named
        files* (staged under ``_staged-*`` then moved — same filesystem,
        so the moves are metadata-only) and return (relative file paths,
        leaf partition dirs). Nothing is visible to readers until the
        manifest referencing these files commits."""
        local = self._local_path()
        os.makedirs(local, exist_ok=True)
        stage_name = f"_staged-{uuid.uuid4().hex[:8]}"
        staging = os.path.join(self.path, stage_name)
        staging_local = os.path.join(local, stage_name)
        # CHECK constraints ride the write job itself via observe() —
        # no second validation pass over the data. A violation aborts
        # BEFORE the staged files are published, so the table never
        # holds a bad row (write-then-verify-then-commit, which is the
        # only ordering that stays atomic on a 1000-executor write).
        cons = self.constraints()
        from pyspark.sql import Observation

        # one observation rides every write job: the row count (free
        # operationMetrics for the commit log) plus one violation
        # counter per CHECK constraint
        obs = Observation()
        metrics = [F.count(F.lit(1)).alias("__written_rows")]
        metrics += [
            F.count(
                F.when(
                    ~F.coalesce(F.expr(e).cast("boolean"), F.lit(True)),
                    1,
                )
            ).alias(n)
            for n, e in cons.items()
        ]
        df = df.observe(obs, *metrics)
        w = df.write.mode("overwrite")
        if pcols:
            w = w.partitionBy(*pcols)
        w.parquet(staging)
        observed = obs.get
        self._last_write_rows = int(observed.pop("__written_rows", 0))
        bad = {n: v for n, v in observed.items() if v}
        if bad:
            shutil.rmtree(staging_local, ignore_errors=True)
            raise ConstraintViolationError(
                f"CHECK constraint(s) violated, write aborted: "
                + ", ".join(
                    f"{n} ({v} rows, expr: {cons[n]!r})"
                    for n, v in bad.items()
                )
            )
        rels: list[str] = []
        leafs: set[str] = set()
        for dirpath, _dirs, files in os.walk(staging_local):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fn), staging_local)
                dst = os.path.join(local, rel)
                os.makedirs(os.path.dirname(dst) or local, exist_ok=True)
                os.rename(os.path.join(dirpath, fn), dst)
                rels.append(rel)
                parent = os.path.dirname(rel)
                if parent:
                    leafs.add(parent)
        shutil.rmtree(staging_local)
        return rels, leafs

    def _read_snapshot(
        self, manifest: Mapping[str, object], include_internal: bool = False
    ) -> DataFrame:
        files = manifest["files"]
        schema_json = manifest.get("schema")
        if not files:
            if not schema_json:
                raise FileNotFoundError(
                    f"empty table at {self.path} with no recorded schema"
                )
            df = self.spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema_json))
            )
        else:
            reader = self.spark.read.option("basePath", self.path)
            if schema_json:
                # manifest schema is authoritative: files written before
                # a column was added read NULL for it (log-side schema
                # evolution — no footer merge, no old-file rewrite)
                reader = reader.schema(
                    StructType.fromJson(json.loads(schema_json))
                )
            df = reader.parquet(
                *[os.path.join(self.path, f) for f in files]
            )
            ents = self._dvs_for(manifest, files)
            if ents:
                # merge-on-read: subtract deletion-vector positions.
                # Broadcast is safe by construction — purge_deletes
                # materializes DVs long before they rival table size.
                dv = self._read_dv_rows(ents)
                df = (
                    self._with_pos(df)
                    .join(
                        F.broadcast(dv),
                        (F.col("__dv_file") == dv["file"])
                        & (F.col("__dv_pos") == dv["pos"]),
                        "left_anti",
                    )
                    .drop("__dv_file", "__dv_pos")
                )
        if not include_internal and BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        return df

    @staticmethod
    def _merge_schemas(old_json: str | None, new: StructType) -> str:
        """Union of field sets, old field order first (append-table
        widening; type conflicts are a caller error)."""
        if not old_json:
            return new.json()
        old = StructType.fromJson(json.loads(old_json))
        by_name = {f.name: f for f in old.fields}
        merged = list(old.fields)
        for f in new.fields:
            prev = by_name.get(f.name)
            if prev is None:
                merged.append(f)
            elif (
                prev.dataType.simpleString() != f.dataType.simpleString()
            ):
                # nullability differences are fine (simpleString ignores
                # them); true type conflicts are a caller error
                raise ValueError(
                    f"schema conflict on '{f.name}': "
                    f"{prev.dataType} vs {f.dataType}"
                )
        return StructType(merged).json()

    # -- existence / IO ----------------------------------------------------
    def exists(self) -> bool:
        """S4 existence probe (reference ``DeltaTable.isDeltaTable``,
        ``src/bronze/trips_oltp_to_bronze.py:32``). A committed log is
        authoritative; otherwise fall back to a filesystem data probe
        (plain-Spark-written directories)."""
        if self._versions():
            return True
        if "://" not in self.path or self.path.startswith("file://"):
            local = self._local_path()
            if not os.path.isdir(local):
                return False
            return bool(self._data_files()) or bool(
                glob.glob(os.path.join(local, "_SUCCESS"))
            )
        try:
            self.spark.read.parquet(self.path).schema
            return True
        except Exception:
            return False

    def read(
        self,
        merge_schema: bool = False,
        include_internal: bool = False,
        version: int | None = None,
    ) -> DataFrame:
        """Snapshot read. ``version`` pins a historic snapshot (Delta
        ``versionAsOf``); files must not have been vacuumed yet.

        ``merge_schema`` is honored for unlogged directories (footer
        merge); logged tables always read with the manifest schema,
        which subsumes it.

        The hidden ``__kb`` bucket column is dropped unless
        ``include_internal=True`` (mutation paths need it to preserve
        the physical layout)."""
        manifest, v = self._load(version)
        if v == 0 and manifest["files"]:
            # unlogged directory: plain Spark read (schema inference /
            # optional footer merge), exactly what a non-managed job
            # would see
            reader = self.spark.read
            if merge_schema:
                reader = reader.option("mergeSchema", "true")
            df = reader.parquet(self.path)
            if not include_internal and BUCKET_COL in df.columns:
                df = df.drop(BUCKET_COL)
            return df
        return self._read_snapshot(manifest, include_internal)

    def snapshot_readable(self, since_version: int) -> bool:
        """True when every data file referenced by any manifest at or
        after ``since_version`` is still on disk — i.e. time travel
        AND the change feed back to ``since_version`` will not hit
        vacuumed files. Physical VACUUM (including a GDPR erase's
        purge) drops files older manifests still reference; a
        maintenance job whose cursor predates the purge must detect
        that BEFORE its delta fold and fall back to a full rebuild
        instead of crashing mid-plan (found by the r12 quality-
        lifecycle soak: erase→vacuum→next ingest's index refresh read
        a vacuumed before-image). Metadata-class: manifest JSON reads
        plus one ``isfile`` per referenced file."""
        local = self._local_path()
        seen: set[str] = set()
        for v in self._versions():
            if v < since_version:
                continue
            m, _ = self._load(v)
            for f in m["files"]:
                if f in seen:
                    continue
                seen.add(f)
                if not os.path.isfile(os.path.join(local, f)):
                    return False
        return True

    def detail(self) -> dict:
        """Table facts (Delta ``DESCRIBE DETAIL``): current version,
        file count, on-disk bytes of the live snapshot, layout."""
        manifest, v = self._load()
        local = self._local_path()
        size = 0
        for f in manifest["files"]:
            try:
                size += os.path.getsize(os.path.join(local, f))
            except OSError:
                pass
        live_dvs = self._dvs_for(manifest, manifest["files"])
        return {
            "version": v,
            "num_files": len(manifest["files"]),
            "size_bytes": size,
            "partition_by": list(manifest["partition_by"]),
            "bucket_keys": list(manifest["bucket_keys"]),
            "num_buckets": manifest["num_buckets"],
            "num_dv_files": len(live_dvs),
            "dv_rows": sum(e["rows"] for e in live_dvs),
        }

    def last_write_rows(self) -> int:
        """Rows written by the most recent data commit, from the
        commit log's operationMetrics (observed during the write job
        itself — reading this never triggers a scan or a count). 0 if
        the head commit was metadata-only or predates the metric."""
        m, _ = self._load()
        return int((m.get("metrics") or {}).get("written_rows", 0))

    def history(self) -> list[dict]:
        """Commit log, newest first (Delta ``DESCRIBE HISTORY``)."""
        out = []
        for v in reversed(self._versions()):
            m, _ = self._load(v)
            out.append(
                {
                    "version": v,
                    "op": m.get("op"),
                    "ts": m.get("ts"),
                    "n_files": len(m["files"]),
                    "metrics": m.get("metrics") or {},
                }
            )
        return out

    def read_changes(self, since_version: int) -> DataFrame:
        """Rows in files added after ``since_version`` (Delta
        ``readChangeFeed``/``startingVersion`` analogue, driven by the
        manifest diff).

        For append-only tables (bronze) this is exactly the rows
        appended since that version — an incremental source with no
        timestamp watermark and no re-scan of old partitions. For
        tables that rewrite (merge/update), added files also re-emit
        the untouched rows of rewritten partitions, so callers must
        dedup by key downstream; true row-level CDC needs Delta's row
        tracking."""
        head, v = self._load()
        if since_version > v:
            raise ValueError(f"version {since_version} is ahead of head {v}")
        old_files: set[str] = (
            set() if since_version == 0
            else set(self._load(since_version)[0]["files"])
        )
        new_files = sorted(set(head["files"]) - old_files)
        return self._read_snapshot({**head, "files": new_files})

    def read_removed(self, since_version: int) -> DataFrame:
        """Rows of files DEREFERENCED after ``since_version`` — the
        complement of :meth:`read_changes`. A delete/update/compaction
        rewrites or drops files; their rows (the BEFORE images) appear
        here. An incremental consumer that must see deletions (e.g.
        delta view maintenance subtracting erased docs) unions the ids
        of both feeds: add-only diffs alone cannot represent a DELETE.
        Untouched rows of rewritten files are re-emitted on this side
        too (mirroring read_changes), so consumers diff before/after
        images rather than trusting either feed's row set. Requires the
        old files to not have been vacuumed yet."""
        head, v = self._load()
        if since_version > v:
            raise ValueError(f"version {since_version} is ahead of head {v}")
        old_manifest, _ = self._load(since_version)
        removed = sorted(set(old_manifest["files"]) - set(head["files"]))
        out = self._read_snapshot({**old_manifest, "files": removed})
        # rows deleted by NEW deletion vectors on files that still
        # exist — precise row-level delete images (no re-emission):
        # scan only the covered files, subtract positions already
        # deleted at since_version, keep positions in the new DVs
        old_paths = {e["path"] for e in old_manifest.get("dvs") or []}
        old_set = set(old_manifest["files"])
        new_ents = [
            e
            for e in head.get("dvs") or []
            if e["path"] not in old_paths and old_set & set(e["files"])
        ]
        if new_ents:
            covered = sorted(
                {f for e in new_ents for f in e["files"] if f in old_set}
            )
            raw = self._with_pos(
                self._read_snapshot(
                    {**old_manifest, "files": covered, "dvs": []}
                )
            )
            prior = self._dvs_for(old_manifest, covered)
            if prior:
                old_dv = self._read_dv_rows(prior)
                raw = raw.join(
                    F.broadcast(old_dv),
                    (F.col("__dv_file") == old_dv["file"])
                    & (F.col("__dv_pos") == old_dv["pos"]),
                    "left_anti",
                )
            new_dv = self._read_dv_rows(new_ents)
            images = raw.join(
                F.broadcast(new_dv),
                (F.col("__dv_file") == new_dv["file"])
                & (F.col("__dv_pos") == new_dv["pos"]),
                "left_semi",
            ).drop("__dv_file", "__dv_pos")
            out = out.unionByName(images)
        return out

    def diff(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level diff between two snapshots: rows tagged
        ``__change`` = 'insert' / 'delete' (an update is a
        delete+insert pair — Delta CDF's update_preimage/postimage
        without the pairing). File-level pruned: files SHARED by both
        manifests cannot contribute a diff and are never read, so a
        small bucket-pruned merge diffs only its rewritten buckets;
        rows merely MOVED by a rewrite (compaction, partition rewrite
        re-emission) appear identically on both sides and cancel in
        the exceptAll. Schema evolution is handled by NULL-filling
        either side up to the union of columns."""
        manifest_to, head = self._load(to_version)
        manifest_from, _ = self._load(from_version)
        shared = set(manifest_from["files"]) & set(manifest_to["files"])
        # a file present in both snapshots still diffs if its DELETION
        # VECTORS changed between them (a MOR delete adds no files) —
        # pull those files back into the compared sets
        from_dv = {e["path"] for e in manifest_from.get("dvs") or []}
        to_dv = {e["path"] for e in manifest_to.get("dvs") or []}
        dv_changed = from_dv ^ to_dv
        for m in (manifest_from, manifest_to):
            for e in m.get("dvs") or []:
                if e["path"] in dv_changed:
                    shared -= set(e["files"])
        old_only = [f for f in manifest_from["files"] if f not in shared]
        new_only = [f for f in manifest_to["files"] if f not in shared]
        old_df = self._read_snapshot({**manifest_from, "files": old_only})
        new_df = self._read_snapshot({**manifest_to, "files": new_only})
        all_cols = list(
            dict.fromkeys(old_df.columns + new_df.columns)
        )
        def align(df: DataFrame) -> DataFrame:
            return df.select(
                *[
                    F.col(c) if c in df.columns
                    else F.lit(None).alias(c)
                    for c in all_cols
                ]
            )
        old_df, new_df = align(old_df), align(new_df)
        inserts = new_df.exceptAll(old_df).withColumn(
            "__change", F.lit("insert")
        )
        deletes = old_df.exceptAll(new_df).withColumn(
            "__change", F.lit("delete")
        )
        return inserts.unionByName(deletes)

    def restore(self, version: int) -> None:
        """Roll the table back to ``version`` by committing its file
        list as the new head (Delta ``RESTORE``). Fails if the files
        were vacuumed."""
        manifest, v = self._load(version)
        head, parent = self._load()
        local = self._local_path()
        missing = [
            f
            for f in manifest["files"]
            if not os.path.isfile(os.path.join(local, f))
        ] + [
            e["path"]
            for e in self._dvs_for(manifest, manifest["files"])
            if not os.path.isdir(
                os.path.join(self._dv_local_dir(), e["path"])
            )
        ]
        if missing:
            raise FileNotFoundError(
                f"cannot restore version {version}: {len(missing)} files "
                f"vacuumed (first: {missing[0]})"
            )
        restored = {k: v for k, v in manifest.items() if k != "ts"}
        restored["op"] = "restore"
        self._commit(restored, parent)

    def create(self, df: DataFrame, partition_by: Sequence[str] = ()) -> None:
        """S6 first-run create (``silver/trips:326-332``)."""
        pcols = list(partition_by)
        bucket_keys: list[str] = []
        num_buckets = 0
        if self.bucket_keys and not partition_by:
            df = df.withColumn(
                BUCKET_COL,
                F.pmod(
                    F.xxhash64(*[F.col(k) for k in self.bucket_keys]),
                    F.lit(self.num_buckets),
                ).cast("int"),
            )
            pcols = [BUCKET_COL]
            bucket_keys = self.bucket_keys
            num_buckets = self.num_buckets
        schema_json = df.schema.json()
        files, _ = self._write_files(df, pcols)
        versions = self._versions()
        parent = versions[-1] if versions else 0
        self._commit(
            {
                "op": "create",
                "files": files,
                "partition_by": pcols,
                "bucket_keys": bucket_keys,
                "num_buckets": num_buckets,
                "schema": schema_json,
            },
            parent,
        )

    def append(
        self,
        df: DataFrame,
        partition_by: Sequence[str] = (),
        txn_app_id: str | None = None,
        txn_version: int | None = None,
        _retries: int = 5,
    ) -> None:
        """S5/S7 append sink (``bronze/trips:146-153``). Appends commute,
        so a lost commit race is retried against the new head rather
        than surfaced.

        ``txn_app_id``/``txn_version`` make the append idempotent
        (Delta's ``txnAppId``/``txnVersion``): the manifest carries the
        highest committed version per app id, and an append at or below
        it is skipped — so a replayed streaming ``foreachBatch`` (pass
        the checkpoint's ``batch_id``) commits exactly once even when a
        crash lands between the sink write and the checkpoint advance."""
        if (txn_app_id is None) != (txn_version is None):
            raise ValueError("txn_app_id and txn_version go together")
        if not self.exists():
            self.create(df, partition_by)
            if txn_app_id is not None:
                # record the txn as a no-data marker commit on top of
                # the create, so a replay of this first batch is skipped
                manifest, parent = self._load()
                marker = {
                    k: v for k, v in manifest.items() if k != "ts"
                }
                marker["op"] = "txn"
                marker["txn"] = {txn_app_id: int(txn_version)}
                self._commit(marker, parent)
            return
        manifest, parent = self._load()
        if txn_app_id is not None:
            seen = (manifest.get("txn") or {}).get(txn_app_id)
            if seen is not None and int(txn_version) <= int(seen):
                return  # replayed batch — already committed
        if parent == 0 and manifest["files"] and not manifest.get("schema"):
            # adopting a plain-Spark directory: pin its current schema so
            # the manifest read doesn't narrow old files to this batch's
            # columns
            manifest["schema"] = self.read(merge_schema=True).schema.json()
        if manifest["bucket_keys"] and BUCKET_COL not in df.columns:
            df = df.withColumn(BUCKET_COL, self._bucket_expr(manifest))
        pcols = list(partition_by) or list(manifest["partition_by"])
        new_files, _ = self._write_files(df, pcols)
        schema_json = self._merge_schemas(manifest.get("schema"), df.schema)
        for attempt in range(_retries):
            txn = dict(manifest.get("txn") or {})
            if txn_app_id is not None:
                seen = txn.get(txn_app_id)
                if seen is not None and int(txn_version) <= int(seen):
                    # lost a race to a writer that committed this very
                    # batch — the rows are in; our staged files are
                    # orphans for vacuum
                    return
                txn[txn_app_id] = int(txn_version)
            try:
                self._commit(
                    {
                        "op": "append",
                        "files": list(manifest["files"]) + new_files,
                        "partition_by": pcols,
                        "bucket_keys": manifest["bucket_keys"],
                        "num_buckets": manifest["num_buckets"],
                        "schema": schema_json,
                        "txn": txn,
                        "dvs": list(manifest.get("dvs") or []),
                    },
                    parent,
                )
                return
            except ConcurrentWriteError:
                if attempt == _retries - 1:
                    raise
                manifest, parent = self._load()
                schema_json = self._merge_schemas(
                    manifest.get("schema"), df.schema
                )

    def replace(self, df: DataFrame) -> None:
        """Atomic full overwrite (new files + manifest flip; the
        previous snapshot stays readable via time travel until vacuum —
        the control table relies on a crash never losing the last
        committed version)."""
        if not self.exists():
            self.create(df)
            return
        manifest, _ = self._load()
        if manifest["bucket_keys"] and BUCKET_COL not in df.columns:
            df = df.withColumn(BUCKET_COL, self._bucket_expr(manifest))
        self._commit_rewrite(df, op="replace")

    def _commit_rewrite(
        self,
        df: DataFrame,
        pcols: Sequence[str] | None = None,
        op: str = "replace",
    ) -> None:
        """Full copy-on-write: write all rows as new files, flip the
        manifest. Old files await vacuum."""
        manifest, parent = self._load()
        cols = list(pcols) if pcols is not None else list(
            manifest["partition_by"]
        )
        files, _ = self._write_files(df, cols)
        self._commit(
            {
                "op": op,
                "files": files,
                "partition_by": cols,
                "bucket_keys": manifest["bucket_keys"],
                "num_buckets": manifest["num_buckets"],
                "schema": df.schema.json(),
                "txn": manifest.get("txn") or {},
            },
            parent,
        )

    def _commit_pruned(
        self,
        result: DataFrame,
        manifest: dict,
        parent: int,
        replaced_leafs: set[str],
        op: str,
        schema_json: str | None = None,
    ) -> None:
        """Commit ``result`` as the new content of ``replaced_leafs``
        partition dirs: old files under them are dereferenced, files of
        every other partition carry over untouched (not read, not
        renamed — file-level pruning)."""
        pcols = list(manifest["partition_by"])
        new_files, new_leafs = self._write_files(result, pcols)
        drop = {os.path.join(d, "") for d in replaced_leafs | new_leafs}
        kept = [
            f
            for f in manifest["files"]
            if not any(f.startswith(d) for d in drop)
        ]
        self._commit(
            {
                "op": op,
                "files": kept + new_files,
                "partition_by": pcols,
                "bucket_keys": manifest["bucket_keys"],
                "num_buckets": manifest["num_buckets"],
                "schema": schema_json or manifest.get("schema"),
                "txn": manifest.get("txn") or {},
                # DVs covering a kept file stay live (rewritten files
                # were read DV-applied, so their entries go inert)
                "dvs": self._dvs_for(manifest, kept),
            },
            parent,
        )

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
        behavior (``silver/trips:340-345``, SURVEY §1.2). Off by
        default, like Delta: silent widening should be a per-call
        decision. Widening is manifest-side, so it composes with
        pruning: untouched old files are simply read with the new
        schema (NULL column) from then on.

        Incremental cost: when the table's partition columns (hive cols
        or the ``__kb`` key-hash bucket) are derivable from the merge
        keys — and no update/insert expression reassigns them — only
        the partitions holding the source's key values are read,
        joined, and rewritten (Delta dynamic file pruning analogue). A
        one-day batch into a years-deep ``load_date``-partitioned table
        costs O(batch), not O(table).
        """
        manifest, parent = self._load()
        pcols: list[str] = list(manifest["partition_by"])
        bucketed = bool(manifest["bucket_keys"]) and pcols == [BUCKET_COL]
        # the source only gets a bucket column when the bucket keys are
        # part of the merge keys (a merge on other columns — e.g. a GDPR
        # scrub by trip_id on a rating_id-bucketed table — can't place
        # source rows in buckets and takes the full-rewrite path, where
        # bucket membership is recomputed from the merged result)
        if bucketed and set(manifest["bucket_keys"]) <= set(keys):
            source = source.withColumn(BUCKET_COL, self._bucket_expr(manifest))

        assigned = set((update_set or {}).keys()) | set(
            (insert_values or {}).keys()
        )
        if bucketed:
            prunable = BUCKET_COL in source.columns and not (
                assigned & ({BUCKET_COL} | set(manifest["bucket_keys"]))
            )
        else:
            prunable = bool(pcols) and set(pcols) <= set(keys) and not (
                assigned & set(pcols)
            )
        # an unlogged directory has no file list to prune against —
        # adopt it with one full rewrite, pruned from the next commit on
        prunable = prunable and parent > 0

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

        raw_target = (
            self._read_snapshot(manifest, include_internal=True)
            if parent > 0
            else self.read(include_internal=True)
        )
        if prunable:
            raw_target = raw_target.filter(self._vals_pred(pcols, part_vals))

        t_cols = list(raw_target.columns)
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

        t_marker, s_marker = "__t_present", "__s_present"
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
            # a MERGE keeps every target row, so each touched partition
            # that had files re-emits rows — the staged leaf dirs (plus
            # brand-new insert partitions) are exactly the replaced set
            self._commit_pruned(
                result,
                manifest,
                parent,
                set(),
                "merge",
                schema_json=result.schema.json(),
            )
            return
        if bucketed:
            # an update may have reassigned a bucket-key column (that is
            # why this path isn't prunable) — recompute bucket membership
            result = result.withColumn(BUCKET_COL, self._bucket_expr(manifest))
        self._commit_rewrite(result, pcols, op="merge")

    @staticmethod
    def _vals_pred(pcols: Sequence[str], part_vals: list[tuple]) -> Column:
        if len(pcols) == 1:
            return F.col(pcols[0]).isin([t[0] for t in part_vals])
        return reduce(
            lambda a, b: a | b,
            [
                reduce(
                    lambda a, b: a & b,
                    [F.col(c) == F.lit(v) for c, v in zip(pcols, t)],
                )
                for t in part_vals
            ],
        )

    def _dirs_for_vals(
        self, manifest: Mapping[str, object], part_vals: list[tuple]
    ) -> set[str] | None:
        """Leaf partition dirs of the current manifest whose decoded
        values match ``part_vals``, or None when the column types don't
        round-trip through ``str`` (caller falls back to full rewrite).
        Used by DELETE, where a fully-emptied partition writes no staged
        dir yet its old files must still be dereferenced."""
        pcols = list(manifest["partition_by"])
        pfields = {}
        if manifest.get("schema"):
            schema = StructType.fromJson(json.loads(manifest["schema"]))
            pfields = {f.name: f.dataType.simpleString() for f in schema.fields}
        if any(pfields.get(c) not in _PRUNABLE_DELETE_TYPES for c in pcols):
            return None
        wanted = {tuple(str(v) for v in t) for t in part_vals}
        out: set[str] = set()
        for f in manifest["files"]:
            leaf = os.path.dirname(f)
            if not leaf:
                return None
            parts = leaf.split(os.sep)
            if len(parts) != len(pcols):
                return None
            vals = tuple(unquote(p.split("=", 1)[1]) for p in parts)
            if vals in wanted:
                out.add(leaf)
        return out

    def update(
        self, set_map: Mapping[str, Column], condition: Column
    ) -> None:
        """Delta UPDATE-where (used by GDPR flag-consistency passes).
        Partition-pruned: only partitions containing matching rows are
        rewritten, unless the update reassigns a partition/bucket
        column (rows could move partitions)."""
        manifest, parent = self._load()
        pcols = list(manifest["partition_by"])
        df = (
            self._read_snapshot(manifest, include_internal=True)
            if parent > 0
            else self.read(include_internal=True)
        )
        cond = F.coalesce(condition, F.lit(False))

        def apply(frame: DataFrame) -> DataFrame:
            return frame.withColumns(
                {
                    c: F.when(cond, v).otherwise(F.col(c))
                    for c, v in set_map.items()
                }
            )

        moving = set(set_map) & (
            set(pcols) | set(manifest["bucket_keys"])
        )
        if pcols and not moving and parent > 0:
            part_vals = [
                tuple(r)
                for r in df.filter(cond)
                .select(*pcols)
                .distinct()
                .limit(MAX_PRUNED_PARTITIONS + 1)
                .collect()
            ]
            if not part_vals:
                return  # nothing matches — zero-cost no-op
            if len(part_vals) <= MAX_PRUNED_PARTITIONS and not any(
                v is None for t in part_vals for v in t
            ):
                sub = df.filter(self._vals_pred(pcols, part_vals))
                self._commit_pruned(
                    apply(sub), manifest, parent, set(), "update"
                )
                return
        out = apply(df)
        if manifest["bucket_keys"] and moving:
            out = out.withColumn(BUCKET_COL, self._bucket_expr(manifest))
        self._commit_rewrite(out, pcols, op="update")

    def delete(self, condition: Column) -> None:
        """S11 retention DELETE (reference
        ``retention/bronze_retention_cleanup.py:81-82``).
        Partition-pruned: only partitions containing matching rows are
        rewritten; a partition whose rows all match is dropped without
        being read twice. Deletion is logical until ``vacuum`` removes
        the bytes — same two-step contract as Delta."""
        manifest, parent = self._load()
        pcols = list(manifest["partition_by"])
        df = (
            self._read_snapshot(manifest, include_internal=True)
            if parent > 0
            else self.read(include_internal=True)
        )
        cond = F.coalesce(condition, F.lit(False))
        if pcols and parent > 0:
            part_vals = [
                tuple(r)
                for r in df.filter(cond)
                .select(*pcols)
                .distinct()
                .limit(MAX_PRUNED_PARTITIONS + 1)
                .collect()
            ]
            if not part_vals:
                return  # nothing matches — zero-cost no-op
            if len(part_vals) <= MAX_PRUNED_PARTITIONS and not any(
                v is None for t in part_vals for v in t
            ):
                replaced = self._dirs_for_vals(manifest, part_vals)
                if replaced is not None:
                    remain = df.filter(
                        self._vals_pred(pcols, part_vals)
                    ).filter(~cond)
                    self._commit_pruned(
                        remain, manifest, parent, replaced, "delete"
                    )
                    return
        self._commit_rewrite(df.filter(~cond), pcols, op="delete")

    # -- zone maps (per-file min/max stats; Delta stats-in-log analogue) --
    STATS_SIDECAR = "_graft_stats.json"

    @staticmethod
    def _norm_stat(v):
        """Normalize a parquet-footer stat (or probe value) to a
        JSON-storable, totally-ordered scalar: numbers pass through,
        strings pass through, timestamps → epoch micros, dates →
        ordinal. Returns None for types zone maps can't order."""
        import datetime as _dt

        if isinstance(v, bool) or v is None:
            return None
        if isinstance(v, (int, float)):
            return v
        if isinstance(v, bytes):
            try:
                return v.decode("utf-8")
            except UnicodeDecodeError:
                return None
        if isinstance(v, str):
            return v
        if isinstance(v, _dt.datetime):
            base = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
            return int((v - base).total_seconds() * 1_000_000)
        if isinstance(v, _dt.date):
            return v.toordinal()
        return None

    def analyze(self, cols: Sequence[str]) -> dict[str, dict]:
        """Collect per-file min/max zone maps for ``cols`` from parquet
        FOOTERS — metadata-only, no data scan — and persist them in a
        sidecar beside the txn log (Delta keeps the same stats inline
        in its log). Data files are immutable, so entries never go
        stale; only files missing from the sidecar are footer-read, so
        re-analyzing after an append touches just the new files. At
        cluster scale the footer reads would fan out as a metadata job;
        the sidecar contract is identical."""
        import pyarrow.parquet as pq

        local = self._local_path()
        sidecar = os.path.join(self._log_dir(), self.STATS_SIDECAR)
        stats: dict[str, dict] = {}
        if os.path.isfile(sidecar):
            with open(sidecar) as f:
                stats = json.load(f)
        manifest, _ = self._load()
        changed = False
        for rel in manifest["files"]:
            have = stats.get(rel, {})
            missing = [c for c in cols if c not in have]
            if not missing:
                continue
            try:
                md = pq.ParquetFile(os.path.join(local, rel)).metadata
            except Exception:
                continue  # unreadable footer ⇒ no stats ⇒ never skipped
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for c in missing:
                idx = names.get(c)
                lo = hi = None
                if idx is not None:
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            lo = hi = None
                            break
                        mn = self._norm_stat(st.min)
                        mx = self._norm_stat(st.max)
                        if mn is None or mx is None:
                            lo = hi = None
                            break
                        lo = mn if lo is None else min(lo, mn)
                        hi = mx if hi is None else max(hi, mx)
                have = {**have, c: [lo, hi]}
                changed = True
            stats[rel] = have
        if changed:
            os.makedirs(self._log_dir(), exist_ok=True)
            tmp = sidecar + ".tmp"
            with open(tmp, "w") as f:
                json.dump(stats, f)
            os.replace(tmp, sidecar)
        return {f: stats[f] for f in manifest["files"] if f in stats}

    def prune_files(
        self, col: str, lo=None, hi=None
    ) -> tuple[list[str], list[str]]:
        """Split the live files into (candidates, skipped) for the
        half-open range ``lo <= col < hi`` using the zone maps. A file
        with no stats for ``col`` is always a candidate (unknown must
        be read); skipping is therefore sound, never lossy."""
        stats = self.analyze([col])
        lo_n = self._norm_stat(lo) if lo is not None else None
        hi_n = self._norm_stat(hi) if hi is not None else None
        manifest, _ = self._load()
        cands, skipped = [], []
        for rel in manifest["files"]:
            mn_mx = stats.get(rel, {}).get(col)
            if not mn_mx or mn_mx[0] is None:
                cands.append(rel)
                continue
            mn, mx = mn_mx
            if (hi_n is not None and mn >= hi_n) or (
                lo_n is not None and mx < lo_n
            ):
                skipped.append(rel)
            else:
                cands.append(rel)
        return cands, skipped

    def read_between(self, col: str, lo=None, hi=None) -> DataFrame:
        """Snapshot read of ``lo <= col < hi`` with FILE-level skipping
        from the zone maps before Spark even lists the parquet — the
        incremental-scan shape (e.g. a watermark slice on an
        unpartitioned timestamp) at 100 TB, where opening every footer
        is itself the bottleneck. The residual predicate still applies
        (zone maps overlap, they don't filter rows)."""
        manifest, _ = self._load()
        cands, _skipped = self.prune_files(col, lo, hi)
        df = self._read_snapshot({**manifest, "files": cands})
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) < F.lit(hi))
        return df

    def delete_older_than(self, col: str, cutoff) -> dict[str, int]:
        """Retention DELETE through the zone maps (``col < cutoff``):

        - files wholly older than the cutoff are DEREFERENCED with zero
          IO (the 100 TB retention shape — age-partitioned data mostly
          drops whole files);
        - files wholly newer carry over untouched (not read, not
          rewritten);
        - only straddling files are read and rewritten.

        Complements :meth:`delete`'s partition pruning when the table
        isn't partitioned on the age column or partitions straddle the
        cutoff. Logical until ``vacuum``, like every delete here.
        Returns ``{"dropped_files": n, "rewritten_files": m,
        "kept_files": k}``."""
        manifest, parent = self._load()
        stats = self.analyze([col])
        cut = self._norm_stat(cutoff)
        if cut is None:
            raise ValueError(f"cutoff {cutoff!r} not zone-map orderable")
        dropped, kept, straddle = [], [], []
        for rel in manifest["files"]:
            mn_mx = stats.get(rel, {}).get(col)
            if not mn_mx or mn_mx[0] is None:
                straddle.append(rel)
            elif mn_mx[1] < cut:
                dropped.append(rel)
            elif mn_mx[0] >= cut:
                kept.append(rel)
            else:
                straddle.append(rel)
        new_files: list[str] = []
        if straddle:
            remain = self._read_snapshot(
                {**manifest, "files": straddle}, include_internal=True
            ).filter(F.col(col) >= F.lit(cutoff))
            new_files, _ = self._write_files(
                remain, list(manifest["partition_by"])
            )
        if dropped or straddle:
            self._commit(
                {
                    "op": "delete",
                    "files": kept + new_files,
                    "partition_by": list(manifest["partition_by"]),
                    "bucket_keys": manifest["bucket_keys"],
                    "num_buckets": manifest["num_buckets"],
                    "schema": manifest.get("schema"),
                    "txn": manifest.get("txn") or {},
                    "dvs": self._dvs_for(manifest, kept),
                },
                parent,
            )
        return {
            "dropped_files": len(dropped),
            "rewritten_files": len(straddle),
            "kept_files": len(kept),
        }

    # -- bloom filters (per-file key membership; point-lookup pruning) -----
    # Zone maps skip files by VALUE RANGE; on a high-cardinality key
    # that is uniformly spread across files (doc_id, user_id) every
    # file's [min,max] straddles every probe and nothing prunes. The
    # bloom sidecar answers the other question — "which files might
    # CONTAIN these exact keys?" — which is the shape of a GDPR erasure
    # or point lookup at 100 TB: a handful of ids against millions of
    # files. Delta/Iceberg keep the same structure as per-file bloom
    # indexes.
    BLOOM_SIDECAR = "_graft_blooms.json"

    @staticmethod
    def _bloom_params(n_rows: int, fpp: float) -> tuple[int, int]:
        """Standard sizing: m bits, k hashes for n keys at target fpp."""
        import math as _math

        n = max(1, n_rows)
        m = int(_math.ceil(-n * _math.log(fpp) / (_math.log(2) ** 2)))
        m = max(64, ((m + 7) // 8) * 8)
        k = max(1, round(m / n * _math.log(2)))
        return m, k

    @staticmethod
    def _bloom_hash_cols(col: str) -> tuple[Column, Column]:
        """The double-hash pair behind every bloom position:
        pos_i = (h1 + i*h2) mod 2^64 mod m (Kirsch-Mitzenmacher). Both
        hashes are JVM xxhash64 over the COLUMN TYPE, so build and
        probe can never drift — probes hash through the same
        expressions via a 1-row Spark job, never a Python re-
        implementation."""
        return (
            F.xxhash64(F.col(col)),
            F.xxhash64(F.lit("graft-bloom-h2"), F.col(col)),
        )

    def _bloom_sidecar_path(self) -> str:
        return os.path.join(self._log_dir(), self.BLOOM_SIDECAR)

    def _load_blooms(self) -> dict[str, dict]:
        p = self._bloom_sidecar_path()
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def _probe_hashes(
        self, col: str, keys: Sequence[object]
    ) -> list[tuple[int, int]]:
        """(h1, h2) for each probe key, computed by Spark itself so the
        hash matches the build side bit-for-bit (xxhash64 output depends
        on the input's Catalyst type). Bounded: |keys| rows."""
        manifest, _ = self._load()
        schema_json = manifest.get("schema")
        if not schema_json:
            raise ValueError("table has no recorded schema")
        schema = StructType.fromJson(json.loads(schema_json))
        field = next((f for f in schema.fields if f.name == col), None)
        if field is None:
            raise ValueError(f"column {col!r} not in table schema")
        probe = self.spark.createDataFrame(
            [(k,) for k in keys], StructType([field])
        )
        h1, h2 = self._bloom_hash_cols(col)
        return [
            (r[0], r[1])
            for r in probe.select(h1, h2).collect()
        ]

    def build_blooms(
        self, col: str | Sequence[str], fpp: float = 0.01
    ) -> dict[str, dict]:
        """Build (or top up) per-file bloom filters for one or more
        columns IN A SINGLE SCAN.

        Data files are immutable, so only files missing a bloom are
        touched — an append then re-build reads just the new files, per
        column. Passing several columns (an index maintaining blooms on
        both its probe key and its erasure key, e.g. the BM25 postings
        table's token + doc_id) reads each file once instead of once
        per column — at 100 TB the bloom build is scan-bound, so this
        halves it. The bitmap for each (file, column) is aggregated
        EXECUTOR-side by a vectorized ``applyInPandas`` kernel (numpy
        packbits over JVM-computed xxhash64 pairs): what crosses the
        wire per file is the packed ``m/8``-byte bitmap per column
        (~1.8 bytes/key at 1% fpp), never the positions (8·k
        bytes/key). The per-file m/k are sized from the parquet footer
        row count, broadcast onto the scan keyed by
        ``_metadata.file_path``. This is one of the documented Pandas
        kernels (SURVEY §2.11): a bitset fold has no Column-algebra
        expression, and per-row UDFs are banned."""
        import base64

        import pyarrow.parquet as pq

        cols = [col] if isinstance(col, str) else list(col)
        local = self._local_path()
        manifest, _ = self._load()
        blooms = self._load_blooms()
        # per-file list of columns still lacking a bloom; a file that
        # already has one column's bloom is NOT rebuilt for it (the
        # existing entry may carry a different fpp the caller chose)
        missing: dict[str, list[str]] = {}
        for rel in manifest["files"]:
            need = [c for c in cols if c not in blooms.get(rel, {})]
            if need:
                missing[rel] = need
        if not missing:
            return {
                f: blooms[f] for f in manifest["files"] if f in blooms
            }
        params: list[tuple[str, int, int]] = []
        for rel in missing:
            try:
                n_rows = pq.ParquetFile(
                    os.path.join(local, rel)
                ).metadata.num_rows
            except Exception:
                continue  # unreadable ⇒ no bloom ⇒ file never skipped
            m, k = self._bloom_params(n_rows, fpp)
            params.append((os.path.join(local, rel), rel, m, k))
        if not params:
            return {
                f: blooms[f] for f in manifest["files"] if f in blooms
            }
        reader = self.spark.read.option("basePath", self.path)
        schema_json = manifest.get("schema")
        if schema_json:
            reader = reader.schema(
                StructType.fromJson(json.loads(schema_json))
            )
        scan = reader.parquet(
            *[os.path.join(self.path, rel) for _uri, rel, _m, _k in params]
        )
        # _metadata.file_path is a Hadoop URI (file:/tmp/... with any
        # number of slashes); normalize to the local absolute path so
        # it joins against the footer-derived params. Per column: the
        # hash pair plus a validity flag — NULL keys must not be
        # bitmapped, and the flag keeps the hashes exact int64 (a
        # nullable hash column would decay to float64 in pandas and
        # corrupt bits past the 53-bit mantissa)
        sel = [
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-zA-Z0-9+.-]+:/+", "/"
            ).alias("file_path")
        ]
        for i, c in enumerate(cols):
            h1, h2 = self._bloom_hash_cols(c)
            nn = F.col(c).isNotNull()
            sel.append(F.when(nn, h1).otherwise(F.lit(0)).alias(f"h1_{i}"))
            sel.append(F.when(nn, h2).otherwise(F.lit(0)).alias(f"h2_{i}"))
            sel.append(nn.alias(f"v_{i}"))
        keyed = scan.select(*sel).join(
            F.broadcast(
                self.spark.createDataFrame(
                    [(u, m, k) for u, _rel, m, k in params],
                    "file_path string, m long, k long",
                )
            ),
            "file_path",
        )
        n_cols = len(cols)

        def pack(pdf):
            import numpy as np
            import pandas as pd

            m = int(pdf["m"].iloc[0])
            k = int(pdf["k"].iloc[0])
            out = []
            for i in range(n_cols):
                valid = pdf[f"v_{i}"].to_numpy(bool)
                u1 = (
                    pdf[f"h1_{i}"].to_numpy(np.int64)[valid].astype(np.uint64)
                )
                u2 = (
                    pdf[f"h2_{i}"].to_numpy(np.int64)[valid].astype(np.uint64)
                )
                bits = np.zeros(m, dtype=bool)
                for j in range(k):
                    pos = (
                        (u1 + np.uint64(j) * u2) % np.uint64(m)
                    ).astype(np.int64)
                    bits[pos] = True
                out.append(
                    {
                        "file_path": pdf["file_path"].iloc[0],
                        "col_idx": i,
                        "m": m,
                        "k": k,
                        "bloom": np.packbits(bits).tobytes(),
                    }
                )
            return pd.DataFrame(out)

        built = keyed.groupBy("file_path").applyInPandas(
            pack,
            "file_path string, col_idx int, m long, k long, bloom binary",
        )
        rel_by_uri = {u: rel for u, rel, _m, _k in params}
        # (uri, col) combos that must end up with a bloom; kernel rows
        # cross them off, the remainder (all-NULL or zero-row files)
        # get an all-zeros bloom — they can never contain a probe key
        pending = {
            (u, c, m, k)
            for u, rel, m, k in params
            for c in missing[rel]
        }
        for row in built.collect():
            rel = rel_by_uri.get(row["file_path"])
            if rel is None:
                continue
            c = cols[row["col_idx"]]
            if c not in missing[rel]:
                continue  # this file already had c's bloom — keep it
            blooms.setdefault(rel, {})[c] = {
                "m": int(row["m"]),
                "k": int(row["k"]),
                "fpp": fpp,
                "b64": base64.b64encode(bytes(row["bloom"])).decode(),
            }
            pending.discard(
                (row["file_path"], c, int(row["m"]), int(row["k"]))
            )
        for u, c, m, k in pending:
            rel = rel_by_uri[u]
            blooms.setdefault(rel, {})[c] = {
                "m": m,
                "k": k,
                "fpp": fpp,
                "b64": base64.b64encode(bytes(m // 8)).decode(),
            }
        os.makedirs(self._log_dir(), exist_ok=True)
        tmp = self._bloom_sidecar_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(blooms, f)
        os.replace(tmp, self._bloom_sidecar_path())
        return {f: blooms[f] for f in manifest["files"] if f in blooms}

    @staticmethod
    def _bloom_might_contain(entry: Mapping, h1: int, h2: int) -> bool:
        import base64

        m, k = entry["m"], entry["k"]
        data = base64.b64decode(entry["b64"])
        u1, u2 = h1 & 0xFFFFFFFFFFFFFFFF, h2 & 0xFFFFFFFFFFFFFFFF
        for i in range(k):
            pos = ((u1 + i * u2) & 0xFFFFFFFFFFFFFFFF) % m
            if not data[pos >> 3] & (0x80 >> (pos & 7)):
                return False
        return True

    @staticmethod
    def _bloom_contains_any(
        entry: Mapping, hashes: Sequence[tuple[int, int]]
    ) -> bool:
        """True if the bloom admits ANY of the probe hash pairs.

        Vectorized over the whole key batch: the bitmap is base64-
        decoded ONCE per (file, column) and all keys' k positions are
        tested with numpy — a mass probe (thousands of erasure keys x
        hundreds of files) was previously one decode per (file, key)
        pair, which made file pruning itself O(files x keys x m/8)
        bytes of decoding and dominated index-refresh time as the
        table accrued files. Bit semantics identical to
        :meth:`_bloom_might_contain` (big-endian bit order, packbits
        layout)."""
        import base64

        import numpy as np

        if not hashes:
            return False
        m, k = entry["m"], entry["k"]
        data = np.frombuffer(
            base64.b64decode(entry["b64"]), dtype=np.uint8
        )
        u1 = np.array([h for h, _ in hashes], dtype=np.int64).astype(
            np.uint64
        )
        u2 = np.array([h for _, h in hashes], dtype=np.int64).astype(
            np.uint64
        )
        alive = np.ones(len(u1), dtype=bool)
        for i in range(k):
            pos = ((u1 + np.uint64(i) * u2) % np.uint64(m)).astype(
                np.int64
            )
            shift = (pos & 7).astype(np.uint8)
            bit = (data[pos >> 3] & (np.uint8(0x80) >> shift)) != 0
            alive &= bit
            if not alive.any():
                return False
        return True

    def has_blooms(self, col: str | Sequence[str]) -> bool:
        """True if the sidecar holds at least one bloom for every
        column in ``col`` — the cheap gate callers use before routing a
        delete through :meth:`delete_by_keys` instead of the
        partition-pruned :meth:`delete`."""
        cols = [col] if isinstance(col, str) else list(col)
        blooms = self._load_blooms()
        return bool(cols) and all(
            any(c in e for e in blooms.values()) for c in cols
        )

    def prune_files_by_keys(
        self, col: str | Sequence[str], keys: Sequence[object]
    ) -> tuple[list[str], list[str]]:
        """Split live files into (candidates, skipped) for an exact-key
        probe ``ANY(col) IN keys`` using the bloom sidecar. With several
        columns (pair tables keyed on both endpoints) a file is skipped
        only when EVERY column's bloom rejects every key. A file without
        a bloom is always a candidate (unknown must be read), and blooms
        have no false negatives — so skipping is sound; false positives
        only cost a redundant read."""
        cols = [col] if isinstance(col, str) else list(col)
        manifest, _ = self._load()
        blooms = self._load_blooms()
        hashes = {
            c: (self._probe_hashes(c, keys) if keys else [])
            for c in cols
        }
        cands, skipped = [], []
        for rel in manifest["files"]:
            entries = blooms.get(rel, {})
            hit = False
            for c in cols:
                entry = entries.get(c)
                if entry is None or self._bloom_contains_any(
                    entry, hashes[c]
                ):
                    hit = True
                    break
            (cands if hit else skipped).append(rel)
        return cands, skipped

    @staticmethod
    def _keys_pred(cols: Sequence[str], keys: Sequence[object]) -> Column:
        pred = None
        for c in cols:
            term = F.col(c).isin(list(keys))
            pred = term if pred is None else (pred | term)
        return pred

    def read_by_keys(
        self, col: str | Sequence[str], keys: Sequence[object]
    ) -> DataFrame:
        """Point lookup ``ANY(col) IN keys`` with bloom file skipping
        before Spark lists any parquet; the residual IN still applies
        (blooms admit false positives, never false negatives)."""
        cols = [col] if isinstance(col, str) else list(col)
        manifest, _ = self._load()
        cands, _skipped = self.prune_files_by_keys(cols, keys)
        df = self._read_snapshot({**manifest, "files": cands})
        return df.filter(self._keys_pred(cols, keys))

    def delete_by_keys(
        self, col: str | Sequence[str], keys: Sequence[object]
    ) -> dict:
        """GDPR-shaped point DELETE through the blooms: only files that
        might contain one of ``keys`` are read and rewritten; every
        bloom-negative file carries over untouched (not read, not
        renamed). Complements the ``__kb`` bucket pruning when the
        table isn't bucketed on ``col``. Logical until ``vacuum``, like
        every delete here. Returns rewrite stats."""
        cols = [col] if isinstance(col, str) else list(col)
        manifest, parent = self._load()
        cands, skipped = self.prune_files_by_keys(cols, keys)
        if not cands:
            return {"rewritten_files": 0, "kept_files": len(skipped)}
        remain = self._read_snapshot(
            {**manifest, "files": cands}, include_internal=True
        ).filter(~F.coalesce(self._keys_pred(cols, keys), F.lit(False)))
        new_files, _ = self._write_files(
            remain, list(manifest["partition_by"])
        )
        self._commit(
            {
                "op": "delete",
                "files": skipped + new_files,
                "partition_by": list(manifest["partition_by"]),
                "bucket_keys": manifest["bucket_keys"],
                "num_buckets": manifest["num_buckets"],
                "schema": manifest.get("schema"),
                "txn": manifest.get("txn") or {},
                "dvs": self._dvs_for(manifest, skipped),
            },
            parent,
        )
        return {
            "rewritten_files": len(cands),
            "kept_files": len(skipped),
        }

    def delete_keys_in(
        self,
        col: str | Sequence[str],
        keys_df: DataFrame,
        collect_limit: int = 10_000,
        mode: str = "cow",
    ) -> dict:
        """Keyed DELETE whose key set is a **DataFrame** — the
        mass-erasure path (a source takedown can carry millions of
        subject ids; a GDPR request tens). Small sets (≤
        ``collect_limit`` distinct keys) route through the pruned
        point-delete machinery: :meth:`delete_by_keys` when the bloom
        sidecar exists (bloom-negative files are neither read nor
        rewritten), else the partition-pruned :meth:`delete`. Larger
        sets NEVER serialize the ids through the driver: the table is
        anti-joined against the key frame and rewritten — pruned to
        the key set's hash buckets when the table is bucketed on
        exactly the probe column (the buckets are computed from the
        key frame alone, ≤ ``num_buckets`` driver-side values, no
        table scan), full-rewrite otherwise. The plan carries a join,
        never a literal IN-list.

        ``mode="mor"`` takes the merge-on-read route instead: matched
        positions go to a deletion vector and NO data file is ever
        rewritten (small sets via :meth:`delete_keys_mor`, large sets
        via a position semi-join against the key frame). This is the
        right mode for maintenance deletes against tables whose files
        the key set merely GRAZES — e.g. an index refresh deleting a
        few thousand keys from token-bucketed postings, where bloom
        false positives compound (P[file positive] ≈ 1-(1-fpp)^|keys|,
        so at 4k keys and 1% fpp EVERY file is a candidate) and the
        CoW path would rewrite the whole table each cycle. Readers pay
        the DV anti-join until :meth:`purge_deletes`.

        ``keys_df`` must have exactly one column whose type matches
        the probe column's (the bucket hash and the join key both
        depend on it). With several probe columns the delete is
        ANY-semantics (a row goes when any probe column matches a
        key), matching :meth:`delete_by_keys`. NULL keys are ignored,
        like ``isin``.
        """
        cols = [col] if isinstance(col, str) else list(col)
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown delete mode {mode!r}")
        if len(keys_df.columns) != 1:
            raise ValueError("keys_df must have exactly one column")
        keys = (
            keys_df.toDF("__probe_key")
            .filter(F.col("__probe_key").isNotNull())
            .distinct()
        )
        sample = keys.limit(collect_limit + 1).collect()
        if len(sample) <= collect_limit:
            vals = [r[0] for r in sample]
            if not vals:
                manifest, _ = self._load()
                return {
                    "path": "noop",
                    "rewritten_files": 0,
                    "kept_files": len(manifest["files"]),
                }
            if mode == "mor":
                return {
                    "path": "bloom-mor",
                    **self.delete_keys_mor(cols, vals),
                }
            if self.has_blooms(cols):
                return {"path": "bloom", **self.delete_by_keys(cols, vals)}
            self.delete(self._keys_pred(cols, vals))
            return {
                "path": "pruned-isin",
                "rewritten_files": -1,
                "kept_files": -1,
            }

        if mode == "mor":
            # mass erasure, merge-on-read: positions of matching rows
            # via a semi-join per probe column (ANY-semantics), a DV
            # sidecar commit, zero rewrites, no driver IN-list
            manifest, parent = self._load()
            raw = self._with_pos(
                self._read_snapshot(
                    {**manifest, "dvs": []}, include_internal=True
                )
            )
            parts = [
                raw.join(keys, raw[c] == keys["__probe_key"], "left_semi")
                for c in cols
            ]
            hit_rows = parts[0]
            for p in parts[1:]:
                hit_rows = hit_rows.unionByName(p)
            hits = hit_rows.select(
                F.col("__dv_file").alias("file"),
                F.col("__dv_pos").alias("pos"),
            ).distinct()
            prior = self._dvs_for(manifest, manifest["files"])
            if prior:
                old = self._read_dv_rows(prior)
                hits = hits.join(F.broadcast(old), ["file", "pos"], "left_anti")
            return {
                "path": "anti-join-mor",
                **self._commit_dv(manifest, parent, hits),
            }

        manifest, parent = self._load()
        pcols = list(manifest["partition_by"])
        bucketed = bool(manifest["bucket_keys"]) and pcols == [BUCKET_COL]

        def survivors(frame: DataFrame) -> DataFrame:
            out = frame
            for c in cols:
                out = out.join(
                    keys, out[c] == keys["__probe_key"], "left_anti"
                )
            return out

        if (
            bucketed
            and parent > 0
            and len(cols) == 1
            and list(manifest["bucket_keys"]) == cols
        ):
            buckets = [
                (r[0],)
                for r in keys.select(
                    F.pmod(
                        F.xxhash64(F.col("__probe_key")),
                        F.lit(manifest["num_buckets"]),
                    )
                    .cast("int")
                    .alias(BUCKET_COL)
                )
                .distinct()
                .collect()
            ]
            replaced = self._dirs_for_vals(manifest, buckets)
            if (
                replaced is not None
                and len(buckets) <= MAX_PRUNED_PARTITIONS
            ):
                sub = self._read_snapshot(
                    manifest, include_internal=True
                ).filter(self._vals_pred(pcols, buckets))
                self._commit_pruned(
                    survivors(sub), manifest, parent, replaced, "delete"
                )
                untouched = len(manifest["files"]) - sum(
                    1
                    for f in manifest["files"]
                    if os.path.dirname(f) in replaced
                )
                return {
                    "path": "bucket-anti-join",
                    "rewritten_files": len(manifest["files"]) - untouched,
                    "kept_files": untouched,
                }
        target = (
            self._read_snapshot(manifest, include_internal=True)
            if parent > 0
            else self.read(include_internal=True)
        )
        self._commit_rewrite(survivors(target), pcols, op="delete")
        return {
            "path": "anti-join",
            "rewritten_files": len(manifest["files"]),
            "kept_files": 0,
        }

    # -- deletion vectors (merge-on-read DELETE; Delta DV analogue) --------
    # Copy-on-write deletes pay a file REWRITE per touched file — the
    # right trade for retention sweeps that drop whole files, the wrong
    # one for a point delete touching 1 row in each of 10k multi-GB
    # files (a GDPR erasure at 100 TB would rewrite terabytes to remove
    # kilobytes). A deletion vector records the deleted ROW POSITIONS
    # in a tiny sidecar parquet instead; the manifest references it and
    # every snapshot read anti-joins the positions back out
    # (``_metadata.row_index`` is stable per file, so positions are a
    # durable row identity). Deletes become O(deleted rows) of IO;
    # reads pay one broadcast anti-join until ``purge_deletes``
    # materializes the DVs into rewritten files (Delta's
    # ``REORG TABLE ... APPLY (PURGE)``). Because every mutation reads
    # through the DV-applied snapshot, rewrites can never resurrect a
    # DV-deleted row; time travel and RESTORE see each version's own
    # ``dvs`` list.

    def _dv_local_dir(self) -> str:
        return os.path.join(self._log_dir(), "dv")

    def _rel_file_col(self) -> Column:
        """Scanned file's path relative to the table root (matches the
        manifest's file-list entries), derived from
        ``_metadata.file_path`` (``file:/abs/path/...``)."""
        return F.substring_index(
            F.col("_metadata.file_path"),
            self._local_path().rstrip("/") + "/",
            -1,
        )

    def _with_pos(self, df: DataFrame) -> DataFrame:
        """Materialize (relative file, row position) as real columns.
        Must be applied directly on a file-scan DataFrame — metadata
        pseudo-columns do not survive joins."""
        return df.withColumn("__dv_file", self._rel_file_col()).withColumn(
            "__dv_pos", F.col("_metadata.row_index")
        )

    @staticmethod
    def _dvs_for(
        manifest: Mapping[str, object], files: Sequence[str]
    ) -> list[dict]:
        """DV entries relevant to ``files`` (entries covering only
        other / dropped files are inert and skipped)."""
        dvs = manifest.get("dvs") or []
        fset = set(files)
        return [e for e in dvs if fset & set(e["files"])]

    def _read_dv_rows(self, entries: Sequence[Mapping]) -> DataFrame:
        return self.spark.read.parquet(
            *[
                os.path.join(self._dv_local_dir(), e["path"])
                for e in entries
            ]
        ).select("file", "pos")

    def _commit_dv(
        self, manifest: dict, parent: int, hits: DataFrame
    ) -> dict:
        """Write ``hits`` (``file``,``pos``) as a new DV sidecar and
        commit a metadata-only version referencing it. Returns delete
        stats; commits nothing when no row matched."""
        name = f"dv-{uuid.uuid4().hex}"
        out_dir = os.path.join(self._dv_local_dir(), name)
        hits.write.parquet(out_dir)
        per_file = (
            self.spark.read.parquet(out_dir)
            .groupBy("file")
            .count()
            .collect()
        )
        if not per_file:
            shutil.rmtree(out_dir, ignore_errors=True)
            return {"deleted_rows": 0, "dv_files": 0, "rewritten_files": 0}
        n_rows = sum(r["count"] for r in per_file)
        entry = {
            "path": name,
            "rows": int(n_rows),
            "files": sorted(r["file"] for r in per_file),
        }
        self._commit(
            {
                "op": "delete-dv",
                "files": list(manifest["files"]),
                "partition_by": list(manifest["partition_by"]),
                "bucket_keys": manifest["bucket_keys"],
                "num_buckets": manifest["num_buckets"],
                "schema": manifest.get("schema"),
                "txn": manifest.get("txn") or {},
                "dvs": list(manifest.get("dvs") or []) + [entry],
                "metrics": {"deleted_rows": int(n_rows)},
            },
            parent,
        )
        return {
            "deleted_rows": int(n_rows),
            "dv_files": 1,
            "covered_files": len(entry["files"]),
            "rewritten_files": 0,
        }

    def _dv_hits(
        self,
        manifest: Mapping[str, object],
        files: Sequence[str],
        condition: Column,
    ) -> DataFrame:
        """(file, pos) of live rows in ``files`` matching
        ``condition`` — existing DV positions are subtracted so a
        re-issued delete never double-counts (and DV sidecars stay
        duplicate-free)."""
        raw = self._with_pos(
            self._read_snapshot(
                {**manifest, "files": list(files), "dvs": []},
                include_internal=True,
            )
        )
        hits = raw.filter(F.coalesce(condition, F.lit(False))).select(
            F.col("__dv_file").alias("file"),
            F.col("__dv_pos").alias("pos"),
        )
        prior = self._dvs_for(manifest, files)
        if prior:
            old = self._read_dv_rows(prior)
            hits = hits.join(F.broadcast(old), ["file", "pos"], "left_anti")
        return hits

    def delete_mor(self, condition: Column) -> dict:
        """Merge-on-read DELETE-where: rows matching ``condition`` are
        recorded in a deletion vector; NO data file is rewritten. One
        scan finds the positions (filter-pushed like any scan); the
        commit is metadata plus a sidecar of (file, pos) pairs. The
        complement of :meth:`delete` — use MOR when matches are sparse
        relative to file size, CoW when whole partitions/files go."""
        manifest, parent = self._load()
        return self._commit_dv(
            manifest,
            parent,
            self._dv_hits(manifest, manifest["files"], condition),
        )

    def delete_keys_mor(
        self, col: str | Sequence[str], keys: Sequence[object]
    ) -> dict:
        """Point DELETE by key through blooms AND deletion vectors —
        the 100 TB GDPR-erasure fast path: bloom-negative files are
        never read (same pruning as :meth:`delete_by_keys`), and the
        bloom-positive files are only SCANNED for positions, never
        rewritten. IO is O(matching files' bytes read) + O(deleted
        rows written); the table's data files are untouched until
        ``purge_deletes``/``compact`` materializes."""
        cols = [col] if isinstance(col, str) else list(col)
        manifest, parent = self._load()
        if self.has_blooms(cols):
            cands, skipped = self.prune_files_by_keys(cols, keys)
        else:
            cands, skipped = list(manifest["files"]), []
        if not cands:
            return {
                "deleted_rows": 0,
                "dv_files": 0,
                "rewritten_files": 0,
                "scanned_files": 0,
                "skipped_files": len(skipped),
            }
        stats = self._commit_dv(
            manifest,
            parent,
            self._dv_hits(manifest, cands, self._keys_pred(cols, keys)),
        )
        return {
            **stats,
            "scanned_files": len(cands),
            "skipped_files": len(skipped),
        }

    def dv_rows(self) -> int:
        """Total deleted-row positions pending materialization (the
        read-overhead gauge operators use to schedule a purge)."""
        manifest, _ = self._load()
        return sum(e["rows"] for e in manifest.get("dvs") or [])

    def purge_deletes(self) -> dict:
        """Materialize pending deletion vectors (Delta ``REORG TABLE
        ... APPLY (PURGE)``): ONLY files carrying DV'd rows are read
        (DV-applied) and rewritten; every clean file carries over
        untouched. Afterwards reads are anti-join-free again and the
        old files + DV sidecars await vacuum."""
        manifest, parent = self._load()
        live = list(manifest["files"])
        ents = self._dvs_for(manifest, live)
        if not ents:
            return {"rewritten_files": 0, "kept_files": len(live)}
        live_set = set(live)
        covered = sorted(
            {f for e in ents for f in e["files"] if f in live_set}
        )
        remain = self._read_snapshot(
            {**manifest, "files": covered}, include_internal=True
        )
        new_files, _ = self._write_files(
            remain, list(manifest["partition_by"])
        )
        covered_set = set(covered)
        kept = [f for f in live if f not in covered_set]
        self._commit(
            {
                "op": "purge-dv",
                "files": kept + new_files,
                "partition_by": list(manifest["partition_by"]),
                "bucket_keys": manifest["bucket_keys"],
                "num_buckets": manifest["num_buckets"],
                "schema": manifest.get("schema"),
                "txn": manifest.get("txn") or {},
            },
            parent,
        )
        return {"rewritten_files": len(covered), "kept_files": len(kept)}

    def dv_purge_due(
        self,
        max_dv_rows: int = 100_000,
        max_dv_sidecars: int = 16,
    ) -> dict:
        """Metadata-only purge-policy check (VERDICT r8 item 7): a
        fixed purge-every-N cadence rewrites on a clock regardless of
        how much read penalty actually accumulated; this gauges the two
        quantities the read path actually pays for and says whether a
        purge is DUE:

        - ``dv_rows`` — total pending deleted positions (the size of
          the broadcast anti-join every snapshot read performs);
        - ``dv_sidecars`` — live DV entries (each one is a separate
          parquet the read opens before the anti-join).

        Thresholds are the policy knobs; crossing EITHER makes the
        purge due. Costs one manifest read, no data IO — callers can
        gauge after every write."""
        manifest, _ = self._load()
        live = self._dvs_for(manifest, manifest["files"])
        rows = sum(e["rows"] for e in live)
        return {
            "due": rows >= max_dv_rows or len(live) >= max_dv_sidecars,
            "dv_rows": rows,
            "dv_sidecars": len(live),
            "max_dv_rows": max_dv_rows,
            "max_dv_sidecars": max_dv_sidecars,
        }

    def maybe_purge_deletes(
        self,
        max_dv_rows: int = 100_000,
        max_dv_sidecars: int = 16,
    ) -> dict:
        """Purge pending deletion vectors IF the :meth:`dv_purge_due`
        policy says so — the auto-purge hook maintenance paths call
        after their MoR deletes, replacing fixed-cadence purging.
        Keeps two-phase semantics: the MoR delete already made rows
        unreadable; this only schedules the rewrite when the measured
        read-penalty proxies exceed their bounds."""
        gauge = self.dv_purge_due(max_dv_rows, max_dv_sidecars)
        if not gauge["due"]:
            return {**gauge, "purged": False, "rewritten_files": 0}
        return {**gauge, "purged": True, **self.purge_deletes()}

    # -- CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT analogue) -----
    # SQL semantics: a row passes when the expression is TRUE or NULL;
    # only FALSE is a violation. Constraints live in a sidecar beside
    # the txn log and are enforced on every write path through
    # ``_write_files`` (create/append/merge/update/compact rewrites),
    # riding the write job via observe() — zero extra data passes.
    CONSTRAINTS_SIDECAR = "_graft_constraints.json"

    def _constraints_path(self) -> str:
        return os.path.join(self._log_dir(), self.CONSTRAINTS_SIDECAR)

    def constraints(self) -> dict[str, str]:
        p = self._constraints_path()
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def add_constraint(self, name: str, expr: str) -> None:
        """Register CHECK ``expr`` under ``name``. Like Delta, the
        EXISTING data must already satisfy it — one validating scan
        runs now so every later write can trust the invariant."""
        if self.exists():
            viol = (
                self.read()
                .filter(
                    ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
                )
                .count()
            )
            if viol:
                raise ConstraintViolationError(
                    f"existing data violates {name!r} "
                    f"({viol} rows, expr: {expr!r})"
                )
        cons = self.constraints()
        cons[name] = expr
        os.makedirs(self._log_dir(), exist_ok=True)
        tmp = self._constraints_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cons, f)
        os.replace(tmp, self._constraints_path())

    def drop_constraint(self, name: str) -> None:
        cons = self.constraints()
        cons.pop(name, None)
        tmp = self._constraints_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cons, f)
        os.replace(tmp, self._constraints_path())

    # -- shallow clone (Delta SHALLOW CLONE analogue) ----------------------
    def clone(self, dest_path: str) -> "MergeTable":
        """Zero-copy snapshot clone: hard-link the current version's
        data files into ``dest_path`` and commit them as the clone's
        v1. Instant and O(files) regardless of data size; the clone is
        fully independent from then on — mutations on either side
        write NEW files (copy-on-write), and vacuum only ever unlinks a
        table's own directory entries, so neither side can pull bytes
        out from under the other. Sidecars (zone maps / blooms /
        constraints) are keyed by relative path and stay valid for the
        linked files, so they are carried over rather than rebuilt."""
        manifest, _ = self._load()
        src_local = self._local_path()
        dest = MergeTable(self.spark, dest_path)
        dest_local = dest._local_path()
        if os.path.isdir(dest_local) and dest._versions():
            raise ValueError(f"clone destination {dest_path!r} exists")
        os.makedirs(dest_local, exist_ok=True)
        for rel in manifest["files"]:
            dst = os.path.join(dest_local, rel)
            os.makedirs(os.path.dirname(dst) or dest_local, exist_ok=True)
            os.link(os.path.join(src_local, rel), dst)
        live_dvs = self._dvs_for(manifest, manifest["files"])
        for e in live_dvs:
            shutil.copytree(
                os.path.join(self._dv_local_dir(), e["path"]),
                os.path.join(dest._dv_local_dir(), e["path"]),
            )
        dest._commit(
            {
                "op": "clone",
                "files": list(manifest["files"]),
                "partition_by": list(manifest["partition_by"]),
                "bucket_keys": manifest["bucket_keys"],
                "num_buckets": manifest["num_buckets"],
                "schema": manifest.get("schema"),
                "txn": {},
                "dvs": live_dvs,
            },
            0,
        )
        for name in (
            self.STATS_SIDECAR,
            self.BLOOM_SIDECAR,
            self.CONSTRAINTS_SIDECAR,
        ):
            src = os.path.join(self._log_dir(), name)
            if os.path.isfile(src):
                shutil.copyfile(src, os.path.join(dest._log_dir(), name))
        return dest

    def vacuum(self, retain_hours: float = 0.0, dry_run: bool = False) -> int:
        """S12 VACUUM (``retention/bronze:84-86``): physically delete
        data files referenced only by versions older than
        ``retain_hours`` (plus leftover staging dirs from crashed
        writers), returning the number of files removed. The current
        version is always retained. Like Delta, this is the step that
        makes a GDPR DELETE/anonymize physical; until it runs, old
        snapshots remain time-travel readable. ``dry_run`` (Delta's
        ``VACUUM ... DRY RUN``) returns the would-be-removed count
        and touches NOTHING — the check an operator runs before an
        irreversible retention pass."""
        versions = self._versions()
        if not versions:
            return 0
        local = self._local_path()
        horizon = time.time() - retain_hours * 3600.0
        keep: set[str] = set()
        keep_dvs: set[str] = set()
        for v in versions:
            m, _ = self._load(v)
            if v == versions[-1] or (m.get("ts") or 0) >= horizon:
                keep.update(m["files"])
                keep_dvs.update(e["path"] for e in m.get("dvs") or [])
        if dry_run:
            return sum(
                1 for rel in self._data_files() if rel not in keep
            )
        removed = 0
        gone: list[str] = []
        for rel in self._data_files():
            if rel not in keep:
                os.unlink(os.path.join(local, rel))
                gone.append(rel)
                removed += 1
        # drop zone-map and bloom entries for files that no longer
        # exist, so the sidecars track live bytes instead of growing
        # unboundedly
        for name in (self.STATS_SIDECAR, self.BLOOM_SIDECAR):
            sidecar = os.path.join(self._log_dir(), name)
            if gone and os.path.isfile(sidecar):
                try:
                    with open(sidecar) as f:
                        stats = json.load(f)
                    for rel in gone:
                        stats.pop(rel, None)
                    tmp = sidecar + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump(stats, f)
                    os.replace(tmp, sidecar)
                except Exception:
                    pass  # sidecars are advisory; stale entries harmless
        for entry in os.listdir(local):
            if entry.startswith("_staged-"):
                shutil.rmtree(os.path.join(local, entry))
        # deletion-vector sidecars referenced only by vacuumed versions
        dv_dir = self._dv_local_dir()
        if os.path.isdir(dv_dir):
            for entry in os.listdir(dv_dir):
                if entry not in keep_dvs:
                    shutil.rmtree(
                        os.path.join(dv_dir, entry), ignore_errors=True
                    )
                    removed += 1
        # drop now-empty partition dirs so directory listings stay clean
        for dirpath, dirs, files in os.walk(local, topdown=False):
            if dirpath == local:
                continue
            base = os.path.basename(dirpath)
            if "=" not in base and base.startswith(("_", ".")):
                continue
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
        return removed

    def compact(
        self,
        target_partitions: int | None = None,
        sort_by: Sequence[str] = (),
        where: Column | None = None,
        zorder_by: Sequence[str] = (),
    ) -> None:
        """Small-file compaction (Delta OPTIMIZE analogue). Streaming
        foreachBatch appends and per-batch bronze appends accumulate
        small files; periodic compaction keeps scan task counts sane at
        100 TB. Without an explicit target, aims for ~1 output file per
        8 current data files (file count straight from the manifest —
        planning stays no-cost).

        ``where`` scopes the rewrite to matching PARTITIONS of a
        partitioned table (Delta ``OPTIMIZE ... WHERE``): only their
        files are read and rewritten; every other partition's files
        carry over in the manifest untouched — the 100 TB shape, where
        compacting an append table means compacting the partitions
        still receiving small files, never a full-table rewrite. Rows
        keep their partition values under compaction, so the rewritten
        leafs are exactly the output leafs and the commit prunes on
        those.

        ``sort_by`` clusters rows within each output file by the given
        columns (Z-ORDER-lite): parquet row-group min/max stats become
        disjoint on those columns, so later filtered scans skip row
        groups — worth running on the columns your queries filter by.

        ``zorder_by`` is the real thing (Delta ``OPTIMIZE ZORDER BY``):
        each (numeric/timestamp) column is min-max-normalized to 16
        bits and the bits are INTERLEAVED into one long; rows are
        range-partitioned and sorted on that key, so every output file
        covers a compact hyper-box in ALL the listed dimensions at once
        — a lexicographic ``sort_by`` gives tight min/max only on its
        leading column, a z-order gives usable min/max on every listed
        column. Costs one extra bounds pass + a range shuffle, which is
        exactly what OPTIMIZE pays on a cluster."""
        manifest, parent = self._load()
        df = self.read(include_internal=True)
        if where is not None:
            if not manifest["partition_by"]:
                raise ValueError(
                    "where-scoped compact requires a partitioned table"
                )
            # partition predicate ⇒ the scan below file-prunes to the
            # touched partitions; everything else is never read
            df = df.filter(where)
        if target_partitions is not None:
            target = max(1, target_partitions)
        else:
            n_files = len(manifest["files"]) or len(self._data_files())
            target = max(1, n_files // 8)
        if zorder_by:
            zkey = self._zorder_key(df, zorder_by)
            df = df.repartitionByRange(target, zkey).sortWithinPartitions(
                zkey
            )
        else:
            df = df.coalesce(target)
            if sort_by:
                df = df.sortWithinPartitions(*sort_by)
        if where is None:
            self._commit_rewrite(df, op="compact")
        else:
            self._commit_pruned(df, manifest, parent, set(), "compact")

    @staticmethod
    def _zorder_key(df: DataFrame, cols: Sequence[str]) -> Column:
        """Bit-interleaved z-value over up to 4 columns: one bounded
        min/max pass (a 1-row driver scalar), then a pure-JVM
        expression tree — 16 shift/mask terms per column OR-folded into
        a long. NULLs and constant columns map to 0 (they can't be
        discriminated anyway)."""
        cols = list(cols)
        if not 1 <= len(cols) <= 4:
            raise ValueError("zorder_by takes 1-4 columns")
        bounds = df.agg(
            *[F.min(c).cast("double").alias(f"mn_{i}") for i, c in enumerate(cols)],
            *[F.max(c).cast("double").alias(f"mx_{i}") for i, c in enumerate(cols)],
        ).first()
        n = len(cols)
        key = F.lit(0).cast("long")
        for j, c in enumerate(cols):
            mn = bounds[f"mn_{j}"]
            mx = bounds[f"mx_{j}"]
            if mn is None or mx is None or mx <= mn:
                continue
            scaled = F.least(
                F.lit(65535),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(float(mn)))
                        / F.lit(float(mx - mn))
                        * 65536.0
                    ).cast("int"),
                ),
            ).cast("long")
            scaled = F.coalesce(scaled, F.lit(0).cast("long"))
            for i in range(16):
                key = key.bitwiseOR(
                    F.shiftleft(
                        F.shiftright(scaled, i).bitwiseAND(F.lit(1)),
                        i * n + j,
                    )
                )
        return key

    def repartition_table(
        self,
        partition_by: Sequence[str],
        target_partitions: int | None = None,
    ) -> None:
        """Partition-layout evolution: rewrite the table under a NEW
        hive partitioning in one atomic commit (old layout's files
        await vacuum; time travel still reads them). Iceberg evolves
        partition SPECS metadata-only; on parquet the rewrite is the
        honest cost — pay it once, then every later scan prunes on the
        new columns. Key-hash bucketing is dropped (the new layout
        owns placement); constraints and sidecar-building still apply
        (blooms/zone maps re-derive lazily for the new files)."""
        manifest, parent = self._load()
        pcols = list(partition_by)
        df = self.read()
        if target_partitions:
            df = df.repartition(max(1, target_partitions), *pcols)
        files, _ = self._write_files(df, pcols)
        self._commit(
            {
                "op": "repartition",
                "files": files,
                "partition_by": pcols,
                "bucket_keys": [],
                "num_buckets": 0,
                "schema": df.schema.json(),
                "txn": manifest.get("txn") or {},
            },
            parent,
        )

    def live_files(self, leaf_contains: str | None = None) -> list[str]:
        """Relative paths of the current snapshot's data files, straight
        from the manifest (no filesystem listing). ``leaf_contains``
        filters to files whose path carries the given partition-dir
        fragment (e.g. ``"load_date=2024-03-01"``)."""
        manifest, _ = self._load()
        files = list(manifest["files"])
        if leaf_contains is not None:
            files = [f for f in files if leaf_contains in f]
        return files

    def auto_compact(
        self,
        max_files: int = 64,
        where: Column | None = None,
        leaf_contains: str | None = None,
        target_partitions: int | None = None,
        sort_by: Sequence[str] = (),
    ) -> bool:
        """Compact iff the live file count crosses ``max_files`` —
        the hook ingest loops call after every append/merge cycle so
        file counts plateau instead of growing without bound (VERDICT
        r5 item 4). Planning reads only the manifest, so the check is
        free on the no-compaction path. ``leaf_contains`` counts (and
        ``where`` rewrites) a single partition's files — the bronze
        append shape, where only the current load_date accumulates.
        Returns True when a compaction ran.

        ``max_dv_rows`` (class attribute ``AUTO_PURGE_DV_ROWS``): when
        pending deletion-vector rows cross it, the check also purges —
        keeping the read-side broadcast anti-join bounded without a
        separate scheduler. Both checks plan from the manifest alone."""
        purged = False
        if self.dv_rows() > self.AUTO_PURGE_DV_ROWS:
            self.purge_deletes()
            purged = True
        if len(self.live_files(leaf_contains)) <= max_files:
            return purged
        self.compact(
            target_partitions=target_partitions, sort_by=sort_by, where=where
        )
        return True

    #: pending DV positions beyond which auto_compact purges; sized so
    #: the broadcast stays trivially small (8 bytes/row ≈ 8 MB)
    AUTO_PURGE_DV_ROWS = 1_000_000
