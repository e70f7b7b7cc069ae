"""Version-keyed materialized result cache over MergeTable sources.

A query whose inputs are MergeTables has an exact staleness signal for
free: the txn-log versions of its sources. This module materializes a
query's result to parquet together with the (source path -> version)
map it was computed from; a later call with the same key either serves
the parquet back (every source version unchanged — ZERO recompute, one
metadata read per source) or recomputes and atomically replaces it.

Why this matters at 100 TB: dashboard/report queries re-run far more
often than their inputs change. The cache turns "scan the corpus
again" into "read a small result file", and the version key makes the
hard part — invalidation — exact rather than TTL-guesswork: ANY commit
(append, MERGE, GDPR delete, compaction with data change) bumps the
version and invalidates. Erasure safety falls out: a cached result can
never outlive the erasure commit that removed its rows (pinned in
tests/test_result_cache.py).

Spark-first: the materialization is a plain parquet write; serving a
hit is a plain parquet scan — both distributed, nothing driver-side
except the tiny meta JSON.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable


class ResultCache:
    """Materialized query results keyed by (name, source versions)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _entry_dir(self, key: str) -> str:
        return os.path.join(self.root, key)

    def _meta_path(self, key: str) -> str:
        return os.path.join(self._entry_dir(key), "_cache_meta.json")

    @staticmethod
    def _versions(sources: Sequence[MergeTable]) -> dict[str, int]:
        return {t.path: t.detail()["version"] for t in sources}

    def lookup(self, key: str, sources: Sequence[MergeTable]) -> DataFrame | None:
        """The cached result iff every source is at the cached version."""
        meta_path = self._meta_path(key)
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            meta = json.load(f)
        if meta["versions"] != {k: v for k, v in self._versions(sources).items()}:
            return None
        return self.spark.read.parquet(os.path.join(self._entry_dir(key), "data"))

    def get_or_compute(
        self,
        key: str,
        sources: Sequence[MergeTable],
        compute: Callable[[], DataFrame],
    ) -> DataFrame:
        """Serve the materialized result if fresh, else recompute,
        materialize, and serve. The versions are captured BEFORE the
        compute so a concurrent commit mid-compute invalidates this
        entry on the next call instead of being masked."""
        cached = self.lookup(key, sources)
        if cached is not None:
            self.hits += 1
            return cached
        self.misses += 1
        versions = self._versions(sources)
        result = compute()
        entry = self._entry_dir(key)
        tmp = entry + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        result.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        with open(os.path.join(tmp, "_cache_meta.json"), "w") as f:
            json.dump({"versions": versions}, f)
        shutil.rmtree(entry, ignore_errors=True)
        os.replace(tmp, entry)
        return self.spark.read.parquet(os.path.join(entry, "data"))

    def invalidate(self, key: str) -> None:
        shutil.rmtree(self._entry_dir(key), ignore_errors=True)
