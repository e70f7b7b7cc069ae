"""Centralized lifecycle for staged (persisted) intermediate frames.

Several pipelines stage a corpus-wide projection once and serve it to
multiple consumers (the LSH shingle table, SimHash signatures, the
hyperplane-bucket projection): the stage is ``persist()``-ed so the
expensive scan+projection runs a single time instead of once per
consumer. Spark has no "release when the query that used you
finishes" hook, so a bare ``persist`` leaks a cached relation for the
session lifetime — harmless in a one-query job, a steady storage leak
in a long-lived session running the whole catalog (ADVICE r5).

This module is the one place that tracks those frames:

- :func:`scratch_persist` — persist a staging frame AND register it.
- :func:`release_scratch` — unpersist everything registered since the
  last release. Callers that materialize query output (``bench.py``'s
  noop sink, a driver collecting results, a job committing a sink)
  call this between queries; within one query the stage stays cached
  exactly as long as it is useful.

Self-managed lifecycles (e.g. ``corpus_ingest`` unpersisting its parse
in a ``finally``) intentionally bypass this registry.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_SCRATCH: list[DataFrame] = []
_SCRATCH_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A temp directory registered for end-of-process cleanup.

    Queries that build an in-query artifact (a materialized quantizer,
    an IVF/BM25 index, trained classifier weights) need a scratch root;
    a bare ``tempfile.mkdtemp`` leaks one directory per invocation
    across bench best-of reruns and a pytest session (ADVICE r10).
    Dirs registered here are removed in one atexit sweep — not between
    queries, because an artifact trained by one catalog row is
    deliberately reused by its family members within the session.
    """
    path = tempfile.mkdtemp(prefix=prefix)
    with _LOCK:
        _SCRATCH_DIRS.append(path)
    return path


@atexit.register
def _cleanup_scratch_dirs() -> None:
    with _LOCK:
        dirs = list(_SCRATCH_DIRS)
        _SCRATCH_DIRS.clear()
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def scratch_persist(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """Persist a staging frame and register it for later release.

    MEMORY_AND_DISK by default — staged projections are usually far
    smaller than the source but can exceed executor memory at scale;
    spilling beats recomputation for a frame that is read 2-3 times.
    """
    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    with _LOCK:
        _SCRATCH.append(df)
    return df


def release_scratch(blocking: bool = False) -> int:
    """Unpersist every registered staging frame; returns how many."""
    with _LOCK:
        frames = list(_SCRATCH)
        _SCRATCH.clear()
    for df in frames:
        try:
            df.unpersist(blocking)
        except Exception:
            pass  # session already stopped — nothing cached anymore
    return len(frames)
