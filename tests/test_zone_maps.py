"""Zone maps (per-file min/max stats): footer-only analyze, file-level
skipping reads, and retention deletes that drop whole files with zero
IO — the Delta stats-in-log analogue over the sidecar."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

D = [dt.datetime(2024, 1, d, 12, 0) for d in range(1, 9)]


def _one_file_batch(spark, rows, schema):
    return spark.createDataFrame(rows, schema).coalesce(1)


@pytest.fixture
def ts_table(spark, tmp_path):
    """Three single-file appends with disjoint ts ranges + one
    straddler file."""
    t = MergeTable(spark, str(tmp_path / "t"))
    sch = "id int, ts timestamp, v string"
    t.create(_one_file_batch(spark, [(1, D[0], "a"), (2, D[1], "a")], sch))
    t.append(_one_file_batch(spark, [(3, D[2], "b"), (4, D[3], "b")], sch))
    t.append(_one_file_batch(spark, [(5, D[4], "c"), (6, D[5], "c")], sch))
    t.append(_one_file_batch(spark, [(7, D[1], "s"), (8, D[6], "s")], sch))
    return t


def test_analyze_reads_footers_only_and_is_incremental(spark, ts_table):
    stats = ts_table.analyze(["ts", "id"])
    assert len(stats) == 4
    for per_file in stats.values():
        lo, hi = per_file["ts"]
        assert isinstance(lo, int) and lo <= hi  # epoch-micros normalized
    # second call finds nothing missing (sidecar hit, no footer reads)
    again = ts_table.analyze(["ts", "id"])
    assert again == stats


def test_read_between_skips_non_overlapping_files(spark, ts_table):
    t = ts_table
    full = t.read().filter(
        (F.col("ts") >= F.lit(D[2])) & (F.col("ts") < F.lit(D[4]))
    )
    pruned = t.read_between("ts", lo=D[2], hi=D[4])
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    ) == [3, 4]
    cands, skipped = t.prune_files("ts", lo=D[2], hi=D[4])
    # file1 (D0-D1) and file3 (D4-D5) skip; file2 and the straddler stay
    assert len(skipped) == 2 and len(cands) == 2


def test_prune_keeps_files_without_stats(spark, ts_table, tmp_path):
    """Unknown must be read: a file whose schema lacks the column (or
    whose stats are absent) is always a candidate — skipping is sound,
    never lossy."""
    t = ts_table
    # schema-evolution append WITHOUT the ts column
    t.append(
        spark.createDataFrame([(99, "x")], "id int, v string").coalesce(1)
    )
    cands, skipped = t.prune_files("ts", lo=D[6], hi=None)
    all_files = set(cands) | set(skipped)
    newest = [f for f in all_files if f in cands]
    assert any(f for f in newest)  # the statless file stayed a candidate
    # and the read still returns exactly the in-range rows (NULL ts
    # rows fail the residual predicate)
    got = sorted(r["id"] for r in t.read_between("ts", lo=D[5]).collect())
    assert got == [6, 8]


def test_delete_older_than_drops_whole_files_without_io(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    sch = "id int, ts timestamp, v string"
    t.create(_one_file_batch(spark, [(1, D[0], "a"), (2, D[1], "a")], sch))
    t.append(_one_file_batch(spark, [(3, D[4], "b"), (4, D[5], "b")], sch))
    t.append(_one_file_batch(spark, [(5, D[2], "s"), (6, D[6], "s")], sch))

    files_before = set(t.live_files())
    kept_file = next(
        f for f in files_before
        if t.analyze(["ts"])[f]["ts"][0]
        == t._norm_stat(D[4])
    )
    st_before = os.stat(os.path.join(t._local_path(), kept_file))

    counts = t.delete_older_than("ts", D[3])
    assert counts == {"dropped_files": 1, "rewritten_files": 1, "kept_files": 1}
    # surviving rows = exactly ts >= cutoff
    assert sorted(r["id"] for r in t.read().collect()) == [3, 4, 6]
    # the wholly-newer file carried over untouched (same inode/mtime)
    st_after = os.stat(os.path.join(t._local_path(), kept_file))
    assert (st_before.st_ino, st_before.st_mtime_ns) == (
        st_after.st_ino,
        st_after.st_mtime_ns,
    )
    assert t.history()[0]["op"] == "delete"
    # logical until vacuum: time travel still sees the dropped rows
    prev_version = t.history()[1]["version"]
    assert t.read(version=prev_version).count() == 6
    # idempotent: nothing left below the cutoff
    assert t.delete_older_than("ts", D[3]) == {
        "dropped_files": 0,
        "rewritten_files": 0,
        "kept_files": 2,
    }


def test_age_retention_via_zone_maps_matches_predicate_delete(
    spark, tmp_path
):
    """apply_age_retention and the predicate apply_retention must leave
    row-identical tables (layout differs: the zone-map path drops whole
    files)."""
    from urban_mobility_data_pipeline_spark.operators.retention import (
        age_predicate,
        apply_age_retention,
        apply_retention,
    )

    sch = "id int, raw_loaded_at timestamp, v string"
    now = dt.datetime(2024, 1, 9, 0, 0)
    rows_old = [(i, D[0], "old") for i in range(4)]
    rows_new = [(10 + i, D[7], "new") for i in range(4)]

    a = MergeTable(spark, str(tmp_path / "a"))
    a.create(_one_file_batch(spark, rows_old, sch))
    a.append(_one_file_batch(spark, rows_new, sch))
    b = MergeTable(spark, str(tmp_path / "b"))
    b.create(_one_file_batch(spark, rows_old, sch))
    b.append(_one_file_batch(spark, rows_new, sch))

    counts = apply_age_retention(a, "raw_loaded_at", 3, now)
    assert counts["dropped_files"] == 1 and counts["rewritten_files"] == 0
    apply_retention(b, age_predicate("raw_loaded_at", 3, now))
    assert sorted(map(tuple, a.read().collect())) == sorted(
        map(tuple, b.read().collect())
    )


def test_vacuum_prunes_stats_sidecar(spark, tmp_path):
    import json

    t = MergeTable(spark, str(tmp_path / "t"))
    sch = "id int, ts timestamp, v string"
    t.create(_one_file_batch(spark, [(1, D[0], "a")], sch))
    t.append(_one_file_batch(spark, [(2, D[5], "b")], sch))
    t.analyze(["ts"])
    t.delete_older_than("ts", D[3])  # drops the old file (logical)
    t.vacuum()
    sidecar = os.path.join(t._log_dir(), MergeTable.STATS_SIDECAR)
    with open(sidecar) as f:
        stats = json.load(f)
    assert set(stats) == set(t.live_files())
