"""Manifest transaction log: atomic commits, snapshot isolation, time
travel, restore, physical VACUUM, pruned DELETE/UPDATE, concurrency.

The reference gets all of this from Delta's ``_delta_log``
(``src/bronze/trips_oltp_to_bronze.py:79-94``,
``retention/bronze_retention_cleanup.py:81-86``); ``MergeTable``
re-implements the storage contract natively on parquet.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import (
    ConcurrentWriteError,
    MergeTable,
)

D1, D2, D3 = (dt.date(2024, 1, d) for d in (1, 2, 3))


def _file_identity(root: str) -> dict[str, tuple[int, int, int]]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        if "_graft_log" in dirpath:
            continue
        for f in files:
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, f)
            st = os.stat(full)
            out[os.path.relpath(full, root)] = (
                st.st_ino,
                st.st_mtime_ns,
                st.st_size,
            )
    return out


def _days_table(spark, path) -> MergeTable:
    t = MergeTable(spark, str(path))
    t.create(
        spark.createDataFrame(
            [(i, D1 if i < 4 else (D2 if i < 8 else D3), f"v{i}")
             for i in range(12)],
            "id int, load_date date, payload string",
        ),
        partition_by=["load_date"],
    )
    return t


def test_time_travel_and_history(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    t.merge(
        spark.createDataFrame([(2, "b")], "id int, v string"),
        keys=["id"],
        insert=True,
    )
    assert {r["v"] for r in t.read().collect()} == {"a", "b"}
    assert {r["v"] for r in t.read(version=1).collect()} == {"a"}
    hist = t.history()
    assert [h["op"] for h in hist] == ["merge", "create"]
    assert [h["version"] for h in hist] == [2, 1]


def test_restore_rolls_back(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    t.replace(spark.createDataFrame([(9, "z")], "id int, v string"))
    t.restore(1)
    assert {r["v"] for r in t.read().collect()} == {"a"}
    # restore is a new commit, not history surgery
    assert t.history()[0]["op"] == "restore"


def test_snapshot_isolation_across_mutation(spark, tmp_path):
    """A DataFrame handle taken before a merge still reads the old
    snapshot afterwards (old files aren't touched until vacuum) — the
    property the old rename-swap rewrite could not provide."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    old = t.read()
    t.merge(
        spark.createDataFrame([(1, "a2")], "id int, v string"),
        keys=["id"],
        update_set={"v": F.col("s.v")},
    )
    assert [r["v"] for r in old.collect()] == ["a"]
    assert [r["v"] for r in t.read().collect()] == ["a2"]


def test_vacuum_makes_gdpr_erasure_physical(spark, tmp_path):
    """An anonymize UPDATE is logical at commit; VACUUM removes the PII
    bytes from disk (Delta's documented GDPR contract — reference
    ``retention/bronze_retention_cleanup.py:84-86``)."""
    path = str(tmp_path / "t")
    t = MergeTable(spark, path)
    t.create(
        spark.createDataFrame(
            [(1, "alice@example.com"), (2, "bob@example.com")],
            "id int, email string",
        )
    )

    def disk_has(needle: bytes) -> bool:
        return any(
            needle in open(f, "rb").read()
            for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                               recursive=True)
        )

    t.update({"email": F.lit("ANON")}, F.col("id") == 1)
    assert disk_has(b"alice@example.com")  # old snapshot still on disk
    removed = t.vacuum()
    assert removed > 0
    assert not disk_has(b"alice@example.com")
    assert {r["email"] for r in t.read().collect()} == {
        "ANON", "bob@example.com"
    }
    with pytest.raises(Exception):
        t.read(version=1).collect()


def test_vacuum_retention_window_keeps_time_travel(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    t.replace(spark.createDataFrame([(2, "b")], "id int, v string"))
    assert t.vacuum(retain_hours=1.0) == 0  # v1 is inside the window
    assert [r["v"] for r in t.read(version=1).collect()] == ["a"]


def test_pruned_delete_whole_partition(spark, tmp_path):
    t = _days_table(spark, tmp_path / "t")
    before = _file_identity(str(tmp_path / "t"))
    t.delete(F.col("load_date") == F.lit(D2))
    after = _file_identity(str(tmp_path / "t"))
    # untouched days: byte-identical file identity
    for day in ("load_date=2024-01-01", "load_date=2024-01-03"):
        assert {k: v for k, v in before.items() if k.startswith(day)} == {
            k: v for k, v in after.items() if k.startswith(day)
        }, day
    assert t.read().filter(F.col("load_date") == D2).count() == 0
    assert t.read().count() == 8
    # physical removal of the dropped partition
    t.vacuum()
    assert not glob.glob(
        os.path.join(str(tmp_path / "t"), "load_date=2024-01-02", "*")
    )


def test_pruned_delete_partial_partition(spark, tmp_path):
    t = _days_table(spark, tmp_path / "t")
    before = _file_identity(str(tmp_path / "t"))
    t.delete((F.col("load_date") == F.lit(D2)) & (F.col("id") == 5))
    after = _file_identity(str(tmp_path / "t"))
    for day in ("load_date=2024-01-01", "load_date=2024-01-03"):
        assert {k: v for k, v in before.items() if k.startswith(day)} == {
            k: v for k, v in after.items() if k.startswith(day)
        }, day
    got = {r["id"] for r in t.read().collect()}
    assert got == set(range(12)) - {5}


def test_delete_matching_nothing_is_noop_commit_free(spark, tmp_path):
    t = _days_table(spark, tmp_path / "t")
    v_before = t.history()[0]["version"]
    t.delete(F.col("id") == 999)
    assert t.history()[0]["version"] == v_before
    assert t.read().count() == 12


def test_delete_all_leaves_readable_empty_table(spark, tmp_path):
    t = _days_table(spark, tmp_path / "t")
    t.delete(F.lit(True))
    assert t.read().count() == 0
    assert t.read().columns == ["id", "load_date", "payload"]


def test_pruned_update_touches_one_partition(spark, tmp_path):
    t = _days_table(spark, tmp_path / "t")
    before = _file_identity(str(tmp_path / "t"))
    t.update(
        {"payload": F.lit("X")},
        (F.col("load_date") == F.lit(D2)) & (F.col("id") == 4),
    )
    after = _file_identity(str(tmp_path / "t"))
    for day in ("load_date=2024-01-01", "load_date=2024-01-03"):
        assert {k: v for k, v in before.items() if k.startswith(day)} == {
            k: v for k, v in after.items() if k.startswith(day)
        }, day
    got = {(r["id"], r["payload"]) for r in t.read().collect()}
    assert (4, "X") in got and (5, "v5") in got and len(got) == 12


def test_commit_race_raises(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    m, v = t._load()
    t._commit(dict(m, op="other-writer"), v)
    with pytest.raises(ConcurrentWriteError):
        t._commit(dict(m, op="loser"), v)


def test_append_retries_lost_race(spark, tmp_path, monkeypatch):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    real_commit = t._commit
    calls = {"n": 0}

    def flaky(manifest, parent):
        calls["n"] += 1
        if calls["n"] == 1:
            # another writer takes our version right before us
            real_commit(dict(manifest, op="other-writer"), parent)
        return real_commit(manifest, parent)

    monkeypatch.setattr(t, "_commit", flaky)
    t.append(spark.createDataFrame([(2, "b")], "id int, v string"))
    assert {r["v"] for r in t.read().collect()} == {"a", "b"}


def test_adopts_plain_spark_directory(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, D1, "a"), (2, D2, "b")], "id int, load_date date, payload string"
    ).write.partitionBy("load_date").parquet(path)
    t = MergeTable(spark, path)
    assert t.exists()
    assert t.read().count() == 2
    t.append(
        spark.createDataFrame(
            [(3, D3, "c")], "id int, load_date date, payload string"
        )
    )
    assert t.read().count() == 3
    # adopted into the log: subsequent mutations are versioned
    assert t.history()[0]["op"] == "append"
    t.merge(
        spark.createDataFrame(
            [(1, D1, "a2")], "id int, load_date date, payload string"
        ),
        keys=["id", "load_date"],
        update_set={"payload": F.col("s.payload")},
    )
    got = {(r["id"], r["payload"]) for r in t.read().collect()}
    assert got == {(1, "a2"), (2, "b"), (3, "c")}


def test_vacuum_cleans_crashed_staging(spark, tmp_path):
    path = tmp_path / "t"
    t = MergeTable(spark, str(path))
    t.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    junk = path / "_staged-deadbeef"
    junk.mkdir()
    (junk / "part-junk.parquet").write_bytes(b"not a parquet file")
    t.vacuum()
    assert not junk.exists()
    assert [r["v"] for r in t.read().collect()] == ["a"]


def test_schema_evolution_is_log_side_and_pruned(spark, tmp_path):
    """evolve_schema on a pruned merge: untouched partitions are not
    rewritten yet read NULL for the new column (manifest schema is
    authoritative)."""
    t = _days_table(spark, tmp_path / "t")
    before = _file_identity(str(tmp_path / "t"))
    t.merge(
        spark.createDataFrame(
            [(4, D2, "v4-new", "extra")],
            "id int, load_date date, payload string, tag string",
        ),
        keys=["id", "load_date"],
        update_set={"payload": F.col("s.payload"), "tag": F.col("s.tag")},
        insert=True,
        evolve_schema=True,
    )
    after = _file_identity(str(tmp_path / "t"))
    for day in ("load_date=2024-01-01", "load_date=2024-01-03"):
        assert {k: v for k, v in before.items() if k.startswith(day)} == {
            k: v for k, v in after.items() if k.startswith(day)
        }, day
    df = t.read()
    assert "tag" in df.columns
    rows = {r["id"]: r["tag"] for r in df.collect()}
    assert rows[4] == "extra" and rows[0] is None and rows[8] is None


def test_read_changes_append_only_incremental(spark, tmp_path):
    """CDF analogue: appended batches are recoverable exactly, by
    version, with no timestamp watermark (Delta ``startingVersion``)."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    v1 = t.history()[0]["version"]
    t.append(spark.createDataFrame([(2, "b")], "id int, v string"))
    t.append(spark.createDataFrame([(3, "c")], "id int, v string"))
    assert {r["id"] for r in t.read_changes(v1).collect()} == {2, 3}
    v2 = v1 + 1
    assert {r["id"] for r in t.read_changes(v2).collect()} == {3}
    # since 0 = everything
    assert t.read_changes(0).count() == 3
    with pytest.raises(ValueError):
        t.read_changes(99)


def test_read_changes_sees_new_schema(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    v1 = t.history()[0]["version"]
    t.append(spark.createDataFrame([(2, "b", 7)], "id int, v string, n int"))
    got = t.read_changes(v1).collect()
    assert [(r["id"], r["n"]) for r in got] == [(2, 7)]


def test_compact_sort_by_clusters_row_groups(spark, tmp_path):
    import pyarrow.parquet as pq

    t = MergeTable(spark, str(tmp_path / "t"))
    # write deliberately interleaved key ranges across many files
    t.create(spark.range(10_000).selectExpr("id % 100 as k", "id as v")
             .repartition(8))
    t.compact(target_partitions=2, sort_by=["k"])
    t.vacuum()
    files = glob.glob(os.path.join(str(tmp_path / "t"), "*.parquet"))
    assert 0 < len(files) <= 2
    # within each file, row groups must be non-overlapping on k
    for f in files:
        md = pq.ParquetFile(f).metadata
        ranges = []
        for i in range(md.num_row_groups):
            col = md.row_group(i).column(0)
            ranges.append((col.statistics.min, col.statistics.max))
        for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:]):
            assert a_max <= b_min
    assert t.read().count() == 10_000


def test_streaming_sink_feeds_change_feed(spark, tmp_path):
    """foreachBatch append into a MergeTable gives a versioned bronze;
    a downstream incremental consumer drains exactly the new rows via
    read_changes — the log replaces timestamp watermarks end-to-end."""
    from urban_mobility_data_pipeline_spark.streaming.incremental import (
        read_parquet_stream,
        run_available_now,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, v string"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    bronze = MergeTable(spark, str(tmp_path / "bronze"))
    run_available_now(
        read_parquet_stream(spark, src, schema),
        str(tmp_path / "ckpt"),
        lambda df, _bid: bronze.append(df),
    )
    v1 = bronze.history()[0]["version"]
    assert {r["id"] for r in bronze.read().collect()} == {1, 2}

    # late files arrive; drain again
    spark.createDataFrame([(3, "c")], "id int, v string").write.mode(
        "append"
    ).parquet(src)
    run_available_now(
        read_parquet_stream(spark, src, schema),
        str(tmp_path / "ckpt"),
        lambda df, _bid: bronze.append(df),
    )
    assert {r["id"] for r in bronze.read_changes(v1).collect()} == {3}


def test_detail_reports_layout_and_size(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"), bucket_keys=["id"],
                   num_buckets=4)
    t.create(spark.createDataFrame([(i, "x") for i in range(20)],
                                   "id int, v string"))
    d = t.detail()
    assert d["version"] == 1 and d["num_files"] > 0
    assert d["size_bytes"] > 0
    assert d["partition_by"] == ["__kb"] and d["bucket_keys"] == ["id"]
    assert d["num_buckets"] == 4


def test_concurrent_appends_all_land(spark, tmp_path):
    """Optimistic concurrency under real contention: parallel writers
    race on version numbers; losers retry against the new head and
    every batch lands exactly once."""
    import threading

    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(0, -1)], "writer int, batch int"))
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            for b in range(3):
                MergeTable(spark, str(tmp_path / "t")).append(
                    spark.createDataFrame([(w, b)], "writer int, batch int")
                )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    rows = {(r["writer"], r["batch"]) for r in t.read().collect()}
    assert rows == {(0, -1)} | {(w, b) for w in range(4) for b in range(3)}
    assert t.read().count() == 13  # exactly once each


def test_racing_merges_disjoint_partitions_both_land_pruned(
    spark, tmp_path, monkeypatch
):
    """Two writers merge into DISJOINT partitions: the loser of the
    commit race gets ConcurrentWriteError, retries against the new
    head, and both changes land via the pruned path — the partition
    neither touched is byte-identical through all three commits
    (VERDICT r3 item 8)."""
    path = tmp_path / "t"
    t1 = _days_table(spark, path)
    t2 = MergeTable(spark, str(path))
    schema = "id int, load_date date, payload string"
    src1 = spark.createDataFrame([(1, D1, "m1")], schema)
    src2 = spark.createDataFrame([(5, D2, "m2")], schema)
    kwargs = dict(
        keys=["id", "load_date"],
        update_set={"payload": F.col("s.payload")},
        insert=True,
    )
    before = _file_identity(str(path))
    real_commit = t1._commit
    state = {"hijacked": False}

    def hijack(manifest, parent):
        if not state["hijacked"]:
            state["hijacked"] = True
            t2.merge(src2, **kwargs)  # the other writer lands first
        return real_commit(manifest, parent)

    monkeypatch.setattr(t1, "_commit", hijack)
    with pytest.raises(ConcurrentWriteError):
        t1.merge(src1, **kwargs)
    t1.merge(src1, **kwargs)  # clean retry against the new head
    after = _file_identity(str(path))
    day3 = "load_date=2024-01-03"
    assert {k: v for k, v in before.items() if k.startswith(day3)} == {
        k: v for k, v in after.items() if k.startswith(day3)
    }, "untouched partition must carry over byte-identical (pruned commits)"
    got = {(r["id"], r["payload"]) for r in t1.read().collect()}
    assert (1, "m1") in got and (5, "m2") in got and len(got) == 12
    assert [h["op"] for h in t1.history()[:2]] == ["merge", "merge"]


def test_racing_merges_same_partition_conflict_then_clean_retry(
    spark, tmp_path, monkeypatch
):
    """Two writers merge into the SAME partition: one
    ConcurrentWriteError, then a clean retry that sees the winner's
    rows — both updates survive, nothing is lost or doubled."""
    path = tmp_path / "t"
    t1 = _days_table(spark, path)
    t2 = MergeTable(spark, str(path))
    schema = "id int, load_date date, payload string"
    src_a = spark.createDataFrame([(0, D1, "A")], schema)
    src_b = spark.createDataFrame([(1, D1, "B")], schema)
    kwargs = dict(
        keys=["id", "load_date"],
        update_set={"payload": F.col("s.payload")},
        insert=True,
    )
    real_commit = t1._commit
    state = {"hijacked": False}

    def hijack(manifest, parent):
        if not state["hijacked"]:
            state["hijacked"] = True
            t2.merge(src_b, **kwargs)
        return real_commit(manifest, parent)

    monkeypatch.setattr(t1, "_commit", hijack)
    with pytest.raises(ConcurrentWriteError):
        t1.merge(src_a, **kwargs)
    t1.merge(src_a, **kwargs)
    got = {(r["id"], r["payload"]) for r in t1.read().collect()}
    assert (0, "A") in got and (1, "B") in got and len(got) == 12


def test_change_feed_reemission_dedups_exactly_once_downstream(
    spark, tmp_path
):
    """Pins the documented read_changes caveat (VERDICT r5 item 8):
    after a MERGE rewrites a bronze partition, the change feed
    re-emits the partition's UNTOUCHED rows alongside the changed one
    — and the downstream silver_apply_changes consumer (latest-per-key
    dedup + hash-compared SCD2 merge) must land exactly-once rows:
    one new version for the changed key, a no-op for the re-emitted
    unchanged key."""
    import datetime as _dt

    from urban_mobility_data_pipeline_spark.domain import config as C
    from urban_mobility_data_pipeline_spark.domain import jobs as J

    T0 = _dt.datetime(2024, 3, 1, 8, 0)
    T1 = _dt.datetime(2024, 3, 1, 9, 0)
    T2 = _dt.datetime(2024, 3, 2, 9, 0)
    ddl = (
        "passenger_id long, full_name string, email string, phone string, "
        "city string, is_deleted boolean, deleted_at timestamp, "
        "created_at timestamp, updated_at timestamp"
    )
    lake = J.Lakehouse(spark, str(tmp_path / "lake"))
    cfg = C.PASSENGERS
    batch = spark.createDataFrame(
        [
            (1, "Ann A", "a@x.com", "1", "Rome", False, None, T0, T0),
            (2, "Bob B", "b@x.com", "2", "Oslo", False, None, T0, T0),
        ],
        ddl,
    )
    J.bronze_ingest(lake, cfg, batch, now=T1)
    assert J.silver_apply_changes(lake, cfg) == 2

    # correction lands DIRECTLY in bronze as a MERGE (CDC repair):
    # both rows share the load_date partition, so the rewrite re-emits
    # Bob's untouched row in the new files
    bronze = lake.table("bronze", cfg.name)
    v_before = bronze.history()[0]["version"]
    fix = spark.createDataFrame([(1, "Paris", T2, T2)],
        "passenger_id long, city string, updated_at timestamp, "
        "raw_loaded_at timestamp",
    )
    bronze.merge(
        fix,
        keys=["passenger_id"],
        update_set={
            "city": F.col("s.city"),
            "updated_at": F.col("s.updated_at"),
            "raw_loaded_at": F.col("s.raw_loaded_at"),
        },
        insert=False,
    )
    # the caveat itself: the feed re-emits Bob although only Ann changed
    reemitted = bronze.read_changes(v_before)
    assert {r["passenger_id"] for r in reemitted.collect()} == {1, 2}

    # downstream: exactly-once despite the re-emission
    assert J.silver_apply_changes(lake, cfg) >= 1
    silver = lake.table("silver", cfg.name).read()
    bob = silver.filter(F.col("passenger_id") == 2).collect()
    assert len(bob) == 1 and bob[0]["is_current"]  # no duplicate, no churn
    ann = silver.filter(F.col("passenger_id") == 1).collect()
    assert len(ann) == 2  # closed old version + current Paris version
    cur = [r for r in ann if r["is_current"]]
    assert len(cur) == 1 and cur[0]["city"] == "Paris"
    # drained: nothing further to consume
    assert J.silver_apply_changes(lake, cfg) == 0


def test_where_scoped_compact_touches_only_matching_partition(
    spark, tmp_path
):
    """OPTIMIZE ... WHERE analogue (VERDICT r5 item 4): a where-scoped
    compact rewrites only the matching partition's files; every other
    partition's files carry over byte-identical (same inode — never
    read, never rewritten), and the snapshot is row-identical."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [(i, D1, f"a{i}") for i in range(4)], "id int, d date, v string"
        ),
        partition_by=["d"],
    )
    # accumulate small files in the D2 partition only
    for i in range(6):
        t.append(
            spark.createDataFrame([(100 + i, D2, f"b{i}")],
                                  "id int, d date, v string")
        )
    before_rows = sorted((r["id"], r["v"]) for r in t.read().collect())
    before = _file_identity(str(tmp_path / "t"))
    d2_before = len(t.live_files(leaf_contains="d=2024-01-02"))
    assert d2_before >= 6

    t.compact(where=F.col("d") == D2)
    assert t.history()[0]["op"] == "compact"

    after = _file_identity(str(tmp_path / "t"))
    d1 = "d=2024-01-01"
    assert {k: v for k, v in before.items() if d1 in k} == {
        k: v for k, v in after.items() if d1 in k
    }
    assert len(t.live_files(leaf_contains="d=2024-01-02")) < d2_before
    assert sorted((r["id"], r["v"]) for r in t.read().collect()) == before_rows


def test_auto_compact_triggers_on_threshold_only(spark, tmp_path):
    """auto_compact is a no-op below max_files (no new version) and
    compacts above it; leaf_contains counts one partition's files."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame([(0, D1, "x")], "id int, d date, v string"),
        partition_by=["d"],
    )
    for i in range(5):
        t.append(
            spark.createDataFrame([(1 + i, D2, "y")], "id int, d date, v string")
        )
    v = t.history()[0]["version"]
    assert t.auto_compact(max_files=100) is False
    assert t.history()[0]["version"] == v  # no-op: nothing committed
    assert (
        t.auto_compact(
            max_files=3,
            where=F.col("d") == D2,
            leaf_contains="d=2024-01-02",
        )
        is True
    )
    assert t.history()[0]["op"] == "compact"
    assert len(t.live_files(leaf_contains="d=2024-01-02")) <= 3
    assert t.read().count() == 6


def test_read_removed_exposes_before_images(spark, tmp_path):
    """read_removed is the delete-side complement of read_changes:
    after a DELETE rewrite, the erased row's before image appears in
    the removed feed (and only re-emitted survivors on the added
    feed); after appends, the removed feed is empty."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))
    v1 = t.history()[0]["version"]
    t.append(spark.createDataFrame([(3, "c")], "id int, v string"))
    assert t.read_removed(v1).count() == 0  # appends remove nothing

    v2 = t.history()[0]["version"]
    t.delete(F.col("id") == 2)
    removed = {r["id"] for r in t.read_removed(v2).collect()}
    assert 2 in removed  # the deleted row's before image
    added = {r["id"] for r in t.read_changes(v2).collect()}
    assert 2 not in added  # gone from the add side
    # union of both feeds' ids = every id the mutation touched
    assert (removed | added) >= {2}
    with pytest.raises(ValueError):
        t.read_removed(99)
