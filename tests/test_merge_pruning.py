"""Partition-pruned MERGE: a merge touching one partition must not read
or rewrite the others (Delta dynamic-file-pruning analogue — reference
``src/silver/trips_bronze_to_silver.py:347-432`` gets this from Delta's
MERGE; our copy-on-write emulation gets it from hive/bucket layout).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import (
    BUCKET_COL,
    MergeTable,
)
from urban_mobility_data_pipeline_spark.operators.scd import (
    scd2_apply,
    with_scd2_columns,
)


def _file_identity(root: str) -> dict[str, tuple[int, float, int]]:
    """{relative parquet path: (inode, mtime, size)} under root."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
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


def _by_partition(ident: dict, prefix: str) -> dict:
    return {k: v for k, v in ident.items() if k.startswith(prefix)}


D1, D2, D3 = (dt.date(2024, 1, d) for d in (1, 2, 3))


def test_hive_partition_merge_touches_only_affected_partition(spark, tmp_path):
    path = str(tmp_path / "t")
    table = MergeTable(spark, path)
    base = spark.createDataFrame(
        [(i, D1 if i < 4 else (D2 if i < 8 else D3), f"v{i}", 0)
         for i in range(12)],
        "id int, load_date date, payload string, version int",
    )
    table.create(base, partition_by=["load_date"])
    before = _file_identity(path)
    assert _by_partition(before, "load_date=2024-01-01")
    assert _by_partition(before, "load_date=2024-01-03")

    # merge one day's batch: update id=4, insert id=100, both on D2
    src = spark.createDataFrame(
        [(4, D2, "v4-new", 1), (100, D2, "fresh", 1)],
        "id int, load_date date, payload string, version int",
    )
    table.merge(
        src,
        keys=["id", "load_date"],
        update_condition=F.col("s.version") > F.col("t.version"),
        update_set={
            "payload": F.col("s.payload"),
            "version": F.col("s.version"),
        },
        insert=True,
    )

    after = _file_identity(path)
    # untouched partitions: byte-identical files (same inode + mtime)
    for day in ("load_date=2024-01-01", "load_date=2024-01-03"):
        assert _by_partition(before, day) == _by_partition(after, day), day
    # touched partition: rewritten (no shared file identity)
    assert not set(_by_partition(before, "load_date=2024-01-02")) & set(
        _by_partition(after, "load_date=2024-01-02")
    ) or _by_partition(before, "load_date=2024-01-02") != _by_partition(
        after, "load_date=2024-01-02"
    )

    got = {
        (r["id"], r["payload"], r["version"])
        for r in table.read().collect()
    }
    assert (4, "v4-new", 1) in got and (100, "fresh", 1) in got
    assert (5, "v5", 0) in got and (0, "v0", 0) in got
    assert len(got) == 13


def test_hive_partition_merge_new_partition_from_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    table = MergeTable(spark, path)
    table.create(
        spark.createDataFrame(
            [(1, D1, "a")], "id int, load_date date, payload string"
        ),
        partition_by=["load_date"],
    )
    before = _file_identity(path)
    table.merge(
        spark.createDataFrame(
            [(2, D2, "b")], "id int, load_date date, payload string"
        ),
        keys=["id", "load_date"],
        insert=True,
    )
    after = _file_identity(path)
    assert _by_partition(before, "load_date=2024-01-01") == _by_partition(
        after, "load_date=2024-01-01"
    )
    assert {(r["id"], r["payload"]) for r in table.read().collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_bucketed_merge_touches_only_affected_buckets(spark, tmp_path):
    path = str(tmp_path / "t")
    table = MergeTable(spark, path, bucket_keys=["id"], num_buckets=8)
    table.create(
        spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(64)],
            "id int, payload string, version int",
        )
    )
    # hidden bucket column: present on disk, absent from read()
    assert any(e.startswith(f"{BUCKET_COL}=") for e in os.listdir(path))
    assert BUCKET_COL not in table.read().columns

    before = _file_identity(path)
    src = spark.createDataFrame(
        [(7, "v7-new", 1)], "id int, payload string, version int"
    )
    table.merge(
        src,
        keys=["id"],
        update_condition=F.col("s.version") > F.col("t.version"),
        update_set={
            "payload": F.col("s.payload"),
            "version": F.col("s.version"),
        },
        insert=True,
    )
    after = _file_identity(path)
    touched = {k.split("/", 1)[0] for k in set(before) ^ set(after)} | {
        k.split("/", 1)[0]
        for k in set(before) & set(after)
        if before[k] != after[k]
    }
    # exactly one bucket dir may differ
    assert len({t for t in touched if t.startswith(f"{BUCKET_COL}=")}) == 1
    got = {(r["id"], r["payload"], r["version"]) for r in table.read().collect()}
    assert (7, "v7-new", 1) in got
    assert len(got) == 64


def test_bucketed_scd2_incremental_and_correct(spark, tmp_path):
    """SCD2 on a bucketed dim: one-key batch rewrites ≤1 bucket and the
    lifecycle (close-current + insert-new) still holds."""
    path = str(tmp_path / "dim")
    table = MergeTable(spark, path, bucket_keys=["id"], num_buckets=8)
    t0 = dt.datetime(2024, 1, 1)
    batch0 = with_scd2_columns(
        spark.createDataFrame(
            [(i, f"city{i}", t0) for i in range(16)],
            "id int, city string, updated_at timestamp",
        ),
        hash_cols=["city"],
        order_col="updated_at",
    )
    scd2_apply(table, batch0, keys=["id"], order_col="valid_from")
    before = _file_identity(path)

    t1 = dt.datetime(2024, 2, 1)
    batch1 = with_scd2_columns(
        spark.createDataFrame(
            [(3, "moved", t1)], "id int, city string, updated_at timestamp"
        ),
        hash_cols=["city"],
        order_col="updated_at",
    )
    scd2_apply(table, batch1, keys=["id"], order_col="valid_from")
    after = _file_identity(path)

    changed_buckets = {
        k.split("/", 1)[0]
        for k in (set(before) ^ set(after))
        | {k for k in set(before) & set(after) if before[k] != after[k]}
    }
    assert len(changed_buckets) <= 1

    rows = table.read().filter("id = 3").collect()
    assert len(rows) == 2
    cur = [r for r in rows if r["is_current"]]
    old = [r for r in rows if not r["is_current"]]
    assert len(cur) == 1 and cur[0]["city"] == "moved"
    assert len(old) == 1 and old[0]["valid_to"] == t1
    assert table.read().filter("id = 5").count() == 1


def test_partition_col_in_update_set_falls_back_to_full_rewrite(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    table = MergeTable(spark, path)
    table.create(
        spark.createDataFrame(
            [(1, D1, "a"), (2, D2, "b")],
            "id int, load_date date, payload string",
        ),
        partition_by=["load_date"],
    )
    # reassigning the partition column moves rows between partitions —
    # must take the full-rewrite path and still be correct
    table.merge(
        spark.createDataFrame(
            [(1, D1, "a2")], "id int, load_date date, payload string"
        ),
        keys=["id", "load_date"],
        update_set={"load_date": F.lit(D3), "payload": F.col("s.payload")},
    )
    got = {
        (r["id"], r["load_date"], r["payload"])
        for r in table.read().collect()
    }
    assert got == {(1, D3, "a2"), (2, D2, "b")}
    # layout preserved: still hive-partitioned by load_date
    assert any(e.startswith("load_date=") for e in os.listdir(path))
    assert any(e == "load_date=2024-01-03" for e in os.listdir(path))


def test_schema_evolution_reaches_all_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    table = MergeTable(spark, path)
    table.create(
        spark.createDataFrame(
            [(1, D1, "a"), (2, D2, "b")],
            "id int, load_date date, payload string",
        ),
        partition_by=["load_date"],
    )
    table.merge(
        spark.createDataFrame(
            [(1, D1, "a2", "x")],
            "id int, load_date date, payload string, extra string",
        ),
        keys=["id", "load_date"],
        update_set={
            "payload": F.col("s.payload"),
            "extra": F.col("s.extra"),
        },
        insert=True,
        evolve_schema=True,
    )
    df = table.read()
    assert "extra" in df.columns
    got = {(r["id"], r["payload"], r["extra"]) for r in df.collect()}
    # the untouched-partition row also has the (NULL) column — no
    # per-partition schema divergence
    assert got == {(1, "a2", "x"), (2, "b", None)}


def test_replace_is_staged_swap(spark, tmp_path):
    path = str(tmp_path / "t")
    table = MergeTable(spark, path)
    table.create(spark.createDataFrame([(1, "a")], "id int, v string"))
    table.replace(spark.createDataFrame([(2, "b")], "id int, v string"))
    assert {(r["id"], r["v"]) for r in table.read().collect()} == {(2, "b")}
    # no leftover staging/backup siblings
    siblings = [
        e for e in os.listdir(tmp_path) if e.startswith("t__")
    ]
    assert siblings == []


def test_compact_avoids_rdd_and_preserves_layout(spark, tmp_path):
    path = str(tmp_path / "t")
    table = MergeTable(spark, path)
    df = spark.createDataFrame(
        [(i, D1 if i % 2 == 0 else D2, f"v{i}") for i in range(100)],
        "id int, load_date date, payload string",
    ).repartition(16)
    table.create(df, partition_by=["load_date"])
    table.compact()
    assert any(e.startswith("load_date=") for e in os.listdir(path))
    assert table.read().count() == 100


@pytest.mark.parametrize("nulls", ["source"])
def test_null_partition_value_falls_back(spark, tmp_path, nulls):
    path = str(tmp_path / "t")
    table = MergeTable(spark, path)
    table.create(
        spark.createDataFrame(
            [(1, D1, "a")], "id int, load_date date, payload string"
        ),
        partition_by=["load_date"],
    )
    table.merge(
        spark.createDataFrame(
            [(2, None, "b")], "id int, load_date date, payload string"
        ),
        keys=["id", "load_date"],
        insert=True,
    )
    got = {
        (r["id"], r["load_date"], r["payload"])
        for r in table.read().collect()
    }
    assert got == {(1, D1, "a"), (2, None, "b")}
