"""Golden micro-fixtures for the MERGE/SCD engines (FIXTURES.md §B)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.scd import (
    scd1_upsert,
    scd2_apply,
    scd3_apply,
    with_scd2_columns,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)
T2 = dt.datetime(2024, 1, 3)

DDL = "id long, name string, city string, raw_loaded_at timestamp"


def _df(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _batch(spark, rows):
    return with_scd2_columns(
        _df(spark, rows), hash_cols=["name", "city"], order_col="raw_loaded_at"
    )


def test_merge_update_and_insert(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, [(1, "a", "x", T0), (2, "b", "y", T0)]))
    t.merge(
        _df(spark, [(2, "b2", "y2", T1), (3, "c", "z", T1)]),
        keys=["id"],
        update_condition=F.col("s.raw_loaded_at") > F.col("t.raw_loaded_at"),
        update_set={"name": F.col("s.name"), "city": F.col("s.city")},
        insert=True,
    )
    got = {r["id"]: (r["name"], r["city"]) for r in t.read().collect()}
    assert got == {1: ("a", "x"), 2: ("b2", "y2"), 3: ("c", "z")}


def test_merge_stale_source_does_not_update(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, [(1, "new", "x", T1)]))
    t.merge(
        _df(spark, [(1, "old", "x", T0)]),
        keys=["id"],
        update_condition=F.col("s.raw_loaded_at") > F.col("t.raw_loaded_at"),
        update_set={"name": F.col("s.name")},
        insert=True,
    )
    assert t.read().collect()[0]["name"] == "new"


def test_merge_delete_and_update(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, [(1, "a", "x", T0), (2, "b", "y", T0)]))
    t.update({"city": F.lit("z")}, F.col("id") == 1)
    t.delete(F.col("id") == 2)
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["city"] == "z"


def test_scd1_late_version_never_overwrites(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    scd1_upsert(t, _df(spark, [(1, "v2", "x", T1)]), ["id"], "raw_loaded_at")
    scd1_upsert(t, _df(spark, [(1, "v1", "x", T0), (2, "b", "y", T0)]),
                ["id"], "raw_loaded_at")
    got = {r["id"]: r["name"] for r in t.read().collect()}
    assert got == {1: "v2", 2: "b"}  # fact_trips.py:225-228 semantics


def test_scd2_full_lifecycle(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    # batch 1: two keys
    scd2_apply(t, _batch(spark, [(1, "a", "x", T0), (2, "b", "y", T0)]),
               ["id"], "raw_loaded_at")
    # batch 2: key1 changed, key2 unchanged (same hash), key3 new
    scd2_apply(
        t,
        _batch(spark, [(1, "a2", "x", T1), (2, "b", "y", T1), (3, "c", "z", T1)]),
        ["id"], "raw_loaded_at",
    )
    rows = t.read().collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["id"], []).append(r)
    # key1: closed old + new current
    v1 = sorted(by_key[1], key=lambda r: r["valid_from"])
    assert len(v1) == 2
    assert v1[0]["is_current"] is False and v1[0]["valid_to"] == T1
    assert v1[1]["is_current"] is True and v1[1]["name"] == "a2"
    # key2: unchanged hash → single version, still current
    assert len(by_key[2]) == 1 and by_key[2][0]["is_current"] is True
    # key3: brand new current
    assert len(by_key[3]) == 1 and by_key[3][0]["is_current"] is True


def test_scd2_healing_resurrects_currentless_key(spark, tmp_path):
    """Crash-between-merges simulation: a key whose current row was closed
    but never re-inserted is healed by the next run (silver/trips:364)."""
    t = MergeTable(spark, str(tmp_path / "t"))
    scd2_apply(t, _batch(spark, [(1, "a", "x", T0)]), ["id"], "raw_loaded_at")
    # simulate the crash: close the current row manually, no insert
    t.update({"is_current": F.lit(False), "valid_to": F.lit(T1)},
             F.col("id") == 1)
    assert t.read().filter("is_current").count() == 0
    # re-run with the new version → phase 2 inserts it (no current match)
    scd2_apply(t, _batch(spark, [(1, "a2", "x", T1)]), ["id"], "raw_loaded_at")
    cur = t.read().filter("is_current").collect()
    assert len(cur) == 1 and cur[0]["name"] == "a2"


def test_scd2_idempotent_rerun(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    batch = _batch(spark, [(1, "a", "x", T0)])
    scd2_apply(t, batch, ["id"], "raw_loaded_at")
    scd2_apply(t, batch, ["id"], "raw_loaded_at")  # same batch again
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["is_current"] is True


def test_scd3_shift_and_insert(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    b1 = _batch(spark, [(1, "a", "x", T0)])
    scd3_apply(t, b1, ["id"], "raw_loaded_at", tracked_cols=["name", "city"])
    seeded = t.read().collect()[0]
    assert seeded["prev_name"] is None and seeded["name"] == "a"
    # change → shift current into prev_*
    b2 = _batch(spark, [(1, "a2", "x2", T1), (2, "b", "y", T1)])
    scd3_apply(t, b2, ["id"], "raw_loaded_at", tracked_cols=["name", "city"])
    got = {r["id"]: r for r in t.read().collect()}
    assert got[1]["name"] == "a2" and got[1]["prev_name"] == "a"
    assert got[1]["city"] == "x2" and got[1]["prev_city"] == "x"
    assert got[2]["prev_name"] is None  # typed-NULL prev on insert
    # unchanged re-run must not shift again
    scd3_apply(t, _batch(spark, [(1, "a2", "x2", T2)]),
               ["id"], "raw_loaded_at", tracked_cols=["name", "city"])
    r1 = {r["id"]: r for r in t.read().collect()}[1]
    assert r1["prev_name"] == "a"  # hash unchanged → no shift


def test_scd2_fused_equals_two_phase(spark, tmp_path):
    """The fused single-rewrite SCD2 must produce exactly the reference's
    two-sequential-MERGE outcome over a churny batch sequence."""
    batches = [
        [(1, "a", "x", T0), (2, "b", "y", T0)],
        [(1, "a2", "x", T1), (2, "b", "y", T1), (3, "c", "z", T1)],
        [(1, "a2", "x", T2), (3, "c3", "z3", T2), (4, "d", "w", T2)],
    ]
    fused_t = MergeTable(spark, str(tmp_path / "fused"))
    twophase_t = MergeTable(spark, str(tmp_path / "twophase"))
    for rows in batches:
        scd2_apply(fused_t, _batch(spark, rows), ["id"], "raw_loaded_at",
                   fused=True)
        scd2_apply(twophase_t, _batch(spark, rows), ["id"], "raw_loaded_at",
                   fused=False)
    cols = ["id", "name", "city", "valid_from", "valid_to", "is_current"]
    a = sorted(tuple(r[c] for c in cols) for r in fused_t.read().collect())
    b = sorted(tuple(r[c] for c in cols) for r in twophase_t.read().collect())
    assert a == b


def test_merge_schema_evolution(spark, tmp_path):
    """autoMerge parity (silver/trips:340-345): a source with a new
    column widens the target; old rows get NULL."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, [(1, "a", "x", T0)]))
    wider = spark.createDataFrame(
        [(1, "a2", "x", T1, "vip"), (2, "b", "y", T1, None)],
        DDL + ", tier string",
    )
    t.merge(
        wider,
        keys=["id"],
        update_condition=F.col("s.raw_loaded_at") > F.col("t.raw_loaded_at"),
        update_set={"name": F.col("s.name"), "tier": F.col("s.tier")},
        insert=True,
        evolve_schema=True,
    )
    got = {r["id"]: (r["name"], r["tier"]) for r in t.read().collect()}
    assert got == {1: ("a2", "vip"), 2: ("b", None)}
    # without evolve_schema, the new column is ignored (Delta default)
    t2 = MergeTable(spark, str(tmp_path / "t2"))
    t2.create(_df(spark, [(1, "a", "x", T0)]))
    t2.merge(wider, keys=["id"], insert=True)
    assert "tier" not in t2.read().columns


def test_compact_reduces_files(spark, tmp_path):
    import glob

    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.range(100).repartition(16).selectExpr("id"))
    for _ in range(3):  # small appends accumulate files
        t.append(spark.range(10).repartition(4).selectExpr("id"))
    before = len(glob.glob(str(tmp_path / "t" / "*.parquet")))
    n = t.read().count()
    t.compact(target_partitions=2)
    # the snapshot now reads ≤2 files; old files persist until vacuum
    # (Delta OPTIMIZE + VACUUM two-step)
    t.vacuum()
    after = len(glob.glob(str(tmp_path / "t" / "*.parquet")))
    assert after < before and after <= 2
    assert t.read().count() == n


def test_scd2_schema_evolution_across_batches(spark, tmp_path):
    """A widened bronze batch evolves silver (autoMerge dev default):
    new column appears, historical rows carry NULL."""
    t = MergeTable(spark, str(tmp_path / "t"))
    scd2_apply(t, _batch(spark, [(1, "a", "x", T0)]), ["id"], "raw_loaded_at")
    wider = spark.createDataFrame(
        [(1, "a2", "x", T1, "gold-tier")], DDL + ", tier string"
    )
    batch2 = with_scd2_columns(wider, hash_cols=["name", "city"],
                               order_col="raw_loaded_at")
    scd2_apply(t, batch2, ["id"], "raw_loaded_at")
    rows = sorted(t.read().collect(), key=lambda r: r["valid_from"])
    assert rows[0]["tier"] is None and rows[0]["is_current"] is False
    assert rows[1]["tier"] == "gold-tier" and rows[1]["is_current"] is True
