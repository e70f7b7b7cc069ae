"""Deletion vectors: merge-on-read DELETE for MergeTable.

The reference's GDPR/retention deletes are copy-on-write rewrites
(``gdpr/gdpr_propagate_erasure.py``, ``retention/
bronze_retention_cleanup.py``); at 100 TB a point delete touching one
row per multi-GB file would rewrite terabytes to remove kilobytes.
``delete_mor``/``delete_keys_mor`` record deleted ROW POSITIONS in a
sidecar instead (Delta deletion-vector analogue): zero data files are
rewritten, every snapshot read anti-joins the positions back out, and
``purge_deletes`` later materializes ONLY the covered files.

Pinned here:
- visibility: MOR-deleted rows vanish from every read path (snapshot,
  time travel, read_between, read_by_keys) while the manifest's file
  list is byte-identical;
- no resurrection: merge / update / compact / purge read DV-applied,
  so a rewrite can never bring a deleted row back;
- idempotence: re-deleting the same predicate adds zero DV rows;
- bloom routing: delete_keys_mor scans only bloom-positive files;
- CDC: read_removed emits precise row images for DV deletes, diff
  sees DV-only changes on otherwise-shared files;
- lifecycle: clone carries DVs, purge clears them rewriting only
  covered files, vacuum drops orphaned sidecars, restore round-trips.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable


@pytest.fixture
def table(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    df = (
        spark.range(400)
        .withColumn("grp", (F.col("id") % 4).cast("int"))
        .withColumn("val", F.col("id") * 2)
    )
    t.create(df.repartition(8))
    return t


def test_mor_delete_hides_rows_without_rewriting(table):
    files_before = list(table._load()[0]["files"])
    stats = table.delete_mor(F.col("id") < 25)
    assert stats["deleted_rows"] == 25
    assert stats["rewritten_files"] == 0
    manifest, _ = table._load()
    assert manifest["files"] == files_before  # not even reordered
    assert table.read().count() == 375
    assert table.read().filter(F.col("id") < 25).count() == 0
    # physical bytes untouched on disk too
    assert sorted(table._data_files()) >= sorted(files_before)


def test_time_travel_and_restore_see_per_version_dvs(table):
    table.delete_mor(F.col("id") < 25)
    table.delete_mor((F.col("id") >= 25) & (F.col("id") < 40))
    assert table.read(version=1).count() == 400
    assert table.read(version=2).count() == 375
    assert table.read().count() == 360
    table.restore(2)
    assert table.read().count() == 375


def test_redelete_is_idempotent_and_overlap_dedups(table):
    s1 = table.delete_mor(F.col("id") < 25)
    s2 = table.delete_mor(F.col("id") < 25)
    s3 = table.delete_mor(F.col("id") < 30)
    assert (s1["deleted_rows"], s2["deleted_rows"], s3["deleted_rows"]) == (
        25,
        0,
        5,
    )
    assert table.dv_rows() == 30
    assert table.read().count() == 370


def test_merge_and_update_never_resurrect(spark, table):
    table.delete_mor(F.col("id") < 25)
    src = (
        spark.range(50)
        .withColumn("grp", F.lit(9).cast("int"))
        .withColumn("val", F.lit(-1).cast("long"))
    )
    table.merge(src, ["id"], update_set={"val": F.col("s.val")})
    assert table.read().count() == 375
    assert table.read().filter(F.col("id") < 25).count() == 0
    table.update({"val": F.lit(0).cast("long")}, F.col("id") < 100)
    assert table.read().count() == 375
    assert table.read().filter(F.col("id") < 25).count() == 0


def test_purge_rewrites_only_covered_files(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "p"))
    a = spark.range(100).withColumn("val", F.col("id") * 2)
    b = spark.range(100, 200).withColumn("val", F.col("id") * 2)
    t.create(a.coalesce(1))
    t.append(b.coalesce(1))
    t.delete_mor(F.col("id") < 10)  # touches only the first file
    manifest, _ = t._load()
    covered = set(manifest["dvs"][0]["files"])
    untouched = [f for f in manifest["files"] if f not in covered]
    assert untouched, "second file must be DV-free"
    stats = t.purge_deletes()
    assert stats["rewritten_files"] == len(covered)
    assert stats["kept_files"] == len(untouched)
    head, _ = t._load()
    assert not (head.get("dvs") or [])
    assert set(untouched) <= set(head["files"])  # carried, not rewritten
    assert t.read().count() == 190
    assert t.read().filter(F.col("id") < 10).count() == 0
    # purge with nothing pending is a no-op
    assert t.purge_deletes()["rewritten_files"] == 0


def test_compact_materializes_dvs(table):
    table.delete_mor(F.col("id") < 25)
    table.compact(target_partitions=2)
    head, _ = table._load()
    assert not (head.get("dvs") or [])
    assert table.read().count() == 375
    assert table.read().filter(F.col("id") < 25).count() == 0


def test_delete_keys_mor_routes_through_blooms(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "b"))
    df = spark.range(2_000).withColumn("val", F.col("id") * 3)
    t.create(df.repartition(16))
    t.build_blooms("id")
    n_files = len(t._load()[0]["files"])
    stats = t.delete_keys_mor("id", [5, 400, 1999])
    assert stats["deleted_rows"] == 3
    assert stats["rewritten_files"] == 0
    assert stats["scanned_files"] + stats["skipped_files"] == n_files
    assert stats["skipped_files"] > 0, "blooms must prune most files"
    assert t.read().count() == 1_997
    assert t.read().filter(F.col("id").isin(5, 400, 1999)).count() == 0
    # read_by_keys (bloom-pruned point lookup) also sees the DVs
    assert t.read_by_keys("id", [5, 6]).count() == 1


def test_partitioned_and_bucketed_tables(spark, tmp_path):
    part = MergeTable(spark, str(tmp_path / "part"))
    part.create(
        spark.range(300).withColumn("p", (F.col("id") % 3).cast("int")),
        partition_by=["p"],
    )
    part.delete_mor(F.col("id") < 30)
    assert part.read().count() == 270
    assert part.read().filter(F.col("p") == 1).count() == 90
    bt = MergeTable(
        spark, str(tmp_path / "bkt"), bucket_keys=["id"], num_buckets=4
    )
    bt.create(spark.range(300).withColumn("val", F.col("id")))
    bt.delete_mor(F.col("id") < 30)
    assert bt.read().count() == 270
    # bucket-pruned merge over a DV'd table: deleted rows are NOT
    # MATCHED (they are gone), so insert=True re-inserts ids 0..29
    # as fresh SOURCE rows — never the deleted originals
    src = spark.range(50).withColumn("val", F.lit(-1).cast("long"))
    bt.merge(src, ["id"], update_set={"val": F.col("s.val")}, insert=True)
    got = bt.read()
    assert got.count() == 300  # 270 live + 30 re-inserted
    assert got.filter((F.col("id") < 50) & (F.col("val") != -1)).count() == 0


def test_read_removed_emits_dv_delete_images(table):
    v_before = table._load()[1]
    table.delete_mor(F.col("id") < 7)
    removed = table.read_removed(v_before)
    assert removed.count() == 7
    assert sorted(r["id"] for r in removed.collect()) == list(range(7))
    # incremental consumers see deletes exactly once
    v_mid = table._load()[1]
    table.delete_mor(F.col("id") < 10)
    assert sorted(
        r["id"] for r in table.read_removed(v_mid).collect()
    ) == [7, 8, 9]


def test_diff_sees_dv_only_changes(table):
    v1 = table._load()[1]
    table.delete_mor(F.col("id") < 5)
    d = table.diff(v1)
    rows = d.collect()
    assert {r["__change"] for r in rows} == {"delete"}
    assert sorted(r["id"] for r in rows) == [0, 1, 2, 3, 4]


def test_clone_carries_dvs_then_diverges(table, tmp_path):
    table.delete_mor(F.col("id") < 25)
    clone = table.clone(str(tmp_path / "c"))
    assert clone.read().count() == 375
    clone.delete_mor(F.col("id") < 50)
    assert clone.read().count() == 350
    assert table.read().count() == 375  # source untouched


def test_vacuum_drops_orphaned_dv_sidecars(table):
    table.delete_mor(F.col("id") < 25)
    dv_dir = table._dv_local_dir()
    assert len(os.listdir(dv_dir)) == 1
    table.purge_deletes()
    table.vacuum(0.0)
    assert not os.path.isdir(dv_dir) or not os.listdir(dv_dir)
    assert table.read().count() == 375


def test_append_after_mor_delete(spark, table):
    table.delete_mor(F.col("id") < 25)
    table.append(
        spark.range(1_000, 1_050)
        .withColumn("grp", F.lit(0).cast("int"))
        .withColumn("val", F.col("id"))
    )
    assert table.read().count() == 425
    assert table.read().filter(F.col("id") < 25).count() == 0


def test_cow_delete_on_dv_table_keeps_dvs_on_kept_files(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "mix"))
    t.create(
        spark.range(200).withColumn("p", (F.col("id") % 2).cast("int")),
        partition_by=["p"],
    )
    t.delete_mor((F.col("p") == 0) & (F.col("id") < 20))  # 10 even ids
    # partition-pruned CoW delete of the OTHER partition
    t.delete(F.col("p") == 1)
    assert t.read().count() == 90
    assert t.read().filter(F.col("id") < 20).count() == 0


def test_auto_compact_purges_past_dv_threshold(spark, tmp_path, monkeypatch):
    t = MergeTable(spark, str(tmp_path / "ac"))
    t.create(spark.range(500).withColumn("val", F.col("id")).repartition(4))
    t.delete_mor(F.col("id") < 100)
    monkeypatch.setattr(MergeTable, "AUTO_PURGE_DV_ROWS", 50)
    assert t.auto_compact(max_files=1000) is True  # purge ran, no compact
    assert t.dv_rows() == 0
    assert t.read().count() == 400
    # below threshold: nothing to do
    t.delete_mor(F.col("id") < 110)
    monkeypatch.setattr(MergeTable, "AUTO_PURGE_DV_ROWS", 1_000_000)
    assert t.auto_compact(max_files=1000) is False
    assert t.dv_rows() == 10


def test_dv_purge_policy_threshold_based(table):
    """dv_purge_due / maybe_purge_deletes (VERDICT r8 item 7): the
    purge is scheduled by measured read-penalty proxies (pending DV
    rows, sidecar count), not a fixed clock — under the bound nothing
    rewrites, crossing either knob triggers exactly one purge."""
    # 10 pending rows, 1 sidecar: not due under generous knobs
    table.delete_mor(F.col("id") < 10)
    gauge = table.dv_purge_due(max_dv_rows=50, max_dv_sidecars=4)
    assert gauge == {
        "due": False, "dv_rows": 10, "dv_sidecars": 1,
        "max_dv_rows": 50, "max_dv_sidecars": 4,
    }
    st = table.maybe_purge_deletes(max_dv_rows=50, max_dv_sidecars=4)
    assert st["purged"] is False and st["rewritten_files"] == 0
    assert table.dv_rows() == 10  # untouched

    # rows knob crossed -> purge fires, DVs drain, reads still exact
    table.delete_mor((F.col("id") >= 10) & (F.col("id") < 60))
    st = table.maybe_purge_deletes(max_dv_rows=50, max_dv_sidecars=4)
    assert st["purged"] is True and st["rewritten_files"] > 0
    assert table.dv_rows() == 0
    assert table.read().count() == 340
    assert table.read().filter(F.col("id") < 60).count() == 0

    # sidecar knob alone also triggers (rows stay tiny)
    for lo in (60, 62, 64):
        table.delete_mor(
            (F.col("id") >= lo) & (F.col("id") < lo + 2)
        )
    st = table.maybe_purge_deletes(max_dv_rows=10_000, max_dv_sidecars=3)
    assert st["purged"] is True and st["dv_sidecars"] == 3
    assert table.dv_rows() == 0
    assert table.read().count() == 334
