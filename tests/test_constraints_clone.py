"""CHECK constraints (observe()-enforced, abort-before-commit) and
zero-copy shallow clone on MergeTable."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import (
    ConstraintViolationError,
    MergeTable,
)


@pytest.fixture()
def orders_table(spark):
    path = tempfile.mkdtemp(prefix="umdp_check_")
    df = spark.range(100).select(
        F.col("id").alias("order_id"),
        (F.col("id") % 7 * 10.0).alias("amount"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.concat(F.lit("c"), F.col("id") % 5))
        .alias("segment"),
    )
    t = MergeTable(spark, path)
    t.create(df)
    return t


def test_constraint_blocks_bad_append_atomically(orders_table, spark):
    t = orders_table
    t.add_constraint("amount_nonneg", "amount >= 0")
    _, v_before = t._load()
    files_before = sorted(t._load()[0]["files"])
    bad = spark.range(3).select(
        (F.col("id") + 1000).cast("long").alias("order_id"),
        F.lit(-5.0).alias("amount"),
        F.lit("cX").alias("segment"),
    )
    with pytest.raises(ConstraintViolationError, match="amount_nonneg"):
        t.append(bad)
    # nothing committed, no stray files, no staging debris
    _, v_after = t._load()
    assert v_after == v_before
    assert sorted(t._load()[0]["files"]) == files_before
    assert t.read().count() == 100
    local = t._local_path()
    assert not [d for d in os.listdir(local) if d.startswith("_staged-")]


def test_constraint_null_passes_false_fails(orders_table, spark):
    t = orders_table
    # segment has NULLs in existing data: NULL passes CHECK (SQL
    # three-valued semantics), so registration succeeds
    t.add_constraint("segment_prefix", "segment LIKE 'c%'")
    ok = spark.range(2).select(
        (F.col("id") + 2000).alias("order_id"),
        F.lit(1.0).alias("amount"),
        F.lit(None).cast("string").alias("segment"),  # NULL: allowed
    )
    t.append(ok)
    assert t.read().count() == 102
    bad = ok.withColumn("segment", F.lit("zzz"))
    with pytest.raises(ConstraintViolationError, match="segment_prefix"):
        t.append(bad)


def test_add_constraint_validates_existing_data(orders_table):
    with pytest.raises(ConstraintViolationError, match="existing data"):
        orders_table.add_constraint("impossible", "amount > 10")


def test_drop_constraint_reopens_the_gate(orders_table, spark):
    t = orders_table
    t.add_constraint("amount_nonneg", "amount >= 0")
    t.drop_constraint("amount_nonneg")
    bad = spark.range(1).select(
        F.lit(9999).cast("long").alias("order_id"),
        F.lit(-1.0).alias("amount"),
        F.lit("c0").alias("segment"),
    )
    t.append(bad)  # no constraint, no error
    assert t.read().filter(F.col("amount") < 0).count() == 1


def test_constraint_enforced_through_merge(orders_table, spark):
    t = orders_table
    t.add_constraint("amount_nonneg", "amount >= 0")
    src = spark.range(1).select(
        F.lit(5).cast("long").alias("order_id"),
        F.lit(-50.0).alias("amount"),
        F.lit("c1").alias("segment"),
    )
    with pytest.raises(ConstraintViolationError):
        t.merge(
            src,
            keys=["order_id"],
            update_set={"amount": F.col("s.amount")},
        )
    # target unchanged
    assert t.read().filter(F.col("amount") < 0).count() == 0


def test_shallow_clone_is_zero_copy_and_independent(orders_table, spark):
    t = orders_table
    t.build_blooms("order_id")
    dest = tempfile.mkdtemp(prefix="umdp_clone_") + "/t2"
    c = t.clone(dest)
    # same data, instantly
    assert c.read().count() == 100
    # hard links, not copies
    src_f = t._load()[0]["files"][0]
    s_stat = os.stat(os.path.join(t._local_path(), src_f))
    d_stat = os.stat(os.path.join(c._local_path(), src_f))
    assert s_stat.st_ino == d_stat.st_ino
    # sidecars carried: the clone can bloom-prune immediately
    assert c.has_blooms("order_id")
    # independence: delete on the clone leaves the source intact
    c.delete_by_keys("order_id", [1, 2, 3])
    assert c.read().count() == 97
    assert t.read().count() == 100
    # vacuum on the SOURCE cannot break the clone (links persist)
    t.delete(F.col("order_id") < 50)
    t.vacuum(0.0)
    assert c.read().count() == 97


def test_clone_refuses_existing_destination(orders_table):
    dest = tempfile.mkdtemp(prefix="umdp_clone_") + "/t2"
    orders_table.clone(dest)
    with pytest.raises(ValueError, match="exists"):
        orders_table.clone(dest)


def test_pii_free_constraint_on_corpus(spark, tmp_path):
    """Composition: a CHECK constraint built from the SAME PII pattern
    constants turns the storage layer into a PII firewall — curated
    (redacted) ingest passes, a raw append carrying an email bounces
    before any file publishes."""
    from urban_mobility_data_pipeline_spark.functions.pii import (
        PII_PATTERNS,
        redact_pii,
    )

    email_pat = next(p for kind, p, _ in PII_PATTERNS if kind == "email")
    docs = spark.createDataFrame(
        [(1, "clean text about engines"), (2, "contact me a@b.com soon")],
        "doc_id long, text string",
    ).select("doc_id", redact_pii("text").alias("text"))
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    corpus.create(docs)  # redacted: no raw emails on disk
    corpus.add_constraint("no_raw_email", f"text NOT RLIKE '{email_pat}'")

    leaky = spark.createDataFrame(
        [(3, "mail bob@example.org now")], "doc_id long, text string"
    )
    with pytest.raises(ConstraintViolationError, match="no_raw_email"):
        corpus.append(leaky)
    assert corpus.read().count() == 2
    # the redacted version of the same doc is admissible
    corpus.append(leaky.select("doc_id", redact_pii("text").alias("text")))
    assert corpus.read().count() == 3


def test_version_diff_rows(spark, tmp_path):
    """diff(v1, v2): updates surface as delete+insert pairs, pure
    rewrites (compaction) diff to empty, and only non-shared files
    feed the comparison."""
    t = MergeTable(spark, str(tmp_path / "t"), bucket_keys=["k"],
                   num_buckets=4)
    base = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    t.create(base)          # v1
    src = spark.createDataFrame([(3, 999), (100, 1000)], "k long, v long")
    t.merge(src, keys=["k"], update_set={"v": F.col("s.v")}, insert=True)  # v2

    d = t.diff(1, 2).collect()
    got = {(r["k"], r["v"], r["__change"]) for r in d}
    assert got == {
        (3, 30, "delete"),
        (3, 999, "insert"),
        (100, 1000, "insert"),
    }
    # a pure rewrite diffs to nothing
    t.compact(target_partitions=2)  # v3
    assert t.diff(2, 3).count() == 0
    # and a delete shows only deletions
    t.delete(F.col("k") < 2)  # v4
    d2 = {(r["k"], r["__change"]) for r in t.diff(3, 4).collect()}
    assert d2 == {(0, "delete"), (1, "delete")}
    # diff to head defaults to the current version
    assert t.diff(1).count() == t.diff(1, 4).count()


def test_vacuum_dry_run_touches_nothing(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v")))
    t.delete(F.col("id") < 50)  # old files now unreferenced by head
    files_before = set(t._data_files())
    n_dry = t.vacuum(0.0, dry_run=True)
    assert n_dry > 0
    assert set(t._data_files()) == files_before  # nothing deleted
    n_real = t.vacuum(0.0)
    assert n_real == n_dry
    assert len(t._data_files()) == len(files_before) - n_real


def test_repartition_table_changes_layout_prunes_and_time_travels(
    spark, tmp_path
):
    t = MergeTable(spark, str(tmp_path / "t"))
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("region"),
        (F.col("id") * 1.5).alias("v"),
    )
    t.create(df)  # unpartitioned v1
    t.repartition_table(["region"])  # v2
    m, _ = t._load()
    assert m["partition_by"] == ["region"]
    assert all(f.startswith("region=") for f in m["files"])
    # same rows, new layout; a region filter now file-prunes
    assert t.read().count() == 1000
    q = t.read().filter(F.col("region") == "2")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert q.count() == 250
    # time travel still reads the OLD layout
    assert t.read(version=1).count() == 1000


def test_history_carries_written_rows_metrics(spark, tmp_path):
    """Every data-writing commit records the rows its staging job
    wrote, observed during the write itself — Delta operationMetrics
    without a second count."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v")))
    t.append(spark.range(100, 130).select(F.col("id"), (F.col("id") * 2).alias("v")))
    t.delete(F.col("id") < 10)
    hist = {h["version"]: h for h in t.history()}
    assert hist[1]["metrics"] == {"written_rows": 100}
    assert hist[2]["metrics"] == {"written_rows": 30}
    assert hist[3]["metrics"] == {"written_rows": 120}  # rewrite keeps 120
