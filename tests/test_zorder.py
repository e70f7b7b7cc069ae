"""OPTIMIZE ZORDER: bit-interleaved multi-column clustering in
``MergeTable.compact(zorder_by=...)``.

The property under test is the one that matters at 100 TB: after a
lexicographic sort on (x, y), per-file min/max are tight on x but
USELESS on y (every file spans y's whole range); after a z-order on
(x, y), zone maps prune on BOTH columns."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

N = 60_000
N_FILES = 16


def _make_table(spark):
    """Two independent uniform dimensions — the sort-hostile layout."""
    path = tempfile.mkdtemp(prefix="umdp_zorder_")
    df = spark.range(N).select(
        F.col("id"),
        (F.xxhash64("id") % 10_000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 10_000).alias("y"),
    )
    t = MergeTable(spark, path)
    t.create(df.repartition(N_FILES))
    return t


def _skip_rate(t: MergeTable, col: str, lo: int, hi: int) -> float:
    cands, skipped = t.prune_files(col, lo, hi)
    total = len(cands) + len(skipped)
    return len(skipped) / total if total else 0.0


def _fresh_stats(t: MergeTable):
    # analyze() only adds missing entries; files are new post-compact,
    # so a plain call picks up exactly the live set
    t.analyze(["x", "y"])


def test_zorder_prunes_on_every_listed_column(spark):
    t = _make_table(spark)

    # single-dimension clustering baseline (z-order on x alone = range
    # partitioning on x): file stats are tight on x, USELESS on y
    t.compact(target_partitions=N_FILES, zorder_by=["x"])
    _fresh_stats(t)
    assert _skip_rate(t, "x", 0, 500) > 0.8
    assert _skip_rate(t, "y", 0, 500) == 0.0  # every file straddles y

    # two-dimension z-order: BOTH dimensions prune
    t.compact(target_partitions=N_FILES, zorder_by=["x", "y"])
    _fresh_stats(t)
    x_rate = _skip_rate(t, "x", 0, 500)
    y_rate = _skip_rate(t, "y", 0, 500)
    assert x_rate > 0.4, x_rate
    assert y_rate > 0.4, y_rate


def test_zorder_preserves_data_exactly(spark):
    t = _make_table(spark)
    before = t.read()
    n0 = before.count()
    csum = before.agg(
        F.sum("id").alias("s"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
    ).first()
    t.compact(target_partitions=8, zorder_by=["x", "y"])
    after = t.read()
    assert after.count() == n0 == N
    csum2 = after.agg(
        F.sum("id").alias("s"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
    ).first()
    assert tuple(csum) == tuple(csum2)
    assert len(t.live_files()) <= 8


def test_zorder_key_is_jvm_only(spark):
    """The z-key is an expression tree, never Python per row."""
    t = _make_table(spark)
    df = t.read()
    key = MergeTable._zorder_key(df, ["x", "y"])
    plan = (
        df.select(key.alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_zorder_handles_nulls_and_constant_columns(spark):
    path = tempfile.mkdtemp(prefix="umdp_zorder_edge_")
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") % 100)
        .alias("x"),
        F.lit(7).alias("k"),  # constant: no bits to interleave
    )
    t = MergeTable(spark, path)
    t.create(df.repartition(4))
    t.compact(target_partitions=2, zorder_by=["x", "k"])
    assert t.read().count() == 1000


def test_zorder_rejects_too_many_columns(spark):
    t = _make_table(spark)
    with pytest.raises(ValueError):
        t.compact(zorder_by=["x", "y", "id", "x", "y"])


def test_cli_optimize_zorder(spark, tmp_path, capsys):
    from urban_mobility_data_pipeline_spark.run import main

    t = _make_table(spark)
    rc = main(
        [
            "optimize",
            "--lake", str(tmp_path / "lake"),
            "--table", t.path,
            "--zorder", "x,y",
            "--target-files", "8",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "optimized" in out and "zorder by ['x', 'y']" in out
    assert len(t.live_files()) <= 8
    assert t.read().count() == N
    _fresh_stats(t)
    assert _skip_rate(t, "y", 0, 500) > 0.3
