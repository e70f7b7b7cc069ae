"""applyInPandasWithState: accumulator survives across availableNow runs
via the checkpoint (the streaming twin of an SCD1 running dim). Sink is
foreachBatch → MergeTable upsert — the fault-tolerant pattern (memory
sink can't recover a checkpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.scd import scd1_upsert
from urban_mobility_data_pipeline_spark.streaming.stateful import (
    running_user_profiles,
)


def _batch(spark, start, n):
    return spark.range(start, start + n).select(
        (F.col("id") % 3).alias("user_id"),
        F.lit(2.5).alias("value"),
        (F.lit(1_700_000_000_000_000) + F.col("id")).alias("ts_us"),
    )


def _run(spark, src_dir, ckpt, target: MergeTable):
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = running_user_profiles(stream)

    def sink(batch_df, _batch_id):
        scd1_upsert(
            target, batch_df, keys=["user_id"], order_col="last_ts_us"
        )

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in target.read().collect()
    }


def test_state_accumulates_across_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    target = MergeTable(spark, str(tmp_path / "profiles"))
    _batch(spark, 0, 30).write.mode("append").parquet(src)
    got1 = _run(spark, src, ckpt, target)
    assert got1 == {0: (10, 25.0), 1: (10, 25.0), 2: (10, 25.0)}

    _batch(spark, 30, 15).write.mode("append").parquet(src)
    got2 = _run(spark, src, ckpt, target)
    # state carried across the restart: 10 prior + 5 new per user
    assert got2 == {0: (15, 37.5), 1: (15, 37.5), 2: (15, 37.5)}


def test_crash_replay_is_exactly_once(spark, tmp_path):
    """The full exactly-once contract, end to end: a foreachBatch sink
    appends with Delta-style txn_app_id/txn_version, then CRASHES after
    the append but before Spark commits the batch to the checkpoint —
    the worst-case failure window. On restart Spark replays the batch;
    the txn marker in the target's manifest makes the replayed append a
    NO-OP, so the sink ends with exactly one copy of every row. This is
    the reason MergeTable.append carries txnAppId/txnVersion at all —
    without it, every crash in that window double-writes."""
    import pytest

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _batch(spark, 0, 30).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    target = MergeTable(spark, str(tmp_path / "sink"))
    target.create(spark.createDataFrame([], schema))
    bomb = tmp_path / "bomb"
    bomb.write_text("armed")

    def sink(batch_df, batch_id):
        target.append(
            batch_df, txn_app_id="attrib", txn_version=int(batch_id)
        )
        if bomb.exists():
            bomb.unlink()
            raise RuntimeError(
                "injected crash: append durable, checkpoint not committed"
            )

    def run():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception):
        run()
    # the crashed batch's rows ARE in the target (the append committed)
    assert target.read().count() == 30
    run()  # restart replays the uncommitted batch
    # replayed append deduped by the txn marker: still exactly 30 rows
    assert target.read().count() == 30
    dupes = (
        target.read()
        .groupBy("user_id", "ts_us")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0
