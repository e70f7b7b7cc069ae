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
