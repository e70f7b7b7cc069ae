"""Streaming operators against a genuinely UNBOUNDED source (rate):
every other streaming test drains a finite file feed with
availableNow; this one runs the tumbling-window aggregation on the
rate source — micro-batches arriving forever — and asserts live
progress + bounded state before stopping the query. Pins that the
operators don't secretly rely on the drain-to-empty lifecycle."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.streaming.windows import tumbling_agg


def test_tumbling_agg_on_rate_source(spark):
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 200)
        .load()
    )
    ev = stream.select(
        F.col("timestamp").alias("event_ts"),
        (F.col("value") % 7).cast("double").alias("value"),
    )
    agg = tumbling_agg(
        ev,
        "event_ts",
        "2 seconds",
        {"n_events": F.count(F.lit(1)), "total_value": F.sum("value")},
        watermark="2 seconds",
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("rate_windows")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = 0
        while time.time() < deadline:
            time.sleep(2)
            rows = spark.table("rate_windows").count()
            progress = query.lastProgress
            if rows >= 3 and progress:
                break
        assert query.isActive
        assert rows >= 3, "no windowed output from the unbounded source"
        # watermark bounds state: total state rows stay near the number
        # of open windows, not the number of processed rows
        progress = query.lastProgress
        state = (progress or {}).get("stateOperators") or []
        if state:
            assert state[0]["numRowsTotal"] < 100
    finally:
        query.stop()
        spark.catalog.dropTempView("rate_windows") if "rate_windows" in [
            t.name for t in spark.catalog.listTables()
        ] else None
