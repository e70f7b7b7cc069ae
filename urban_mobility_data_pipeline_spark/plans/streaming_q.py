"""Streaming queries runnable inside the correctness harness.

These execute a real Structured Streaming query (file source →
``Trigger.AvailableNow`` → memory sink) and return the drained result as
a batch DataFrame — so the driver's DuckDB oracle checks an actual
stream execution, not just a batch twin. The reference has no streaming
surface (SURVEY.md §2.10); this is the Spark-native rebuild of its
incremental layer, oracle-checked.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.plans._helpers import date_str, events_ts_us
from urban_mobility_data_pipeline_spark.session import configure_session
from urban_mobility_data_pipeline_spark.streaming.windows import tumbling_agg

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@register(
    "streaming_hourly_event_counts",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def streaming_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation executed as a REAL
    Structured Streaming query (readStream → availableNow → memory
    sink). With all data available, complete-mode output equals the
    batch aggregation — which is exactly what the DuckDB oracle
    asserts."""
    configure_session(spark)
    # schema must be pinned for a streaming file source; the source wants
    # a directory, so glob-filter the sf dir down to the events file.
    # ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    # across testdata generations — adapt like _helpers.table().
    try:
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ts_type = schema["ts"].dataType.simpleString()
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = stream.withColumn("event_ts", F.timestamp_micros(events_ts_us(ts_type)))
    agg = tumbling_agg(
        ev,
        "event_ts",
        "1 hour",
        {
            "n_events": F.count(F.lit(1)),
            "total_value": F.round(F.sum("value"), 2),
        },
        watermark="30 minutes",
    )
    sink_name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="umdp_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(sink_name).select(
        date_str(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "n_events",
        "total_value",
    )
