"""Stream-stream interval join: real streaming execution must agree
with the batch twin of the same join."""

from __future__ import annotations

import datetime as dt

from urban_mobility_data_pipeline_spark.streaming.incremental import (
    read_parquet_stream,
)
from urban_mobility_data_pipeline_spark.streaming.joins import interval_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def _fixture(spark):
    trips = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(30)), (3, 2, _ts(10))],
        "trip_id int, user_id int, trip_ts timestamp",
    )
    pays = spark.createDataFrame(
        [
            (10, 1, _ts(5)),    # trip 1 (+5m)
            (11, 1, _ts(45)),   # trip 2 (+15m); outside trip 1's +20m cap
            (12, 2, _ts(9)),    # before trip 3 -> no match
            (13, 3, _ts(15)),   # no such user
        ],
        "pay_id int, user_id int, pay_ts timestamp",
    )
    return trips, pays


EXPECTED = {(1, 10), (2, 11)}


def _join(left, right):
    return interval_join(
        left,
        right,
        on=["user_id"],
        left_ts="trip_ts",
        right_ts="pay_ts",
        lower="0 seconds",
        upper="20 minutes",
        left_watermark="10 minutes",
        right_watermark="10 minutes",
    )


def test_batch_twin(spark):
    trips, pays = _fixture(spark)
    got = {(r["trip_id"], r["pay_id"]) for r in _join(trips, pays).collect()}
    assert got == EXPECTED


def test_stream_stream_execution_matches_batch(spark, tmp_path):
    trips, pays = _fixture(spark)
    trips.write.parquet(str(tmp_path / "trips"))
    pays.write.parquet(str(tmp_path / "pays"))

    lstream = read_parquet_stream(spark, str(tmp_path / "trips"), trips.schema)
    rstream = read_parquet_stream(spark, str(tmp_path / "pays"), pays.schema)
    joined = _join(lstream, rstream)
    assert joined.isStreaming

    q = (
        joined.writeStream.format("memory")
        .queryName("ssij")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["trip_id"], r["pay_id"])
        for r in spark.sql("SELECT * FROM ssij").collect()
    }
    assert got == EXPECTED


def test_outer_interval_join_single_key_column(spark):
    """Outer modes must emit ONE coalesced key column, not an ambiguous
    pair of identically-named columns (left-only rows carry the left
    key, right-only rows the right key)."""
    trips, pays = _fixture(spark)
    out = interval_join(
        trips,
        pays,
        on=["user_id"],
        left_ts="trip_ts",
        right_ts="pay_ts",
        lower="0 seconds",
        upper="20 minutes",
        how="full_outer",
    )
    assert out.columns.count("user_id") == 1
    rows = out.collect()
    assert all(r["user_id"] is not None for r in rows)
    matched = {(r["trip_id"], r["pay_id"]) for r in rows
               if r["trip_id"] is not None and r["pay_id"] is not None}
    assert matched == EXPECTED
    # unmatched rows from either side survive with their key intact
    assert any(r["trip_id"] is None or r["pay_id"] is None for r in rows)
