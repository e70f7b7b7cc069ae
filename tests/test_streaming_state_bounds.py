"""Streaming state-bound assertions (VERDICT r6 item 7).

The interval join (streaming/joins.py) and session windows
(streaming/windows.py) claim watermark-bounded state — O(rate x
(delay + interval)) per side, independent of stream length. These
tests pin the claim with StreamingQueryProgress
``stateOperators.numRowsTotal`` across a long availableNow feed:
12 event-time hours arrive as 12 single-file micro-batches
(maxFilesPerTrigger=1), so the watermark advances batch by batch and
state must PLATEAU after warm-up instead of tracking cumulative input.

Measured plateaus on the committed fixture (rate 20 rows/side/hour,
watermark 10 min, join interval 20 min / session gap 5 min):

* interval join: state 40 -> 56 by batch 1, flat at 56 through batch
  11 (480 cumulative input rows), draining to 16 on the final empty
  batch — eviction is real, not just bounded growth.
* session windows: 20 -> 25, flat through batch 11 (240 cumulative),
  draining to 5 open sessions.

Assertions allow ~2x slack over the measured plateau but stay far
below cumulative input, so a regression to unbounded buffering fails
loudly while benign state-store accounting changes do not.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from urban_mobility_data_pipeline_spark.streaming.joins import interval_join
from urban_mobility_data_pipeline_spark.streaming.windows import session_agg

RATE, HOURS = 20, 12  # rows per side per event-time hour, hours fed
TRIP_SCHEMA = "trip_id int, user_id int, trip_ts timestamp"
PAY_SCHEMA = "pay_id int, user_id int, pay_ts timestamp"
EV_SCHEMA = "user_id int, ev_ts timestamp"


def _state_trace(query):
    """(batchId, numInputRows, numRowsTotal) per micro-batch that ran a
    state operator."""
    return [
        (p["batchId"], p["numInputRows"], p["stateOperators"][0]["numRowsTotal"])
        for p in query.recentProgress
        if p["stateOperators"]
    ]


def _assert_bounded(trace, plateau_cap, total_input):
    """The three state-bound properties: (a) state never exceeds the
    documented plateau cap, (b) the second half of the run holds no
    more state than the first (no slow leak), (c) the final drain
    batch evicts below the plateau."""
    states = [s for _, _, s in trace]
    assert max(states) <= plateau_cap, trace
    assert max(states) * 4 <= total_input, trace  # state << stream length
    half = len(states) // 2
    assert max(states[half:]) <= max(states[:half]), trace
    assert states[-1] < max(states), trace  # watermark eviction ran


def _write_hourly(spark, rows_for_hour, schema, path):
    for h in range(HOURS):
        spark.createDataFrame(rows_for_hour(h), schema).coalesce(1).write.parquet(
            f"{path}/h{h:02d}"
        )


def _stream(spark, path, schema):
    return (
        spark.readStream.schema(_parse_datatype_string(schema))
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/*")
    )


def test_interval_join_state_plateaus(spark, tmp_path):
    def trips(h):
        return [
            (h * RATE + i, i % 5, dt.datetime(2024, 1, 1, h, (i * 3) % 60))
            for i in range(RATE)
        ]

    def pays(h):
        return [
            (h * RATE + i, i % 5, dt.datetime(2024, 1, 1, h, (i * 3 + 5) % 60))
            for i in range(RATE)
        ]

    _write_hourly(spark, trips, TRIP_SCHEMA, str(tmp_path / "trips"))
    _write_hourly(spark, pays, PAY_SCHEMA, str(tmp_path / "pays"))

    def join(left, right, streaming):
        return interval_join(
            left,
            right,
            on=["user_id"],
            left_ts="trip_ts",
            right_ts="pay_ts",
            lower="0 seconds",
            upper="20 minutes",
            left_watermark="10 minutes" if streaming else None,
            right_watermark="10 minutes" if streaming else None,
        )

    q = (
        join(
            _stream(spark, str(tmp_path / "trips"), TRIP_SCHEMA),
            _stream(spark, str(tmp_path / "pays"), PAY_SCHEMA),
            streaming=True,
        )
        .writeStream.format("memory")
        .queryName("sb_ij")
        .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    trace = _state_trace(q)
    assert len(trace) >= HOURS  # one micro-batch per hourly file
    # measured plateau 56 = one batch's 2x20 arrivals + 16 carried;
    # cap at 3 batches' worth of both sides (120) against 480 total
    _assert_bounded(trace, plateau_cap=6 * RATE, total_input=2 * RATE * HOURS)

    # the bounded execution still produces exactly the batch answer —
    # the hourly files arrive in event-time order, so nothing is late
    batch_trips = spark.read.parquet(str(tmp_path / "trips" / "*"))
    batch_pays = spark.read.parquet(str(tmp_path / "pays" / "*"))
    expected = {
        (r["trip_id"], r["pay_id"])
        for r in join(batch_trips, batch_pays, streaming=False).collect()
    }
    got = {
        (r["trip_id"], r["pay_id"])
        for r in spark.sql("SELECT * FROM sb_ij").collect()
    }
    assert got == expected


def test_session_window_state_plateaus(spark, tmp_path):
    def events(h):
        return [
            (i % 5, dt.datetime(2024, 1, 1, h, (i * 3) % 60))
            for i in range(RATE)
        ]

    _write_hourly(spark, events, EV_SCHEMA, str(tmp_path / "ev"))

    agg = session_agg(
        _stream(spark, str(tmp_path / "ev"), EV_SCHEMA),
        "ev_ts",
        "5 minutes",
        ["user_id"],
        {"n_events": F.count("*")},
        watermark="10 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sb_sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    trace = _state_trace(q)
    assert len(trace) >= HOURS
    # measured plateau 25 = 20 in-flight events + 5 open sessions;
    # cap at 3 batches' worth (60) against 240 cumulative input
    _assert_bounded(trace, plateau_cap=3 * RATE, total_input=RATE * HOURS)

    # every user's per-hour activity closes into sessions; only the
    # final hour's 5 open sessions are still in state at the end
    n_sessions = spark.sql("SELECT count(*) AS n FROM sb_sess").collect()[0]["n"]
    assert n_sessions > 0
    assert trace[-1][2] <= 5
