"""Micro-fixtures: watermark never-regress (M1), GDPR propagation
(M7-M10, J6), retention (P11/S11), recompute-affected aggregates (M6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.aggregates import (
    recompute_affected,
    upsert_aggregate,
)
from urban_mobility_data_pipeline_spark.operators.gdpr import (
    AuditLog,
    affected_trip_ids,
    normalize_requests,
    propagate_erasure,
    scrub_column,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.retention import (
    apply_retention,
    closed_history_predicate,
)
from urban_mobility_data_pipeline_spark.operators.watermark import (
    EPOCH,
    ControlTable,
    incremental_slice,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)
T2 = dt.datetime(2024, 1, 3)


def test_watermark_never_regresses(spark, tmp_path):
    ct = ControlTable(spark, str(tmp_path / "ctl"))
    assert ct.read_watermark("job") == EPOCH
    ct.upsert("job", T1, "OK")
    assert ct.read_watermark("job") == T1
    ct.upsert("job", None, "FAIL: boom")  # NULL ts keeps the old watermark
    assert ct.read_watermark("job") == T1
    row = ct.table.read().filter(F.col("job_name") == "job").first()
    assert row["last_status"].startswith("FAIL")
    ct.upsert("job", T2, "OK")
    assert ct.read_watermark("job") == T2


def test_concurrent_control_upserts_both_survive(spark, tmp_path):
    """Two jobs racing upserts into one control table: the loser of the
    commit race retries against the new head, so BOTH control rows
    survive (VERDICT r3 item 5 — MergeTable-backed optimistic
    concurrency, not read-modify-replace)."""
    import threading

    ct = ControlTable(spark, str(tmp_path / "ctl_race"))
    ct.upsert("seed", T0, "OK")  # shared starting head for both racers
    errs = []

    def run(job):
        try:
            ct.upsert(job, T1, "OK")
        except Exception as e:  # pragma: no cover - failure detail
            errs.append((job, e))

    threads = [threading.Thread(target=run, args=(j,)) for j in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    rows = {r["job_name"]: r for r in ct.table.read().collect()}
    assert set(rows) == {"seed", "a", "b"}
    assert rows["a"]["last_loaded_ts"] == T1
    assert rows["b"]["last_loaded_ts"] == T1


def test_version_cursor_never_regresses(spark, tmp_path):
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    vc = VersionCursor(spark, str(tmp_path / "cursor"))
    assert vc.read_version("job") == 0
    vc.upsert("job", 5, "OK")
    assert vc.read_version("job") == 5
    vc.upsert("job", None, "FAIL")  # NULL keeps the cursor
    assert vc.read_version("job") == 5
    vc.upsert("job", 3, "OK")  # stale version can't regress
    assert vc.read_version("job") == 5
    vc.upsert("job", 9, "OK")
    assert vc.read_version("job") == 9


def test_incremental_slice_filters(spark):
    df = spark.createDataFrame(
        [(1, T0, dt.date(2024, 1, 1)), (2, T2, dt.date(2024, 1, 3))],
        "id long, updated_at timestamp, load_date date",
    )
    out = incremental_slice(df, T1, "updated_at", "load_date")
    assert [r["id"] for r in out.collect()] == [2]


def _gdpr_requests(spark):
    return spark.createDataFrame(
        [
            # new-style processed erasure
            (1, None, "passenger", 10, "erasure", "processed", T1),
            # legacy shape: passenger_id only
            (2, 11, None, None, "erasure", "processed", T1),
            # must be ignored: wrong type / not processed
            (3, None, "passenger", 12, "access", "processed", T1),
            (4, None, "driver", 20, "erasure", "pending", None),
            (5, None, "driver", 21, "erasure", "processed", T1),
            (6, None, "vehicle", 30, "erasure", "processed", T1),
        ],
        "request_id long, passenger_id long, subject_type string, "
        "subject_id long, request_type string, status string, "
        "processed_at timestamp",
    )


def test_normalize_requests_legacy_and_filtering(spark):
    out = normalize_requests(_gdpr_requests(spark)).collect()
    got = {(r["subject_type"], r["subject_id"]) for r in out}
    assert got == {
        ("passenger", 10),
        ("passenger", 11),
        ("driver", 21),
        ("vehicle", 30),
    }


def test_propagate_erasure_all_layers_and_prev(spark, tmp_path):
    pass_ddl = (
        "passenger_id long, full_name string, email string, phone string, "
        "city string, is_current boolean"
    )
    silver = MergeTable(spark, str(tmp_path / "silver_pass"))
    silver.create(
        spark.createDataFrame(
            [
                (10, "Alice", "a@x.com", "1", "Rome", False),  # history version
                (10, "Alice2", "a2@x.com", "1", "Rome", True),
                (99, "Bob", "b@x.com", "2", "Oslo", True),
            ],
            pass_ddl,
        )
    )
    scd3_ddl = (
        "passenger_id long, full_name string, email string, phone string, "
        "city string, prev_full_name string, prev_email string, "
        "prev_phone string, prev_city string"
    )
    scd3 = MergeTable(spark, str(tmp_path / "scd3_pass"))
    scd3.create(
        spark.createDataFrame(
            [(10, "Alice2", "a2@x.com", "1", "Rome", "Alice", "a@x.com", "1", "Rome")],
            scd3_ddl,
        )
    )
    veh = MergeTable(spark, str(tmp_path / "veh"))
    veh.create(
        spark.createDataFrame(
            [(30, "AB-123", "fiat", "500"), (31, "CD-456", "vw", "golf")],
            "vehicle_id long, plate_number string, make string, model string",
        )
    )
    audit = AuditLog(spark, str(tmp_path / "audit"), salt="s3cr3t")
    counts = propagate_erasure(
        spark,
        _gdpr_requests(spark),
        {
            "silver": {"passengers": silver, "vehicles": veh},
            "gold": {"passengers:prev": scd3},
        },
        audit=audit,
    )
    assert counts == {"passenger": 2, "driver": 1, "vehicle": 1}
    # every version of passenger 10 redacted, passenger 99 untouched
    got = {(r["full_name"], r["email"]) for r in
           silver.read().filter("passenger_id = 10").collect()}
    assert got == {("ANONYMIZED", None)}
    assert silver.read().filter("passenger_id = 99").first()["full_name"] == "Bob"
    # SCD3: prev_* columns redacted too
    r = scd3.read().first()
    assert r["full_name"] == "ANONYMIZED" and r["prev_full_name"] == "ANONYMIZED"
    assert r["email"] is None and r["prev_email"] is None
    # vehicle: deterministic plate, other vehicle untouched
    plates = {r["vehicle_id"]: r["plate_number"] for r in veh.read().collect()}
    assert plates == {30: "ANON-PLATE-30", 31: "CD-456"}
    # audit: fingerprint is salted hash, not the raw id
    arow = audit.table.read().first()
    assert arow["subject_fingerprint"] != "10"
    assert "full_name" in arow["columns_scrubbed"]


def test_affected_trip_ids_and_scrub(spark, tmp_path):
    trips = spark.createDataFrame(
        [(100, 10, 20), (101, 11, 21), (102, 12, 22)],
        "trip_id long, passenger_id long, driver_id long",
    )
    subjects = spark.createDataFrame([(10,), (21,)], "subject_id long")
    ids = affected_trip_ids(trips, subjects, ["passenger_id", "driver_id"])
    assert {r["trip_id"] for r in ids.collect()} == {100, 101}

    ratings = MergeTable(spark, str(tmp_path / "ratings"))
    ratings.create(
        spark.createDataFrame(
            [(100, "has PII"), (101, None), (102, "keep me")],
            "trip_id long, comment string",
        )
    )
    scrub_column(ratings, ids, "trip_id", "comment")
    got = {r["trip_id"]: r["comment"] for r in ratings.read().collect()}
    assert got == {100: None, 101: None, 102: "keep me"}


def test_retention_closed_history_only(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame(
            [
                (1, False, dt.datetime(2023, 1, 1)),   # old closed → delete
                (2, False, dt.datetime(2024, 6, 1)),   # recent closed → keep
                (3, True, None),                       # current → keep
            ],
            "id long, is_current boolean, valid_to timestamp",
        )
    )
    apply_retention(
        t, closed_history_predicate(365, now=dt.datetime(2024, 12, 31))
    )
    assert {r["id"] for r in t.read().collect()} == {2, 3}


def test_recompute_affected_late_data(spark, tmp_path):
    fact_rows = [
        ("2024-01-01", 100, 10.0, T0),
        ("2024-01-01", 101, 20.0, T0),
        ("2024-01-02", 102, 5.0, T0),
    ]
    ddl = "d string, trip_id long, fare double, raw_loaded_at timestamp"
    fact = spark.createDataFrame(fact_rows, ddl)
    measures = {
        "n_trips": F.count(F.lit(1)),
        "revenue": F.sum("fare"),
        "max_raw_loaded_at": F.max("raw_loaded_at"),
    }
    agg = MergeTable(spark, str(tmp_path / "agg"))
    upsert_aggregate(
        agg, recompute_affected(fact, fact, ["d"], measures), ["d"],
        freshness_col="max_raw_loaded_at",
    )
    # late arrival for an already-aggregated date → full recompute of that date
    late = spark.createDataFrame([("2024-01-01", 103, 7.0, T1)], ddl)
    fact2 = fact.unionByName(late)
    upsert_aggregate(
        agg, recompute_affected(fact2, late, ["d"], measures), ["d"],
        freshness_col="max_raw_loaded_at",
    )
    got = {r["d"]: (r["n_trips"], r["revenue"]) for r in agg.read().collect()}
    assert got == {"2024-01-01": (3, 37.0), "2024-01-02": (1, 5.0)}
