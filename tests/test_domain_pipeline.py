"""End-to-end mobility pipeline: OLTP batches → Bronze → Silver → Gold →
GDPR, over two incremental runs with churn, noise, and late data —
the FIXTURES.md §A scenario on the config-driven engine."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.domain import config as C
from urban_mobility_data_pipeline_spark.domain import jobs as J
from urban_mobility_data_pipeline_spark.operators.gdpr import (
    AuditLog,
    propagate_erasure,
)

D0 = dt.datetime(2024, 3, 1, 8, 0)
D1 = dt.datetime(2024, 3, 1, 9, 0)
D2 = dt.datetime(2024, 3, 2, 9, 0)

TRIPS_DDL = (
    "trip_id long, passenger_id long, driver_id long, vehicle_id long, "
    "pickup_zone_id long, dropoff_zone_id long, status string, "
    "requested_at timestamp, accepted_at timestamp, started_at timestamp, "
    "ended_at timestamp, canceled_at timestamp, cancel_reason string, "
    "cancel_by string, cancel_note string, estimated_distance_km double, "
    "actual_distance_km double, fare_amount double, start_lat double, "
    "start_lng double, end_lat double, end_lng double, "
    "created_at timestamp, updated_at timestamp"
)

PASSENGERS_DDL = (
    "passenger_id long, full_name string, email string, phone string, "
    "city string, is_deleted boolean, deleted_at timestamp, "
    "created_at timestamp, updated_at timestamp"
)

ZONES_DDL = "zone_id long, zone_name string, city string, region string, created_at timestamp"


def _trip(tid, status="completed", est=5.0, act=6.0, fare=12.5, upd=D0,
          ended=True, note=None, pid=1, did=1, vid=1, pz=1, dz=2):
    t0 = D0
    return (
        tid, pid, did, vid, pz, dz, status,
        t0, t0 + dt.timedelta(minutes=2), t0 + dt.timedelta(minutes=5),
        (t0 + dt.timedelta(minutes=25)) if ended else None,
        None, None, None, note, est, act, fare,
        41.1, 2.1, 41.2, 2.2, t0, upd,
    )


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake"))
    lake = J.Lakehouse(spark, root)

    trips1 = spark.createDataFrame(
        [
            _trip(1),
            _trip(2, status="  Completed ", act=None),        # flag: null dist on completed
            _trip(3, status="requested", act=4.0),            # flag: dist in invalid status
            _trip(4, est=5.0, act=25.0),                      # flag: outlier |diff|>10
            _trip(5, fare=-7.0, note="  NULL "),              # clamp fare, scrub note
        ],
        TRIPS_DDL,
    )
    passengers1 = spark.createDataFrame(
        [
            (1, "Alice A", "ALICE@x.com ", "111", "Rome", False, None, D0, D0),
            (2, "Bob B", "not-an-email", "222", "Oslo", False, None, D0, D0),
            (3, "Eve E", "eve@x.com", "333", "Bern", True, D0, D0, D0),  # safety belt
        ],
        PASSENGERS_DDL,
    )
    zones1 = spark.createDataFrame(
        [(1, "Centre", "Rome", "EU", D0), (2, " Port ", "Rome", "EU", D0)],
        ZONES_DDL,
    )

    assert J.bronze_ingest(lake, C.TRIPS, trips1, now=D1) == 5
    assert J.bronze_ingest(lake, C.PASSENGERS, passengers1, now=D1) == 3
    assert J.bronze_ingest(lake, C.ZONES, zones1, now=D1) == 2
    J.silver_apply(lake, C.TRIPS)
    J.silver_apply(lake, C.PASSENGERS)
    J.silver_apply(lake, C.ZONES)

    # ---- run 2: churn (trip 1 status change), new trip w/ orphan FK ----
    trips2 = spark.createDataFrame(
        [
            _trip(1, status="canceled", upd=D2),              # version 2
            _trip(6, pid=99, pz=77, upd=D2),                  # orphan passenger+zone
            _trip(2, status="  Completed ", act=None, upd=D0),  # stale: must be ignored
        ],
        TRIPS_DDL,
    )
    assert J.bronze_ingest(lake, C.TRIPS, trips2, now=D2) == 2  # stale row filtered
    J.silver_apply(lake, C.TRIPS)
    J.silver_apply(lake, C.PASSENGERS)  # no new data — no-op

    # ---- gold ----
    J.build_static_dim(
        lake, "dim_zone",
        J.silver_current(lake, "zones").select("zone_id", "zone_name", "city"),
    )
    J.build_snapshot_dim(lake, C.PASSENGERS, "dim_passenger")
    J.build_hist_dim(lake, C.PASSENGERS, "dim_passenger_hist")
    J.build_scd3_dim(lake, C.PASSENGERS, "dim_passenger_scd3",
                     tracked_cols=["full_name", "email", "city"])
    J.build_fact_trips(lake)
    J.build_agg_trips_daily(lake)
    J.build_agg_driver_daily(lake)
    return lake


def test_bronze_incremental_watermark(lake):
    bronze = lake.table("bronze", "trips").read()
    assert bronze.count() == 7  # 5 + 2 (stale row excluded by watermark)
    assert lake.control.read_watermark("trips_bronze") == D2


def test_silver_cleaning_and_flags(lake):
    cur = J.silver_current(lake, "trips")
    rows = {r["trip_id"]: r for r in cur.collect()}
    assert rows[2]["status"] == "completed"          # lower(trim)
    assert rows[5]["fare_amount"] is None            # negative clamped
    assert rows[5]["cancel_note"] is None            # null-like scrubbed
    assert rows[2]["has_distance_in_invalid_status"] is True   # null dist, completed
    assert rows[3]["has_distance_in_invalid_status"] is True   # dist in requested
    assert rows[4]["has_distance_in_invalid_status"] is False  # completed w/ dist
    assert rows[1]["has_distance_in_invalid_status"] is True   # canceled w/ dist>0
    assert rows[4]["is_distance_outlier"] is True
    assert rows[4]["distance_diff_km"] == 20.0
    assert rows[1]["accepted_before_requested"] is False


def test_silver_scd2_versions(lake):
    hist = lake.table("silver", "trips").read().filter(F.col("trip_id") == 1)
    vs = sorted(hist.collect(), key=lambda r: r["valid_from"])
    assert len(vs) == 2
    assert vs[0]["is_current"] is False and vs[0]["status"] == "completed"
    assert vs[1]["is_current"] is True and vs[1]["status"] == "canceled"
    assert vs[0]["valid_to"] == vs[1]["valid_from"]


def test_passenger_safety_belt_and_email_flags(lake):
    cur = {r["passenger_id"]: r for r in
           J.silver_current(lake, "passengers").collect()}
    assert cur[3]["full_name"] == "ANONYMIZED" and cur[3]["email"] is None
    assert cur[2]["invalid_email"] is True
    assert cur[1]["email"] == "alice@x.com"  # lower(trim)


def test_gold_fact_orphans_to_unknown(lake):
    fact = {r["trip_id"]: r for r in
            lake.table("gold", "fact_trips").read().collect()}
    assert len(fact) == 6
    assert fact[6]["passenger_key"] == 0      # orphan passenger 99 → UNKNOWN
    assert fact[6]["pickup_zone_key"] == 0    # orphan zone 77 → UNKNOWN
    assert fact[1]["passenger_key"] == 1
    assert fact[1]["status"] == "canceled"    # SCD1: newest version won


def test_gold_aggregates(lake):
    agg = lake.table("gold", "agg_trips_daily").read().collect()
    assert len(agg) == 1  # all trips requested on the same date
    row = agg[0]
    assert row["total_trips"] == 6
    assert row["canceled_trips"] == 1
    drv = lake.table("gold", "agg_driver_daily").read().collect()
    assert sum(r["n_trips"] for r in drv) == 6


def test_gold_dims_flavors(lake):
    snap = {r["passenger_id"]: r for r in
            lake.table("gold", "dim_passenger").read().collect()}
    assert len(snap) == 3 and snap[3]["full_name"] == "ANONYMIZED"
    hist = lake.table("gold", "dim_passenger_hist").read()
    assert hist.filter("is_current").count() == 3
    scd3 = lake.table("gold", "dim_passenger_scd3").read().columns
    assert "prev_full_name" in scd3


def test_gdpr_propagation_over_lake(lake, spark):
    requests = spark.createDataFrame(
        [(1, None, "passenger", 1, "erasure", "processed", D2)],
        "request_id long, passenger_id long, subject_type string, "
        "subject_id long, request_type string, status string, "
        "processed_at timestamp",
    )
    audit = AuditLog(spark, lake.path("gdpr", "audit"), salt="it")
    counts = propagate_erasure(
        spark,
        requests,
        {
            "silver": {"passengers": lake.table("silver", "passengers")},
            "gold": {
                "passengers": lake.table("gold", "dim_passenger"),
                "passengers:prev": lake.table("gold", "dim_passenger_scd3"),
            },
        },
        audit=audit,
    )
    assert counts["passenger"] == 1
    for tbl in ("silver/passengers", "gold/dim_passenger"):
        layer, name = tbl.split("/")
        got = lake.table(layer, name).read().filter("passenger_id = 1").collect()
        assert all(r["full_name"] == "ANONYMIZED" and r["email"] is None
                   for r in got), tbl
    assert audit.table.read().count() == 3


RATINGS_DDL = (
    "rating_id long, trip_id long, passenger_id long, driver_id long, "
    "score int, comment string, created_at timestamp, updated_at timestamp"
)


def test_run_gdpr_and_retention_full_lake(spark, tmp_path):
    lake = J.Lakehouse(spark, str(tmp_path / "lake2"))
    trips = spark.createDataFrame(
        [_trip(1, pid=10, note="call me at 555-1234"),
         _trip(2, pid=11, note="fine")],
        TRIPS_DDL,
    )
    passengers = spark.createDataFrame(
        [(10, "Target T", "t@x.com", "1", "Rome", False, None, D0, D0),
         (11, "Keep K", "k@x.com", "2", "Oslo", False, None, D0, D0)],
        PASSENGERS_DDL,
    )
    ratings = spark.createDataFrame(
        [(1, 1, 10, 1, 5, "driver was Target T", D0, D0),
         (2, 2, 11, 1, 4, "all good", D0, D0)],
        RATINGS_DDL,
    )
    J.bronze_ingest(lake, C.TRIPS, trips, now=D1)
    J.bronze_ingest(lake, C.PASSENGERS, passengers, now=D1)
    J.bronze_ingest(lake, C.RATINGS, ratings, now=D1)
    for cfg in (C.TRIPS, C.PASSENGERS, C.RATINGS):
        J.silver_apply(lake, cfg)
    J.build_snapshot_dim(lake, C.PASSENGERS, "dim_passenger")

    requests = spark.createDataFrame(
        [(1, None, "passenger", 10, "erasure", "processed", D2)],
        "request_id long, passenger_id long, subject_type string, "
        "subject_id long, request_type string, status string, "
        "processed_at timestamp",
    )
    counts = J.run_gdpr(lake, requests, salt="pepper")
    assert counts["passenger"] == 1
    # entity anonymized in silver + gold
    assert J.silver_current(lake, "passengers").filter(
        "passenger_id = 10").first()["full_name"] == "ANONYMIZED"
    assert lake.table("gold", "dim_passenger").read().filter(
        "passenger_id = 10").first()["full_name"] == "ANONYMIZED"
    # free-text scrubbed only for affected trips (semi-join derivation)
    r = {x["rating_id"]: x["comment"]
         for x in lake.table("silver", "ratings").read().collect()}
    assert r[1] is None and r[2] == "all good"
    t = {x["trip_id"]: x["cancel_note"]
         for x in lake.table("silver", "trips").read().collect()}
    assert t[1] is None and t[2] == "fine"
    # audit rows exist and carry no raw ids
    audit = lake.table("gdpr", "audit").read().collect()
    assert audit and all(a["subject_fingerprint"] != "10" for a in audit)
    # physical erasure: run_gdpr vacuums mutated tables, so no silver or
    # gold parquet file still holds the subject's PII bytes (the
    # pre-anonymization snapshots are deleted, not just dereferenced)
    import glob as _glob
    import os as _os
    for layer in ("silver", "gold"):
        for f in _glob.glob(
            _os.path.join(str(tmp_path / "lake2"), layer, "**", "*.parquet"),
            recursive=True,
        ):
            assert b"Target T" not in open(f, "rb").read(), f

    # retention: everything is recent vs now=D2 → nothing deleted
    before = lake.table("bronze", "trips").read().count()
    J.run_retention(lake, bronze_days=30, silver_days=365, now=D2)
    assert lake.table("bronze", "trips").read().count() == before
    # with aggressive horizon, bronze ages out; silver current rows survive
    J.run_retention(lake, bronze_days=0, silver_days=0,
                    now=D2 + dt.timedelta(days=1))
    assert lake.table("bronze", "trips").read().count() == 0
    assert J.silver_current(lake, "trips").count() == 2  # current never ages


def test_zones_norm_columns_and_flags(spark, tmp_path):
    lake = J.Lakehouse(spark, str(tmp_path / "lake3"))
    zones = spark.createDataFrame(
        [(1, "  Centre ", "Rome", "EU", D0), (2, None, "Oslo", "EU", D0)],
        ZONES_DDL,
    )
    J.bronze_ingest(lake, C.ZONES, zones, now=D1)
    J.silver_apply(lake, C.ZONES)
    rows = {r["zone_id"]: r for r in J.silver_current(lake, "zones").collect()}
    assert rows[1]["zone_name_norm"] == "centre"   # trim via scrub + lower norm
    assert rows[2]["zone_name_is_null"] is True
    assert rows[1]["zone_name_is_null"] is False


PAYMENTS_DDL = (
    "payment_id long, trip_id long, method string, status string, "
    "amount decimal(12,2), currency string, provider_ref string, "
    "paid_at timestamp, created_at timestamp, updated_at timestamp"
)


def test_payments_star_and_dim_date(spark, tmp_path):
    from decimal import Decimal

    lake = J.Lakehouse(spark, str(tmp_path / "lake4"))
    trips = spark.createDataFrame([_trip(1), _trip(2)], TRIPS_DDL)
    payments = spark.createDataFrame(
        [
            (1, 1, " Card ", "paid", Decimal("12.50"), "eur", "gw_abc", D0, D0, D0),
            (2, 2, "cash", "paid", Decimal("-3.00"), "EURO", None, D0, D0, D0),
        ],
        PAYMENTS_DDL,
    )
    J.bronze_ingest(lake, C.TRIPS, trips, now=D1)
    J.bronze_ingest(lake, C.PAYMENTS, payments, now=D1)
    J.silver_apply(lake, C.TRIPS)
    J.silver_apply(lake, C.PAYMENTS)
    J.build_dim_date(lake)
    J.build_dim_payment_method(lake)
    J.build_fact_payments(lake)

    dim_date = lake.table("gold", "dim_date").read()
    assert dim_date.filter("date_key = 0").count() == 1  # UNKNOWN row
    assert dim_date.count() >= 2

    dim = {r["method"]: r["payment_method_key"]
           for r in lake.table("gold", "dim_payment_method").read().collect()}
    assert "card" in dim and "cash" in dim and dim["unknown"] == 0

    fact = {r["payment_id"]: r for r in
            lake.table("gold", "fact_payments").read().collect()}
    assert fact[1]["payment_method_key"] == dim["card"]  # validated FK
    assert fact[2]["amount"] is None        # negative clamped in silver
    cur = {r["payment_id"]: r for r in
           J.silver_current(lake, "payments").collect()}
    assert cur[2]["currency"] is None       # len != 3 clamped
    assert cur[1]["currency"] == "EUR"      # upper(trim)


# ---------------------------------------------------------------------------
# Gold dim flavor matrix: snapshot/hist/scd3 × passenger/driver/vehicle —
# mirrors the reference's 9 run scripts
# (scripts/run/gold/_conformed/{snapshot,hist,scd3}/run_dim_*.sh)
# ---------------------------------------------------------------------------

DRIVERS_DDL = (
    "driver_id long, full_name string, license_number string, "
    "status string, is_deleted boolean, created_at timestamp, "
    "updated_at timestamp"
)
VEHICLES_DDL = (
    "vehicle_id long, driver_id long, plate_number string, "
    "vehicle_type string, make string, model string, year int, "
    "status string, created_at timestamp, updated_at timestamp"
)

_DIM_CASES = {
    "passengers": (
        C.PASSENGERS,
        PASSENGERS_DDL,
        # (key, tracked-col value, fill...) — batch rows built below
        lambda v, upd: [
            (1, v, "a@x.com", "111", "Rome", False, None, D0, upd),
            (2, "Stay S", "s@x.com", "222", "Oslo", False, None, D0, upd),
        ],
        "full_name",
        ["full_name", "email", "city"],
    ),
    "drivers": (
        C.DRIVERS,
        DRIVERS_DDL,
        lambda v, upd: [
            (1, v, "LIC-1", "active", False, D0, upd),
            (2, "Stay S", "LIC-2", "active", False, D0, upd),
        ],
        "full_name",
        ["full_name", "status"],
    ),
    "vehicles": (
        C.VEHICLES,
        VEHICLES_DDL,
        lambda v, upd: [
            (1, 1, "AB123", "sedan", v, "M3", 2020, "active", D0, upd),
            (2, 1, "CD456", "sedan", "Stay", "M5", 2021, "active", D0, upd),
        ],
        "make",
        ["make", "status"],
    ),
}


@pytest.mark.parametrize("entity", ["passengers", "drivers", "vehicles"])
def test_gold_dim_flavors_all_entities(spark, tmp_path, entity):
    cfg, ddl, mk_rows, tracked_col, scd3_tracked = _DIM_CASES[entity]
    lake = J.Lakehouse(spark, str(tmp_path / "lake"))
    key = cfg.business_key
    ent = cfg.name[:-1]

    # run 1: two keys; run 2: key 1 changes the tracked column
    b1 = spark.createDataFrame(mk_rows("Old V", D0), ddl)
    assert J.bronze_ingest(lake, cfg, b1, now=D1) == 2
    J.silver_apply(lake, cfg)
    for flavor in ("snapshot", "hist", "scd3"):
        if flavor == "snapshot":
            J.build_snapshot_dim(lake, cfg, f"dim_{ent}")
        elif flavor == "hist":
            J.build_hist_dim(lake, cfg, f"dim_{ent}_hist")
        else:
            J.build_scd3_dim(lake, cfg, f"dim_{ent}_scd3", scd3_tracked)

    changed = spark.createDataFrame(mk_rows("New V", D2)[:1], ddl)
    assert J.bronze_ingest(lake, cfg, changed, now=D2) == 1
    J.silver_apply(lake, cfg)
    J.build_snapshot_dim(lake, cfg, f"dim_{ent}")
    J.build_hist_dim(lake, cfg, f"dim_{ent}_hist")
    J.build_scd3_dim(lake, cfg, f"dim_{ent}_scd3", scd3_tracked)

    # vehicles' tracked col is normalized by silver scrub only (trim) —
    # values survive as written; passengers/drivers likewise
    new_v, old_v = "New V", "Old V"

    # snapshot (SCD1): one row per key, key 1 updated
    snap = {r[key]: r[tracked_col]
            for r in lake.table("gold", f"dim_{ent}").read().collect()}
    assert snap == {1: new_v, 2: "Stay S"} if entity != "vehicles" else \
        snap == {1: new_v, 2: "Stay"}

    # hist (SCD2): key 1 has closed old + current new; key 2 one current
    hist = lake.table("gold", f"dim_{ent}_hist").read()
    k1 = hist.filter(F.col(key) == 1).collect()
    assert len(k1) == 2
    cur = [r for r in k1 if r["is_current"]]
    old = [r for r in k1 if not r["is_current"]]
    assert len(cur) == 1 and cur[0][tracked_col] == new_v
    assert len(old) == 1 and old[0][tracked_col] == old_v
    assert old[0]["valid_to"] is not None
    assert hist.filter(F.col(key) == 2).count() == 1

    # scd3: key 1 current=new, prev=old; key 2 prev NULL
    scd3 = {r[key]: (r[tracked_col], r[f"prev_{tracked_col}"])
            for r in lake.table("gold", f"dim_{ent}_scd3").read().collect()}
    assert scd3[1] == (new_v, old_v)
    assert scd3[2][1] is None


def test_silver_apply_changes_matches_watermark_path(spark, tmp_path):
    """The version-cursor Bronze→Silver (read_changes off the manifest
    log) produces the same silver state as the timestamp-watermark path
    across two incremental batches, and drains nothing when re-run."""
    lake_wm = J.Lakehouse(spark, str(tmp_path / "wm"))
    lake_cdf = J.Lakehouse(spark, str(tmp_path / "cdf"))
    cfg = C.PASSENGERS

    b1 = spark.createDataFrame(
        [(1, "Ann A", "a@x.com", "1", "Rome", False, None, D0, D0),
         (2, "Bob B", "b@x.com", "2", "Oslo", False, None, D0, D0)],
        PASSENGERS_DDL,
    )
    b2 = spark.createDataFrame(
        [(1, "Ann Moved", "a@x.com", "1", "Paris", False, None, D0, D2)],
        PASSENGERS_DDL,
    )
    for lk in (lake_wm, lake_cdf):
        J.bronze_ingest(lk, cfg, b1, now=D1)
    assert J.silver_apply(lake_wm, cfg) == 2
    assert J.silver_apply_changes(lake_cdf, cfg) == 2
    for lk in (lake_wm, lake_cdf):
        J.bronze_ingest(lk, cfg, b2, now=D2)
    assert J.silver_apply(lake_wm, cfg) == 1
    assert J.silver_apply_changes(lake_cdf, cfg) == 1
    # cursor drained: an immediate re-run consumes nothing
    assert J.silver_apply_changes(lake_cdf, cfg) == 0

    cols = ["passenger_id", "full_name", "city", "is_current", "valid_to"]
    wm_rows = sorted(
        tuple(r[c] for c in cols)
        for r in lake_wm.table("silver", cfg.name).read().collect()
    )
    cdf_rows = sorted(
        tuple(r[c] for c in cols)
        for r in lake_cdf.table("silver", cfg.name).read().collect()
    )
    assert wm_rows == cdf_rows
    assert len(wm_rows) == 3  # 2 current + 1 closed SCD2 version
