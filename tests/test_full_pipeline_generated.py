"""Full pipeline soak on generated chaos data: 2 incremental runs over
all 7 tables → all gold builds → GDPR → retention, asserting global
invariants rather than single rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.domain import config as C
from urban_mobility_data_pipeline_spark.domain import jobs as J
from urban_mobility_data_pipeline_spark.domain.generator import (
    MobilityGenerator,
    T0,
)

B1 = T0 + dt.timedelta(hours=4)
B2 = T0 + dt.timedelta(days=1)


def test_generated_end_to_end(spark, tmp_path):
    gen = MobilityGenerator(spark, seed=7)
    lake = J.Lakehouse(spark, str(tmp_path / "lake"))

    # ---- batch 1 ----
    sources = {
        "passengers": gen.passengers(),
        "drivers": gen.drivers(),
        "vehicles": gen.vehicles(),
        "zones": gen.zones(),
    }
    trips1 = gen.trips(200, at=B1)
    for name, df in sources.items():
        J.bronze_ingest(lake, C.ALL_TABLES[name], df, now=B1)
    J.bronze_ingest(lake, C.TRIPS, trips1, now=B1)
    for name in ("passengers", "drivers", "vehicles", "zones", "trips"):
        J.silver_apply(lake, C.ALL_TABLES[name])

    # ---- batch 2: churn + new trips ----
    updates = gen.trip_updates(trips1, 0.3, at=B2)
    trips2 = gen.trips(80, at=B2).unionByName(updates)
    J.bronze_ingest(lake, C.TRIPS, trips2, now=B2)
    J.silver_apply(lake, C.TRIPS)

    # ---- gold ----
    J.build_static_dim(
        lake, "dim_zone",
        J.silver_current(lake, "zones").select("zone_id", "zone_name_norm", "city"),
    )
    J.build_dim_date(lake)
    J.build_snapshot_dim(lake, C.PASSENGERS, "dim_passenger")
    J.build_snapshot_dim(lake, C.DRIVERS, "dim_driver")
    J.build_snapshot_dim(lake, C.VEHICLES, "dim_vehicle")
    J.build_hist_dim(lake, C.PASSENGERS, "dim_passenger_hist")
    J.build_fact_trips(lake)
    J.build_agg_trips_daily(lake)
    J.build_agg_driver_daily(lake)

    silver_trips = lake.table("silver", "trips").read()
    cur = silver_trips.filter("is_current")

    # invariant: exactly one current version per key
    assert cur.groupBy("trip_id").count().filter("count > 1").count() == 0
    assert cur.count() == 280
    # churned trips actually have history
    n_hist = silver_trips.filter("NOT is_current").count()
    assert n_hist > 0
    # noise produced flags and clamps (chaos rates > 0)
    assert cur.filter("has_distance_in_invalid_status").count() > 0
    assert cur.filter("actual_distance_km < 0").count() == 0  # clamped
    assert cur.filter("cancel_note IS NOT NULL").count() > 0
    # enum normalization happened
    bad_status = cur.filter(
        ~F.col("status").isin("requested", "accepted", "started",
                              "completed", "canceled")
    )
    assert bad_status.count() == 0

    # fact: every trip exactly once, FKs validated (0 allowed, nulls not)
    fact = lake.table("gold", "fact_trips").read()
    assert fact.count() == 280
    assert fact.filter("passenger_key IS NULL").count() == 0

    # aggregates reconcile with the fact
    agg = lake.table("gold", "agg_trips_daily").read()
    assert agg.agg(F.sum("total_trips")).first()[0] == 280

    # safety belt: every is_deleted passenger is anonymized in silver
    deleted = J.silver_current(lake, "passengers").filter("is_deleted")
    assert deleted.filter("full_name <> 'ANONYMIZED'").count() == 0

    # ---- GDPR over generated data ----
    req = gen.gdpr_requests([("passenger", 1), ("driver", 2)], at=B2)
    counts = J.run_gdpr(lake, req, salt="soak")
    assert counts == {"passenger": 1, "driver": 1, "vehicle": 0}
    p1 = lake.table("silver", "passengers").read().filter("passenger_id = 1")
    assert p1.filter("full_name <> 'ANONYMIZED'").count() == 0
    d2 = lake.table("gold", "dim_driver").read().filter("driver_id = 2").first()
    assert d2["license_number"] is None and d2["status"] == "inactive"
    # every SCD2 history version in the gold hist dim is anonymized too —
    # a redaction must hit every version (gdpr:725-869); guards the
    # ':hist' registration key in run_gdpr
    hist1 = (
        lake.table("gold", "dim_passenger_hist")
        .read()
        .filter("passenger_id = 1")
    )
    assert hist1.count() > 0
    assert hist1.filter(
        "full_name <> 'ANONYMIZED' OR email IS NOT NULL "
        "OR phone IS NOT NULL OR city IS NOT NULL"
    ).count() == 0

    # ---- retention keeps currents ----
    J.run_retention(lake, bronze_days=0, silver_days=0,
                    now=B2 + dt.timedelta(days=2))
    assert J.silver_current(lake, "trips").count() == 280
    assert lake.table("silver", "trips").read().filter(
        "NOT is_current").count() == 0  # closed history aged out
