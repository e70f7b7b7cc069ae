#!/usr/bin/env python
"""End-to-end domain throughput anchor (README "Throughput anchor").

Generates the reference generator's full run volume in-memory
(BASELINE.md: 10,000 trips + 2,000 passengers + 500 drivers + 500
vehicles + zones per batch, 4,000-row churn batch), then times the
complete lifecycle on a tmp lake:

    bronze ingest (5 tables) → silver SCD2 (clean/dedup/flags/hash/
    merge) → churn batch (bronze+silver again) → gold (dim_zone,
    dim_passenger snapshot/hist/scd3, fact_trips, agg_trips_daily,
    agg_driver_daily)

Prints ONE JSON line: {"metric": "domain_wall_sec", "value": N,
"unit": "sec", "stages": {...}}. Compare against the reference's 30
sequential spark-submit JVM launches of the same volume.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.domain import config as C
from urban_mobility_data_pipeline_spark.domain import jobs as J

D0 = dt.datetime(2024, 3, 1, 8, 0)
D1 = dt.datetime(2024, 3, 1, 9, 0)
D2 = dt.datetime(2024, 3, 2, 9, 0)

N_TRIPS, N_PASS, N_DRV, N_VEH, N_ZONES = 10_000, 2_000, 500, 500, 50
N_CHURN = 4_000


def _ts(base: dt.datetime, offset_col) -> F.Column:
    return F.lit(base).cast("timestamp") + F.make_interval(secs=offset_col)


def gen_trips(spark: SparkSession, n: int, start_id: int, upd: dt.datetime) -> DataFrame:
    """Reference-generator-shaped trips (scripts/generate_oltp_data:
    statuses, coords, distances, fares), built JVM-side via range()."""
    r = spark.range(start_id, start_id + n).withColumnRenamed("id", "trip_id")
    h = F.abs(F.xxhash64("trip_id"))
    status = (
        F.when(h % 10 < 7, "completed")
        .when(h % 10 < 9, "canceled")
        .otherwise("requested")
    )
    t0 = _ts(D0, (F.col("trip_id") % 3600).cast("double"))
    return r.select(
        "trip_id",
        (h % N_PASS + 1).alias("passenger_id"),
        (h % N_DRV + 1).alias("driver_id"),
        (h % N_VEH + 1).alias("vehicle_id"),
        (h % N_ZONES + 1).alias("pickup_zone_id"),
        ((h + 7) % N_ZONES + 1).alias("dropoff_zone_id"),
        status.alias("status"),
        t0.alias("requested_at"),
        (t0 + F.make_interval(secs=F.lit(120.0))).alias("accepted_at"),
        (t0 + F.make_interval(secs=F.lit(300.0))).alias("started_at"),
        F.when(
            status == "completed", t0 + F.make_interval(secs=F.lit(1500.0))
        ).alias("ended_at"),
        F.lit(None).cast("timestamp").alias("canceled_at"),
        F.lit(None).cast("string").alias("cancel_reason"),
        F.lit(None).cast("string").alias("cancel_by"),
        F.when(h % 20 == 0, "  NULL ").alias("cancel_note"),
        ((h % 200).cast("double") / 10).alias("estimated_distance_km"),
        F.when(h % 17 != 0, (h % 220).cast("double") / 10).alias(
            "actual_distance_km"
        ),
        F.when(h % 50 == 0, -5.0)
        .otherwise((h % 500).cast("double") / 10 + 3)
        .alias("fare_amount"),
        (F.lit(41.0) + (h % 100).cast("double") / 1000).alias("start_lat"),
        (F.lit(2.0) + (h % 100).cast("double") / 1000).alias("start_lng"),
        (F.lit(41.1) + (h % 100).cast("double") / 1000).alias("end_lat"),
        (F.lit(2.1) + (h % 100).cast("double") / 1000).alias("end_lng"),
        F.lit(D0).cast("timestamp").alias("created_at"),
        F.lit(upd).cast("timestamp").alias("updated_at"),
    )


def gen_passengers(spark, n, upd):
    r = spark.range(1, n + 1).withColumnRenamed("id", "passenger_id")
    return r.select(
        "passenger_id",
        F.concat(F.lit("Passenger "), F.col("passenger_id")).alias("full_name"),
        F.concat(F.lit("p"), F.col("passenger_id"), F.lit("@example.com")).alias("email"),
        F.concat(F.lit("+1555"), F.lpad(F.col("passenger_id").cast("string"), 7, "0")).alias("phone"),
        F.element_at(
            F.array(F.lit("Rome"), F.lit("Oslo"), F.lit("Bern"), F.lit("Riga")),
            (F.col("passenger_id") % 4 + 1).cast("int"),
        ).alias("city"),
        (F.col("passenger_id") % 97 == 0).alias("is_deleted"),
        F.when(F.col("passenger_id") % 97 == 0, F.lit(D0).cast("timestamp")).alias("deleted_at"),
        F.lit(D0).cast("timestamp").alias("created_at"),
        F.lit(upd).cast("timestamp").alias("updated_at"),
    )


def gen_drivers(spark, n, upd):
    r = spark.range(1, n + 1).withColumnRenamed("id", "driver_id")
    return r.select(
        "driver_id",
        F.concat(F.lit("Driver "), F.col("driver_id")).alias("full_name"),
        F.concat(F.lit("LIC-"), F.col("driver_id")).alias("license_number"),
        F.element_at(
            F.array(F.lit("active"), F.lit("active"), F.lit("inactive"), F.lit("suspended")),
            (F.col("driver_id") % 4 + 1).cast("int"),
        ).alias("status"),
        F.lit(False).alias("is_deleted"),
        F.lit(D0).cast("timestamp").alias("created_at"),
        F.lit(upd).cast("timestamp").alias("updated_at"),
    )


def gen_vehicles(spark, n, upd):
    r = spark.range(1, n + 1).withColumnRenamed("id", "vehicle_id")
    return r.select(
        "vehicle_id",
        (F.col("vehicle_id") % N_DRV + 1).alias("driver_id"),
        F.concat(F.lit("PL"), F.lpad(F.col("vehicle_id").cast("string"), 5, "0")).alias("plate_number"),
        F.lit("sedan").alias("vehicle_type"),
        F.element_at(
            F.array(F.lit("Toyo"), F.lit("Ford"), F.lit("VW")),
            (F.col("vehicle_id") % 3 + 1).cast("int"),
        ).alias("make"),
        F.concat(F.lit("M"), (F.col("vehicle_id") % 9)).alias("model"),
        (F.lit(2015) + (F.col("vehicle_id") % 10)).cast("int").alias("year"),
        F.lit("active").alias("status"),
        F.lit(D0).cast("timestamp").alias("created_at"),
        F.lit(upd).cast("timestamp").alias("updated_at"),
    )


def gen_zones(spark, n):
    r = spark.range(1, n + 1).withColumnRenamed("id", "zone_id")
    return r.select(
        "zone_id",
        F.concat(F.lit("Zone "), F.col("zone_id")).alias("zone_name"),
        F.lit("Rome").alias("city"),
        F.lit("EU").alias("region"),
        F.lit(D0).cast("timestamp").alias("created_at"),
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from urban_mobility_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="umdp-domain-bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus), 8)),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("WARN")
    root = tempfile.mkdtemp(prefix="umdp_domain_bench_")
    lake = J.Lakehouse(spark, root)
    stages: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        stages[name] = round(time.perf_counter() - t0, 2)

    batch1 = {
        "trips": gen_trips(spark, N_TRIPS, 1, D1),
        "passengers": gen_passengers(spark, N_PASS, D1),
        "drivers": gen_drivers(spark, N_DRV, D1),
        "vehicles": gen_vehicles(spark, N_VEH, D1),
        "zones": gen_zones(spark, N_ZONES),
    }
    t_start = time.perf_counter()
    timed("bronze_batch1", lambda: [
        J.bronze_ingest(lake, C.ALL_TABLES[t], df, now=D1)
        for t, df in batch1.items()
    ])
    timed("silver_batch1", lambda: [
        J.silver_apply(lake, C.ALL_TABLES[t]) for t in batch1
    ])
    # churn: 2,000 updated trips + 2,000 brand-new
    churn = gen_trips(spark, N_CHURN // 2, 1, D2).unionByName(
        gen_trips(spark, N_CHURN // 2, N_TRIPS + 1, D2)
    )
    timed("bronze_churn", lambda: J.bronze_ingest(lake, C.TRIPS, churn, now=D2))
    timed("silver_churn", lambda: J.silver_apply(lake, C.TRIPS))
    timed("gold_dims", lambda: [
        J.build_static_dim(
            lake, "dim_zone",
            J.silver_current(lake, "zones").select("zone_id", "zone_name", "city", "region"),
        ),
        J.build_snapshot_dim(lake, C.PASSENGERS, "dim_passenger"),
        J.build_hist_dim(lake, C.PASSENGERS, "dim_passenger_hist"),
        J.build_scd3_dim(lake, C.PASSENGERS, "dim_passenger_scd3",
                         ["full_name", "email", "city"]),
    ])
    timed("gold_fact", lambda: J.build_fact_trips(lake))
    timed("gold_aggs", lambda: [
        J.build_agg_trips_daily(lake),
        J.build_agg_driver_daily(lake),
    ])
    total = round(time.perf_counter() - t_start, 2)

    n_fact = lake.table("gold", "fact_trips").read().count()
    assert n_fact >= N_TRIPS, n_fact
    print(
        json.dumps(
            {
                "metric": "domain_wall_sec",
                "value": total,
                "unit": "sec",
                "stages": stages,
                "fact_rows": n_fact,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
