"""Deterministic synthetic OLTP generator for the mobility domain.

Test tooling mirroring the reference's chaos generator
(``scripts/generate_oltp_data/generate_oltp_data.py``): seeded noise at
the documented rates (BROKEN_RATE 0.20, null-like notes 0.10, time
weirdness 0.03, out-of-range coords 0.01, missing ended_at 0.02,
comment PII 0.05 — reference ``:53-101``) so the Silver DQ flags have
work to do. Pure driver-side Python (like the reference's psycopg2
client); production ingest reads JDBC instead.

Deterministic: same seed → byte-identical batches, so pipeline tests can
assert exact counts.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

T0 = dt.datetime(2024, 3, 1, 6, 0)

STATUSES = ["requested", "accepted", "started", "completed", "canceled"]
NULL_LIKES = ["NULL", "n/a", "-", "", "  null "]
CITIES = ["Rome", "Oslo", "Bern", "Porto", "Lyon", "Graz"]


class MobilityGenerator:
    def __init__(self, spark: SparkSession, seed: int = 42,
                 n_passengers: int = 60, n_drivers: int = 15):
        self.spark = spark
        self.rng = random.Random(seed)
        self.n_passengers = n_passengers
        self.n_drivers = n_drivers
        self._trip_seq = 0

    # -- dims ---------------------------------------------------------------
    def passengers(self, deleted_rate: float = 0.05) -> DataFrame:
        rows = []
        for i in range(1, self.n_passengers + 1):
            deleted = self.rng.random() < deleted_rate
            email = (
                self.rng.choice([f"P{i}@Mail.com ", f"p{i}@mail.com",
                                 "not-an-email", None])
            )
            rows.append((i, f"Passenger {i}", email, f"+41{i:07d}",
                         self.rng.choice(CITIES), deleted,
                         T0 if deleted else None, T0, T0))
        return self.spark.createDataFrame(
            rows,
            "passenger_id long, full_name string, email string, phone string,"
            " city string, is_deleted boolean, deleted_at timestamp,"
            " created_at timestamp, updated_at timestamp",
        )

    def drivers(self) -> DataFrame:
        rows = [
            (i, f"Driver {i}",
             self.rng.choice([f"LIC-{i:05d}", "n/a"]),
             self.rng.choice(["active", "active", "inactive", "SUSPENDED?"]),
             False, None, T0, T0)
            for i in range(1, self.n_drivers + 1)
        ]
        return self.spark.createDataFrame(
            rows,
            "driver_id long, full_name string, license_number string,"
            " status string, is_deleted boolean, deleted_at timestamp,"
            " created_at timestamp, updated_at timestamp",
        )

    def vehicles(self) -> DataFrame:
        rows = [
            (i, i, f" zh-{i:04d} ",
             self.rng.choice(["sedan", "hatchback", "motorbike", "hoverboard"]),
             "Make", "Model",
             self.rng.choice([2015, 2020, 1950, 2099]),
             "active", False, None, T0, T0)
            for i in range(1, self.n_drivers + 1)
        ]
        return self.spark.createDataFrame(
            rows,
            "vehicle_id long, driver_id long, plate_number string,"
            " vehicle_type string, make string, model string, year int,"
            " status string, is_deleted boolean, deleted_at timestamp,"
            " created_at timestamp, updated_at timestamp",
        )

    def zones(self, n: int = 12) -> DataFrame:
        rows = [
            (i, self.rng.choice([f"Zone {i}", f"  Zone {i} ", None]),
             self.rng.choice(CITIES), "EU", T0)
            for i in range(1, n + 1)
        ]
        return self.spark.createDataFrame(
            rows,
            "zone_id long, zone_name string, city string, region string,"
            " created_at timestamp",
        )

    # -- facts ----------------------------------------------------------------
    def trips(self, n: int, at: dt.datetime) -> DataFrame:
        """One batch of new trips at logical time ``at``, with the
        reference's noise rates baked in."""
        rng = self.rng
        rows = []
        for _ in range(n):
            self._trip_seq += 1
            tid = self._trip_seq
            status = rng.choice(STATUSES)
            req = at - dt.timedelta(minutes=rng.randint(10, 600))
            acc = req + dt.timedelta(minutes=2)
            sta = acc + dt.timedelta(minutes=3)
            end = sta + dt.timedelta(minutes=rng.randint(5, 60))
            if rng.random() < 0.03:  # time weirdness
                sta, acc = acc, sta
            ended = end if status == "completed" else None
            if status == "completed" and rng.random() < 0.02:
                ended = None  # missing ended_at
            est = round(rng.uniform(1, 30), rng.choice([2, 7]))
            act = (
                None if rng.random() < 0.10
                else round(est + rng.uniform(-2, 2), 3)
            )
            if rng.random() < 0.05:
                act = -abs(act or 1.0)  # negative → must clamp
            fare = round(rng.uniform(5, 80), 2)
            lat = 41.0 + rng.random()
            if rng.random() < 0.01:
                lat = 95.0  # out-of-range
            note = (
                rng.choice(NULL_LIKES) if rng.random() < 0.15
                else ("call me 555-0101" if rng.random() < 0.05 else None)
            )
            rows.append((
                tid, rng.randint(1, self.n_passengers),
                rng.randint(1, self.n_drivers), rng.randint(1, self.n_drivers),
                rng.randint(1, 12), rng.randint(1, 12),
                rng.choice([status, f" {status.title()} "]),
                req, acc, sta, ended,
                None, None, None, note,
                est, act, fare, lat, 2.1, 41.2, 2.2, req, at,
            ))
        return self.spark.createDataFrame(
            rows,
            "trip_id long, passenger_id long, driver_id long, vehicle_id long,"
            " pickup_zone_id long, dropoff_zone_id long, status string,"
            " requested_at timestamp, accepted_at timestamp,"
            " started_at timestamp, ended_at timestamp, canceled_at timestamp,"
            " cancel_reason string, cancel_by string, cancel_note string,"
            " estimated_distance_km double, actual_distance_km double,"
            " fare_amount double, start_lat double, start_lng double,"
            " end_lat double, end_lng double, created_at timestamp,"
            " updated_at timestamp",
        )

    def trip_updates(self, trips_df: DataFrame, frac: float,
                     at: dt.datetime) -> DataFrame:
        """Status-transition churn: a sample of existing trips re-emitted
        with a newer updated_at (reference ≤3000 updates/run)."""
        from pyspark.sql import functions as F

        sample = trips_df.sample(frac, seed=self.rng.randint(0, 9999))
        return sample.withColumns(
            {
                "status": F.lit("completed"),
                "ended_at": F.col("started_at") + F.expr("INTERVAL 20 MINUTES"),
                "updated_at": F.lit(at),
            }
        )

    def gdpr_requests(self, subject_ids: list[tuple[str, int]],
                      at: dt.datetime) -> DataFrame:
        rows = [
            (i + 1, None, stype, sid, "erasure", "processed", at)
            for i, (stype, sid) in enumerate(subject_ids)
        ]
        return self.spark.createDataFrame(
            rows,
            "request_id long, passenger_id long, subject_type string,"
            " subject_id long, request_type string, status string,"
            " processed_at timestamp",
        )
