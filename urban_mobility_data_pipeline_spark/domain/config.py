"""Declarative per-table configs for the urban-mobility domain.

The reference implements each table as a hand-copied ~400-line script
(``src/silver/*_bronze_to_silver.py``); SURVEY.md's design stance is to
collapse them into configs over one engine. Each config captures exactly
the reference's cleaning/casting/flag/hash semantics, cited per field.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class TableConfig:
    name: str
    business_key: str
    #: incremental watermark column in the OLTP source (``updated_at``
    #: everywhere except zones: ``created_at`` —
    #: src/bronze/zones_oltp_to_bronze.py:26-27)
    watermark_col: str = "updated_at"
    casts: Mapping[str, str] = field(default_factory=dict)
    lower_cols: Sequence[str] = ()
    upper_cols: Sequence[str] = ()
    scrub_cols: Sequence[str] = ()
    clamp_non_negative: Sequence[str] = ()
    clamp_int_range: Mapping[str, tuple[int, int]] = field(default_factory=dict)
    clamp_length: Mapping[str, int] = field(default_factory=dict)
    #: SHA-256 change-hash column list (order matters —
    #: silver/trips_bronze_to_silver.py:286-319)
    scd_hash_cols: Sequence[str] = ()
    #: DataFrame -> {flag_name: Column} (reference P9 DQ flags)
    dq_flags: Callable[[DataFrame], dict[str, Column]] | None = None
    #: post-clean redaction hook (passengers GDPR safety belt,
    #: passengers_bronze_to_silver.py:170-192)
    redact: Callable[[DataFrame], DataFrame] | None = None
    #: derived-column hook applied before flags/hash (zones ``*_norm``
    #: columns, zones_bronze_to_silver.py:176-190)
    derive: Callable[[DataFrame], DataFrame] | None = None


def trips_dq_flags(df: DataFrame) -> dict[str, Column]:
    """Trips DQ flags, bit-exact to silver/trips_bronze_to_silver.py:222-281
    (note has_distance_in_invalid_status has two distinct true branches —
    SURVEY.md §7 risk 5)."""
    actual = F.col("actual_distance_km")
    est = F.col("estimated_distance_km")
    diff = F.when(
        actual.isNotNull() & est.isNotNull() & (F.col("status") == "completed"),
        actual - est,
    ).otherwise(F.lit(None))
    return {
        "has_distance_in_invalid_status": F.when(
            actual.isNotNull()
            & (actual > 0)
            & ~F.col("status").isin("completed", "started"),
            F.lit(True),
        )
        .when(actual.isNull() & F.col("status").isin("completed"), F.lit(True))
        .otherwise(F.lit(False)),
        "distance_diff_km": diff,
        "is_distance_outlier": F.when(
            actual.isNotNull() & est.isNotNull() & (F.abs(diff) > 10), F.lit(True)
        ).otherwise(F.lit(False)),
        "completed_but_ended_at_null": F.when(
            (F.col("status") == "completed") & F.col("ended_at").isNull(),
            F.lit(True),
        ).otherwise(F.lit(False)),
        "accepted_before_requested": F.col("accepted_at").isNotNull()
        & F.col("requested_at").isNotNull()
        & (F.col("accepted_at") < F.col("requested_at")),
        "started_before_accepted": F.col("started_at").isNotNull()
        & F.col("accepted_at").isNotNull()
        & (F.col("started_at") < F.col("accepted_at")),
        "ended_before_started": F.col("ended_at").isNotNull()
        & F.col("started_at").isNotNull()
        & (F.col("ended_at") < F.col("started_at")),
    }


def passengers_dq_flags(df: DataFrame) -> dict[str, Column]:
    """passengers_bronze_to_silver.py:222-233."""
    email = F.col("email")
    return {
        "invalid_email": email.isNotNull()
        & ~email.rlike(r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
        "missing_email": email.isNull(),
    }


def passengers_safety_belt(df: DataFrame) -> DataFrame:
    """GDPR safety belt: is_deleted rows are force-anonymized on the way
    into Silver (passengers_bronze_to_silver.py:170-192)."""
    deleted = F.coalesce(F.col("is_deleted"), F.lit(False))
    return df.withColumns(
        {
            "full_name": F.when(deleted, F.lit("ANONYMIZED")).otherwise(
                F.col("full_name")
            ),
            "email": F.when(deleted, F.lit(None)).otherwise(F.col("email")),
            "phone": F.when(deleted, F.lit(None)).otherwise(F.col("phone")),
            "city": F.when(deleted, F.lit(None)).otherwise(F.col("city")),
        }
    )


TRIPS = TableConfig(
    name="trips",
    business_key="trip_id",
    # silver/trips:136-189 — ids→long, measures→double, enums lower(trim),
    # timestamps cast, negatives → NULL
    casts={
        "trip_id": "long",
        "passenger_id": "long",
        "driver_id": "long",
        "vehicle_id": "long",
        "pickup_zone_id": "long",
        "dropoff_zone_id": "long",
        "start_lat": "double",
        "start_lng": "double",
        "end_lat": "double",
        "end_lng": "double",
        "estimated_distance_km": "double",
        "actual_distance_km": "double",
        "fare_amount": "double",
        "requested_at": "timestamp",
        "accepted_at": "timestamp",
        "started_at": "timestamp",
        "ended_at": "timestamp",
        "canceled_at": "timestamp",
    },
    lower_cols=("status", "cancel_reason", "cancel_by"),
    scrub_cols=("cancel_note",),
    clamp_non_negative=(
        "estimated_distance_km",
        "actual_distance_km",
        "fare_amount",
    ),
    scd_hash_cols=(
        "passenger_id",
        "driver_id",
        "vehicle_id",
        "pickup_zone_id",
        "dropoff_zone_id",
        "status",
        "requested_at",
        "accepted_at",
        "started_at",
        "ended_at",
        "canceled_at",
        "estimated_distance_km",
        "actual_distance_km",
        "start_lat",
        "start_lng",
        "end_lat",
        "end_lng",
        "cancel_reason",
        "cancel_by",
        "fare_amount",
        "source_system",
    ),
    dq_flags=trips_dq_flags,
)

PASSENGERS = TableConfig(
    name="passengers",
    business_key="passenger_id",
    casts={"passenger_id": "long", "is_deleted": "boolean",
           "deleted_at": "timestamp"},
    lower_cols=("email",),
    scrub_cols=("full_name", "phone", "city"),
    scd_hash_cols=("full_name", "email", "phone", "city", "is_deleted"),
    dq_flags=passengers_dq_flags,
    redact=passengers_safety_belt,
)

DRIVERS = TableConfig(
    name="drivers",
    business_key="driver_id",
    casts={"driver_id": "long", "is_deleted": "boolean"},
    lower_cols=("status",),
    scrub_cols=("license_number",),
    scd_hash_cols=("full_name", "license_number", "status", "is_deleted"),
    dq_flags=lambda df: {
        # drivers_bronze_to_silver.py:193-196
        "invalid_status": ~F.col("status").isin("active", "inactive", "suspended")
    },
)

VEHICLES = TableConfig(
    name="vehicles",
    business_key="vehicle_id",
    casts={"vehicle_id": "long", "driver_id": "long", "year": "int"},
    lower_cols=("vehicle_type", "status"),
    upper_cols=("plate_number",),
    scrub_cols=("make", "model"),
    clamp_int_range={"year": (1980, 2027)},  # vehicles:216-221 invalid_year
    scd_hash_cols=(
        "driver_id", "plate_number", "vehicle_type", "make", "model",
        "year", "status",
    ),
)

PAYMENTS = TableConfig(
    name="payments",
    business_key="payment_id",
    casts={
        "payment_id": "long",
        "trip_id": "long",
        "amount": "decimal(12,2)",  # payments:147-153 keeps decimal
        "paid_at": "timestamp",
    },
    lower_cols=("method", "status"),
    upper_cols=("currency",),
    scrub_cols=("provider_ref",),
    clamp_non_negative=("amount",),
    clamp_length={"currency": 3},  # payments:154-160
    scd_hash_cols=("trip_id", "method", "status", "amount", "currency",
                   "paid_at"),
)

RATINGS = TableConfig(
    name="ratings",
    business_key="rating_id",
    casts={"rating_id": "long", "trip_id": "long", "passenger_id": "long",
           "driver_id": "long", "score": "int"},
    scrub_cols=("comment",),
    clamp_int_range={"score": (1, 5)},  # ratings:144-150
    scd_hash_cols=("trip_id", "score", "comment"),
)

def zones_derive(df: DataFrame) -> DataFrame:
    """Zones ``*_norm`` lowercase columns (zones_bronze_to_silver.py:176-190);
    the scd_hash is computed over the norm columns (:195-207)."""
    return df.withColumns(
        {f"{c}_norm": F.lower(F.col(c)) for c in ("zone_name", "city", "region")}
    )


def zones_dq_flags(df: DataFrame) -> dict[str, Column]:
    """``*_is_null`` flags (zones_bronze_to_silver.py:136-141)."""
    return {
        f"{c}_is_null": F.col(c).isNull()
        for c in ("zone_name", "city", "region")
    }


ZONES = TableConfig(
    name="zones",
    business_key="zone_id",
    watermark_col="created_at",  # zones_oltp_to_bronze.py:26-27
    casts={"zone_id": "long"},
    scrub_cols=("zone_name", "city", "region"),
    scd_hash_cols=("zone_name_norm", "city_norm", "region_norm"),
    dq_flags=zones_dq_flags,
    derive=zones_derive,
)

ALL_TABLES = {
    c.name: c for c in (TRIPS, PASSENGERS, DRIVERS, VEHICLES, PAYMENTS,
                        RATINGS, ZONES)
}
