"""Medallion jobs: Bronze → Silver → Gold for the mobility domain
(SURVEY.md §3 query lifecycle), as thin wiring over the generic engines.

Each job reproduces the corresponding reference entry point
(``src/bronze/<t>_oltp_to_bronze.py:main`` / ``src/silver/…`` /
``src/gold/…``) but is table-agnostic: the per-table variation lives
entirely in :mod:`.config`.

Fixed reference inefficiencies (SURVEY.md §4 "known inefficiencies"):
watermark max is computed from the ingested batch, not by re-reading the
source; no ``.rdd.isEmpty()``; single ``select`` instead of 20+
``withColumn`` chain; window dedup gets deterministic tiebreakers.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.domain.config import TableConfig
from urban_mobility_data_pipeline_spark.functions.hashing import scd_hash
from urban_mobility_data_pipeline_spark.operators.aggregates import (
    recompute_affected,
    upsert_aggregate,
)
from urban_mobility_data_pipeline_spark.operators.cleaning import (
    clamp_domain,
    normalize_strings,
)
from urban_mobility_data_pipeline_spark.operators.dedup import (
    current_and_previous,
    latest_per_key,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.scd import (
    scd1_upsert,
    scd2_apply,
    scd3_apply,
)
from urban_mobility_data_pipeline_spark.operators.star import validate_fk
from urban_mobility_data_pipeline_spark.operators.watermark import (
    ControlTable,
    VersionCursor,
    incremental_slice,
    target_max_watermark,
)

SOURCE_SYSTEM = "mobility_oltp"


class Lakehouse:
    """Path layout + control table for one lake root."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.control = ControlTable(spark, os.path.join(root, "etl_control"))
        self.cursor = VersionCursor(spark, os.path.join(root, "etl_cursor"))

    def path(self, layer: str, name: str) -> str:
        return os.path.join(self.root, layer, name)

    def table(
        self,
        layer: str,
        name: str,
        bucket_keys: tuple[str, ...] | list[str] = (),
        num_buckets: int = 32,
    ) -> MergeTable:
        """``bucket_keys`` is a creation spec: when the handle first
        creates the table it is hive-partitioned by a hidden key-hash
        bucket, so every later MERGE keyed on those columns rewrites only
        touched buckets (O(batch), not O(table)). Existing tables keep
        their persisted layout regardless of the spec. Size
        ``num_buckets`` so table_size/num_buckets is a few hundred MB at
        the deployed scale."""
        return MergeTable(
            self.spark,
            self.path(layer, name),
            bucket_keys=bucket_keys,
            num_buckets=num_buckets,
        )


# ---------------------------------------------------------------------------
# Bronze (reference §3.1: src/bronze/<t>_oltp_to_bronze.py:main)
# ---------------------------------------------------------------------------
def bronze_ingest(
    lake: Lakehouse,
    cfg: TableConfig,
    source: DataFrame,
    now: dt.datetime | None = None,
) -> int:
    """Incremental append of source rows past the watermark, stamped with
    ingestion metadata, partitioned by load_date (bronze/trips:119-153).
    Returns ingested row count. The watermark advances to max(updated_at)
    *of the ingested batch* — computed from the written slice, not a
    second source scan (fixes §3.1 note)."""
    job = f"{cfg.name}_bronze"
    now = now or dt.datetime.utcnow()
    try:
        wm = lake.control.read_watermark(job)
        inc = source.filter(F.col(cfg.watermark_col) > F.lit(wm))
        batch_id = str(uuid.uuid4())
        stamped = inc.select(
            "*",
            F.lit(SOURCE_SYSTEM).alias("source_system"),
            F.lit(now).alias("raw_loaded_at"),
            F.lit(batch_id).alias("batch_id"),
            F.lit(now.date()).alias("load_date"),
        )
        # one action: write, then count+max from the written partition
        target = lake.table("bronze", cfg.name)
        if target.exists():
            target.append(stamped, partition_by=["load_date"])
        else:
            target.create(stamped, partition_by=["load_date"])
        # load_date equality prunes to today's partition before the
        # batch_id filter — the read-back never scans historical days
        written = target.read().filter(
            (F.col("load_date") == F.lit(now.date()))
            & (F.col("batch_id") == batch_id)
        )
        row = written.agg(
            F.count(F.lit(1)).alias("n"), F.max(cfg.watermark_col).alias("m")
        ).first()
        n, new_wm = row["n"], row["m"]
        lake.control.upsert(job, new_wm if n else None, "OK")
        # per-cycle appends accumulate small files in the CURRENT
        # load_date partition only — auto-compact exactly that leaf
        # when it crosses the threshold (a where-scoped rewrite; the
        # historical partitions' files carry over untouched in the
        # manifest). NB compaction re-adds the partition's files, so a
        # read_changes consumer re-sees its rows — the downstream
        # latest-per-key + SCD2-hash dedup lands them exactly-once
        # (pinned by test_change_feed_reemission_dedups_exactly_once).
        leaf = f"load_date={now.date().isoformat()}"
        target.auto_compact(
            max_files=32,
            where=F.col("load_date") == F.lit(now.date()),
            leaf_contains=leaf,
        )
        return n
    except Exception as exc:  # FAIL path keeps the old watermark (M1)
        lake.control.upsert(job, None, f"FAIL: {exc}")
        raise


# ---------------------------------------------------------------------------
# Silver (reference §3.2: src/silver/<t>_bronze_to_silver.py:main)
# ---------------------------------------------------------------------------
def clean_conform(cfg: TableConfig, df: DataFrame) -> DataFrame:
    """P4-P7 block as ONE select-equivalent chain (silver/trips:132-190)."""
    out = df.withColumns(
        {c: F.col(c).cast(t) for c, t in cfg.casts.items() if c in df.columns}
    )
    out = normalize_strings(
        out,
        lower_cols=[c for c in cfg.lower_cols if c in out.columns],
        upper_cols=[c for c in cfg.upper_cols if c in out.columns],
        scrub_cols=[c for c in cfg.scrub_cols if c in out.columns],
    )
    return clamp_domain(
        out,
        non_negative=[c for c in cfg.clamp_non_negative if c in out.columns],
        int_range={k: v for k, v in cfg.clamp_int_range.items() if k in out.columns},
        length_equals={k: v for k, v in cfg.clamp_length.items() if k in out.columns},
    )


def _silver_merge_batch(cfg: TableConfig, target, sliced: DataFrame):
    """Shared Bronze→Silver batch body: clean → W1 dedup → DQ flags →
    redactions → SCD2 merge. Returns (rows merged, max raw_loaded_at),
    (0, None) for an empty slice."""
    cleaned = clean_conform(cfg, sliced)
    if cleaned.isEmpty():
        return 0, None
    latest = latest_per_key(
        cleaned,
        keys=[cfg.business_key],
        order_desc=["raw_loaded_at", cfg.watermark_col, "batch_id"],
    )
    if cfg.derive:
        latest = cfg.derive(latest)
    if cfg.dq_flags:
        latest = latest.withColumns(cfg.dq_flags(latest))
    if cfg.redact:
        latest = cfg.redact(latest)
    batch = (
        latest.withColumn("scd_hash", scd_hash(list(cfg.scd_hash_cols)))
        .withColumn("valid_from", F.col("raw_loaded_at"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    # the batch plan (clean+dedup+hash over bronze) feeds the merge,
    # the watermark agg, and the returned count — cache it once
    batch = batch.persist()
    try:
        scd2_apply(target, batch, [cfg.business_key], "raw_loaded_at")
        new_wm = batch.agg(F.max("raw_loaded_at")).first()[0]
        n = batch.count()
    finally:
        batch.unpersist()
    return n, new_wm


def silver_apply(lake: Lakehouse, cfg: TableConfig) -> int:
    """Incremental Bronze→Silver: prune+slice → clean → W1 dedup → DQ
    flags → redactions → SCD2 merge → watermark (silver/trips:97-436)."""
    job = f"{cfg.name}_silver"
    try:
        wm = lake.control.read_watermark(job)
        # mergeSchema: bronze is append-only and its OLTP source may have
        # widened over time (autoMerge parity, SURVEY §1.2)
        bronze = lake.table("bronze", cfg.name).read(merge_schema=True)
        # bucketed on the business key: the SCD2 merge (and later GDPR
        # anonymize merges on the same key) rewrite only touched buckets
        target = lake.table(
            "silver", cfg.name, bucket_keys=[cfg.business_key]
        )
        sliced = (
            incremental_slice(bronze, wm, "raw_loaded_at", "load_date")
            if target.exists()
            else bronze
        )
        n, new_wm = _silver_merge_batch(cfg, target, sliced)
        lake.control.upsert(job, new_wm, "OK")
        return n
    except Exception as exc:
        lake.control.upsert(job, None, f"FAIL: {exc}")
        raise


def silver_apply_changes(lake: Lakehouse, cfg: TableConfig) -> int:
    """Bronze→Silver off the change feed: consume exactly the bronze
    rows committed after this job's version cursor
    (``MergeTable.read_changes``), then advance the cursor to the head
    version — the log-position alternative to the timestamp watermark
    in :func:`silver_apply`. No ``raw_loaded_at`` predicate, no coarse
    partition-prune clause: bronze is append-only, so the manifest diff
    IS the incremental slice (and at 100 TB the slice cost is the new
    files, never a re-scan of old partitions).

    Both control styles intentionally coexist: the watermark path is
    reference parity (``etl_control``, §3.1); this path is what the
    same job looks like once storage itself is versioned."""
    job = f"{cfg.name}_silver_cdf"
    bronze_t = lake.table("bronze", cfg.name)
    try:
        cur = lake.cursor.read_version(job)
        hist = bronze_t.history() if bronze_t.exists() else []
        head = hist[0]["version"] if hist else 0
        if head <= cur:
            lake.cursor.upsert(job, None, "OK")
            return 0
        target = lake.table(
            "silver", cfg.name, bucket_keys=[cfg.business_key]
        )
        n, _ = _silver_merge_batch(cfg, target, bronze_t.read_changes(cur))
        lake.cursor.upsert(job, head, "OK")
        return n
    except Exception as exc:
        lake.cursor.upsert(job, None, f"FAIL: {exc}")
        raise


def silver_current(lake: Lakehouse, name: str) -> DataFrame:
    """P3 current-version filter (fact_trips.py:93-94)."""
    return lake.table("silver", name).read().filter(F.col("is_current"))


# ---------------------------------------------------------------------------
# Gold (reference §3.3)
# ---------------------------------------------------------------------------
def build_static_dim(
    lake: Lakehouse, name: str, df: DataFrame
) -> None:
    """Static dim: full rebuild overwrite (static/dim_zone.py:124-130)."""
    lake.table("gold", name).create(df)


def build_snapshot_dim(
    lake: Lakehouse, cfg: TableConfig, dim_name: str
) -> None:
    """SCD1 snapshot dim from Silver current (snapshot/dim_driver.py:118-223)."""
    cur = silver_current(lake, cfg.name).drop(
        "valid_from", "valid_to", "is_current"
    )
    scd1_upsert(
        lake.table("gold", dim_name, bucket_keys=[cfg.business_key]),
        cur,
        keys=[cfg.business_key],
        order_col="raw_loaded_at",
        hash_col="scd_hash",
    )


def build_scd3_dim(
    lake: Lakehouse,
    cfg: TableConfig,
    dim_name: str,
    tracked_cols: list[str],
) -> None:
    """SCD3 dim: seed current+prev from 2-deep Silver history (J7,
    scd3/dim_passenger.py:63-95), then shift-merge increments (M5)."""
    table = lake.table("gold", dim_name, bucket_keys=[cfg.business_key])
    silver = lake.table("silver", cfg.name).read()
    if not table.exists():
        seeded = current_and_previous(
            silver.drop("valid_from", "valid_to", "is_current"),
            keys=[cfg.business_key],
            order_desc=["raw_loaded_at"],
            prev_cols=tracked_cols,
        )
        table.create(seeded)
        return
    cur = silver_current(lake, cfg.name).drop(
        "valid_from", "valid_to", "is_current"
    )
    scd3_apply(
        table,
        cur,
        keys=[cfg.business_key],
        order_col="raw_loaded_at",
        tracked_cols=tracked_cols,
    )


def build_hist_dim(lake: Lakehouse, cfg: TableConfig, dim_name: str) -> None:
    """SCD2 re-maintained in Gold from Silver current versions
    (hist/dim_passenger.py:136-299)."""
    cur = silver_current(lake, cfg.name)
    scd2_apply(
        lake.table("gold", dim_name, bucket_keys=[cfg.business_key]),
        cur,
        keys=[cfg.business_key],
        order_col="raw_loaded_at",
    )


def build_fact_trips(lake: Lakehouse) -> None:
    """fact_trips (reference fact_trips.py:59-231): target-derived
    watermark, current filter, W1 dedup, conform date_key, J1 dim
    validation (orphans→0), M4 SCD1 merge."""
    target = lake.table("gold", "fact_trips", bucket_keys=["trip_id"])
    wm = target_max_watermark(target, "raw_loaded_at")
    cur = silver_current(lake, "trips").filter(
        F.col("raw_loaded_at") > F.lit(wm)
    )
    if cur.isEmpty():
        return
    latest = latest_per_key(cur, ["trip_id"], ["raw_loaded_at", "updated_at"])
    conformed = latest.select(
        "trip_id",
        F.coalesce("passenger_id", F.lit(0)).alias("passenger_key"),
        F.coalesce("driver_id", F.lit(0)).alias("driver_key"),
        F.coalesce("vehicle_id", F.lit(0)).alias("vehicle_key"),
        F.coalesce("pickup_zone_id", F.lit(0)).alias("pickup_zone_key"),
        F.coalesce("dropoff_zone_id", F.lit(0)).alias("dropoff_zone_key"),
        F.coalesce(
            F.date_format("requested_at", "yyyyMMdd").cast("int"), F.lit(0)
        ).alias("request_date_key"),
        "status",
        "actual_distance_km",
        "estimated_distance_km",
        "fare_amount",
        "scd_hash",
        "raw_loaded_at",
    )
    # J1 validation joins against available dims — orphans → UNKNOWN 0
    dims = {
        "passenger_key": ("dim_passenger", "passenger_id"),
        "driver_key": ("dim_driver", "driver_id"),
        "vehicle_key": ("dim_vehicle", "vehicle_id"),
        "pickup_zone_key": ("dim_zone", "zone_id"),
        "dropoff_zone_key": ("dim_zone", "zone_id"),
    }
    for fact_key, (dim_name, dim_key) in dims.items():
        dim = lake.table("gold", dim_name)
        if dim.exists():
            conformed = validate_fk(
                conformed, dim.read(), fact_key=fact_key, dim_key=dim_key
            )
    scd1_upsert(
        target, conformed, keys=["trip_id"], order_col="raw_loaded_at",
        hash_col="scd_hash",
    )


def build_agg_trips_daily(lake: Lakehouse) -> None:
    """agg_trips_daily (agg_trips_daily.py:51-190): self-describing
    watermark, affected-date recompute, conditional measures, MERGE."""
    target = lake.table(
        "gold", "agg_trips_daily", bucket_keys=["request_date_key"]
    )
    fact = lake.table("gold", "fact_trips").read()
    wm = target_max_watermark(target, "max_raw_loaded_at")
    inc = fact.filter(F.col("raw_loaded_at") > F.lit(wm))
    if inc.isEmpty():
        return
    dist = F.coalesce("actual_distance_km", "estimated_distance_km")
    measures = {
        "total_trips": F.count(F.lit(1)),
        "completed_trips": F.sum(
            F.when(F.col("status") == "completed", 1).otherwise(0)
        ).cast("long"),
        "canceled_trips": F.sum(
            F.when(F.col("status") == "canceled", 1).otherwise(0)
        ).cast("long"),
        "total_fare": F.sum(F.coalesce("fare_amount", F.lit(0.0))),
        "avg_fare": F.avg("fare_amount"),
        "total_distance_km": F.sum(F.coalesce(dist, F.lit(0.0))),
        "max_raw_loaded_at": F.max("raw_loaded_at"),
    }
    recomputed = recompute_affected(fact, inc, ["request_date_key"], measures)
    upsert_aggregate(
        target, recomputed, ["request_date_key"],
        freshness_col="max_raw_loaded_at",
    )


def build_agg_driver_daily(lake: Lakehouse) -> None:
    """agg_driver_daily (agg_driver_daily.py:51-282): date×driver grain,
    countDistinct measures."""
    target = lake.table(
        "gold",
        "agg_driver_daily",
        bucket_keys=["request_date_key", "driver_key"],
    )
    fact = lake.table("gold", "fact_trips").read()
    wm = target_max_watermark(target, "max_raw_loaded_at")
    inc = fact.filter(F.col("raw_loaded_at") > F.lit(wm))
    if inc.isEmpty():
        return
    measures = {
        "n_trips": F.countDistinct("trip_id"),
        "completed_trips": F.sum(
            F.when(F.col("status") == "completed", 1).otherwise(0)
        ).cast("long"),
        "total_fare": F.sum(F.coalesce("fare_amount", F.lit(0.0))),
        "max_raw_loaded_at": F.max("raw_loaded_at"),
    }
    recomputed = recompute_affected(
        fact, inc, ["request_date_key", "driver_key"], measures
    )
    upsert_aggregate(
        target, recomputed, ["request_date_key", "driver_key"],
        freshness_col="max_raw_loaded_at",
    )


# ---------------------------------------------------------------------------
# GDPR + retention orchestration (reference §3.4 + retention/*)
# ---------------------------------------------------------------------------
def run_gdpr(
    lake: Lakehouse,
    requests: DataFrame,
    salt: str,
    vacuum_pii: bool = True,
) -> dict[str, int]:
    """Full erasure propagation across every existing layer/flavor
    (gdpr_propagate_erasure.py:725-869): entity anonymize MERGEs on
    silver + gold (incl. scd3 prev_*), then free-text scrubs on
    ratings.comment / trips.cancel_note / payments.provider_ref via the
    affected-trip-id semi-join, each audited with salted fingerprints.

    ``vacuum_pii`` (default on): vacuum every mutated table afterwards
    so the pre-erasure snapshots holding the PII are physically deleted,
    not just dereferenced — anonymization is only logically complete at
    commit, exactly as on Delta, where the reference's retention jobs
    pair mutations with VACUUM
    (``retention/bronze_retention_cleanup.py:84-86``)."""
    from urban_mobility_data_pipeline_spark.operators.gdpr import (
        AuditLog,
        affected_trip_ids,
        normalize_requests,
        propagate_erasure,
        scrub_column,
    )

    audit = AuditLog(lake.spark, lake.path("gdpr", "audit"), salt=salt)
    layer_tables: dict[str, dict] = {"silver": {}, "gold": {}}
    for entity in ("passengers", "drivers", "vehicles"):
        t = lake.table("silver", entity)
        if t.exists():
            layer_tables["silver"][entity] = t
        dim = lake.table("gold", f"dim_{entity[:-1]}")
        if dim.exists():
            layer_tables["gold"][entity] = dim
        hist = lake.table("gold", f"dim_{entity[:-1]}_hist")
        if hist.exists():
            # ':hist' (not '#hist'): propagate_erasure splits entity keys
            # on ':' — any flavor other than 'prev' gets the base set-map,
            # which is exactly what SCD2 history rows need (every version
            # of an erased subject must be anonymized, gdpr:725-869)
            layer_tables["gold"][f"{entity}:hist"] = hist
        scd3 = lake.table("gold", f"dim_{entity[:-1]}_scd3")
        if scd3.exists():
            layer_tables["gold"][f"{entity}:prev"] = scd3
    counts = propagate_erasure(lake.spark, requests, layer_tables, audit=audit)

    # accidental-PII scrubs (M9): derive affected trip ids once
    normalized = normalize_requests(requests)
    trips_t = lake.table("silver", "trips")
    if trips_t.exists() and normalized.take(1):
        trips = trips_t.read()
        fk_map = {
            "passenger": ["passenger_id"],
            "driver": ["driver_id"],
            "vehicle": ["vehicle_id"],
        }
        ids = None
        for stype, fks in fk_map.items():
            subjects = normalized.filter(F.col("subject_type") == stype)
            if not subjects.take(1):
                continue
            part = affected_trip_ids(trips, subjects, fks)
            ids = part if ids is None else ids.unionByName(part).distinct()
        if ids is not None:
            # materialize the id set BEFORE mutating: the scrubs rewrite
            # silver/trips, and a lazy plan over it would re-read deleted
            # files (copy-on-write hazard; Delta's retained versions hide
            # this — our Parquet MergeTable must snapshot instead)
            scratch = lake.table("gdpr", "_affected_trip_ids")
            scratch.create(ids)
            ids = scratch.read()
        if ids is not None:
            for layer, name, col, key in (
                ("silver", "ratings", "comment", "trip_id"),
                ("silver", "trips", "cancel_note", "trip_id"),
                ("silver", "payments", "provider_ref", "trip_id"),
            ):
                t = lake.table(layer, name)
                if t.exists():
                    scrub_column(t, ids, key, col)
                    audit.record(layer, name, ids.select(
                        F.col(key).alias("subject_id")), [col])

    if vacuum_pii:
        # physical erasure: drop the dereferenced pre-anonymization
        # snapshots (and the scratch id table) from disk
        for tables in layer_tables.values():
            for t in tables.values():
                t.vacuum()
        for layer, name in (
            ("silver", "ratings"),
            ("silver", "trips"),
            ("silver", "payments"),
            ("gdpr", "_affected_trip_ids"),
        ):
            t = lake.table(layer, name)
            if t.exists():
                t.vacuum()
    return counts


def run_retention(
    lake: Lakehouse,
    bronze_days: int = 30,
    silver_days: int = 365,
    now=None,
) -> None:
    """Retention sweep (retention/bronze_retention_cleanup.py:16-96,
    silver_retention_cleanup.py:26-96): Bronze drops rows older than N
    days by load_date; Silver deletes only CLOSED SCD2 history older
    than N days — current rows are never aged out."""
    from urban_mobility_data_pipeline_spark.domain.config import ALL_TABLES
    from urban_mobility_data_pipeline_spark.operators.retention import (
        age_predicate,
        apply_age_retention,
        apply_retention,
        closed_history_predicate,
    )

    for name in ALL_TABLES:
        bronze = lake.table("bronze", name)
        if bronze.exists():
            if now is not None:
                # zone-map path: wholly-expired files drop with zero IO
                apply_age_retention(bronze, "raw_loaded_at", bronze_days, now)
            else:
                apply_retention(
                    bronze, age_predicate("raw_loaded_at", bronze_days, now)
                )
        silver = lake.table("silver", name)
        if silver.exists():
            apply_retention(silver, closed_history_predicate(silver_days, now))


# ---------------------------------------------------------------------------
# remaining gold pieces: dim_date, dim_payment_method, fact_payments
# ---------------------------------------------------------------------------
def build_dim_date(lake: Lakehouse) -> None:
    """Static dim_date rebuild (static/dim_date.py:24-170): date range
    inferred from silver trips timestamps (A4), sequence+explode spine,
    attributes, UNKNOWN row (date_key=0)."""
    from urban_mobility_data_pipeline_spark.operators.star import (
        calendar_attributes,
        with_unknown_row,
    )

    trips = silver_current(lake, "trips")
    bounds = trips.agg(
        F.min(F.to_date("requested_at")).alias("s"),
        F.max(F.to_date("requested_at")).alias("e"),
    )
    spine = bounds.select(
        F.explode(F.sequence("s", "e", F.expr("interval 1 day"))).alias("date")
    )
    dim = with_unknown_row(
        calendar_attributes(spine, "date"),
        {
            "date": F.to_date(F.lit("1900-01-01")),
            "date_key": F.lit(0),
            "year": F.lit(0),
            "month": F.lit(0),
            "day": F.lit(0),
            "week_of_year": F.lit(0),
            "day_of_week": F.lit(0),
            "day_name": F.lit("UNKNOWN"),
            "quarter": F.lit(0),
            "is_weekend": F.lit(False),
        },
    )
    lake.table("gold", "dim_date").create(dim)


def build_dim_payment_method(lake: Lakehouse) -> None:
    """dim_payment_method (static/dim_payment.py:58-148): distinct
    normalized methods from Silver current + xxhash64 surrogate key +
    UNKNOWN row (key 0)."""
    from urban_mobility_data_pipeline_spark.functions.hashing import (
        surrogate_int_key,
    )
    from urban_mobility_data_pipeline_spark.operators.star import (
        with_unknown_row,
    )

    cur = silver_current(lake, "payments")
    dim = (
        cur.groupBy("method")
        .agg(F.max("raw_loaded_at").alias("last_seen_at"))
        .select(
            surrogate_int_key(["method"]).alias("payment_method_key"),
            "method",
            "last_seen_at",
        )
    )
    dim = with_unknown_row(
        dim,
        {
            "payment_method_key": F.lit(0),
            "method": F.lit("unknown"),
            "last_seen_at": F.lit(None).cast("timestamp"),
        },
    )
    lake.table("gold", "dim_payment_method").create(dim)


def build_fact_payments(lake: Lakehouse) -> None:
    """fact_payments (fact_payments.py:59-231 analogue): current Silver
    payments, W1 dedup, hashed method key validated against
    dim_payment_method (J2, orphans → 0), SCD1 merge."""
    from urban_mobility_data_pipeline_spark.functions.hashing import (
        surrogate_int_key,
    )

    target = lake.table("gold", "fact_payments")
    wm = target_max_watermark(target, "raw_loaded_at")
    cur = silver_current(lake, "payments").filter(
        F.col("raw_loaded_at") > F.lit(wm)
    )
    if cur.isEmpty():
        return
    latest = latest_per_key(cur, ["payment_id"], ["raw_loaded_at", "updated_at"])
    conformed = latest.select(
        "payment_id",
        "trip_id",
        surrogate_int_key(["method"]).alias("payment_method_key"),
        "status",
        F.col("amount").cast("double").alias("amount"),
        "currency",
        F.coalesce(
            F.date_format("paid_at", "yyyyMMdd").cast("int"), F.lit(0)
        ).alias("paid_date_key"),
        "scd_hash",
        "raw_loaded_at",
    )
    dim = lake.table("gold", "dim_payment_method")
    if dim.exists():
        conformed = validate_fk(
            conformed,
            dim.read(),
            fact_key="payment_method_key",
            dim_key="payment_method_key",
        )
    scd1_upsert(
        target, conformed, keys=["payment_id"], order_col="raw_loaded_at",
        hash_col="scd_hash",
    )
