"""GDPR erasure propagation (SURVEY.md §2.4 M7-M10, §3.4, §7 phase 5).

Reference: ``gdpr/gdpr_propagate_erasure.py`` — read processed erasure
requests past the ``gdpr_control`` watermark, normalize legacy subject
columns, then for every layer × entity run anonymize MERGEs (including
``prev_*`` SCD3 variants and all SCD2 history versions), scrub
accidental-PII free-text columns via trip-id semi-joins, and append a
salted-hash audit row per action.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

ANONYMIZED = "ANONYMIZED"

AUDIT_SCHEMA = (
    "audited_at timestamp, layer string, entity string, "
    "subject_fingerprint string, columns_scrubbed array<string>, "
    "n_subjects long"
)


def normalize_requests(requests: DataFrame) -> DataFrame:
    """Normalize legacy (``passenger_id``-only) and new
    (``subject_type``/``subject_id``) erasure request shapes; keep only
    processed erasures (reference ``gdpr:301-347``)."""
    return (
        requests.filter(
            (F.col("request_type") == "erasure")
            & (F.col("status") == "processed")
            & F.col("processed_at").isNotNull()
        )
        .select(
            F.coalesce(F.col("subject_type"), F.lit("passenger")).alias(
                "subject_type"
            ),
            F.coalesce(F.col("subject_id"), F.col("passenger_id")).alias(
                "subject_id"
            ),
            "processed_at",
        )
        .filter(F.col("subject_id").isNotNull())
    )


def merge_update_by_ids(
    table: MergeTable,
    ids: DataFrame,
    key: str,
    set_map: Mapping[str, Column],
    match_condition: Column | None = None,
) -> None:
    """M7: UPDATE-WHERE-IN expressed as MERGE against a distinct id frame
    (reference ``gdpr:360-395`` — Delta UPDATE takes no subqueries; the
    same shape is also the *fast* plan: the id set broadcasts and file
    pruning skips untouched partitions)."""
    if not table.exists():
        return
    table.merge(
        ids.select(F.col(key)).distinct(),
        keys=[key],
        update_condition=match_condition
        if match_condition is not None
        else F.lit(True),
        update_set=dict(set_map),
    )


def passenger_anonymize_set(prev: bool = False) -> dict[str, Column]:
    """M8 passenger set-map (``gdpr:401-427``): name → 'ANONYMIZED',
    email/phone/city → NULL; ``prev=True`` adds the SCD3 ``prev_*``
    variants (``gdpr:430-461`` pattern)."""
    cols = {
        "full_name": F.lit(ANONYMIZED),
        "email": F.lit(None).cast("string"),
        "phone": F.lit(None).cast("string"),
        "city": F.lit(None).cast("string"),
    }
    if prev:
        cols.update({f"prev_{c}": v for c, v in cols.items()})
    return cols


def driver_anonymize_set(prev: bool = False) -> dict[str, Column]:
    """M8 driver set-map (``gdpr:430-461``): + license NULL, status
    inactive."""
    cols = {
        "full_name": F.lit(ANONYMIZED),
        "license_number": F.lit(None).cast("string"),
        "status": F.lit("inactive"),
    }
    if prev:
        cols.update({f"prev_{c}": v for c, v in cols.items()})
    return cols


def vehicle_anonymize_set(key: str = "vehicle_id") -> dict[str, Column]:
    """M8 vehicle set-map: deterministic plate
    ``ANON-PLATE-<vehicle_id>`` (``gdpr:464-492,477``)."""
    return {
        "plate_number": F.concat(
            F.lit("ANON-PLATE-"), F.col(f"t.{key}").cast("string")
        ),
        "make": F.lit(None).cast("string"),
        "model": F.lit(None).cast("string"),
    }


def scrub_column(
    table: MergeTable, ids: DataFrame, key: str, column: str
) -> None:
    """M9 accidental-PII scrub: NULL one free-text column for the id set,
    guarded ``t.<col> IS NOT NULL`` to skip no-op rewrites
    (``gdpr:495-604``)."""
    merge_update_by_ids(
        table,
        ids,
        key,
        {column: F.lit(None).cast("string")},
        match_condition=F.col(f"t.{column}").isNotNull(),
    )


def affected_trip_ids(
    trips: DataFrame, subjects: DataFrame, fk_cols: Sequence[str]
) -> DataFrame:
    """J6: union of broadcast semi-joins trips ⟕ subject ids over each FK
    column → distinct trip_id set (``gdpr:607-655``)."""
    ids = F.broadcast(subjects.select("subject_id").distinct())
    parts = [
        trips.join(ids, trips[fk] == ids["subject_id"], "left_semi").select(
            "trip_id"
        )
        for fk in fk_cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


class AuditLog:
    """Append-only audit of every redaction, with salted SHA-256 subject
    fingerprints (never raw ids — reference ``gdpr:177-209``) and the
    ``columns_scrubbed`` array column."""

    def __init__(self, spark: SparkSession, path: str, salt: str):
        self.spark = spark
        self.table = MergeTable(spark, path)
        self.salt = salt

    def record(
        self,
        layer: str,
        entity: str,
        subjects: DataFrame,
        columns_scrubbed: Sequence[str],
    ) -> None:
        rows = subjects.select(
            F.current_timestamp().alias("audited_at"),
            F.lit(layer).alias("layer"),
            F.lit(entity).alias("entity"),
            F.sha2(
                F.concat(F.lit(self.salt), F.col("subject_id").cast("string")),
                256,
            ).alias("subject_fingerprint"),
            F.array(*[F.lit(c) for c in columns_scrubbed]).alias(
                "columns_scrubbed"
            ),
            F.lit(1).cast("long").alias("n_subjects"),
        )
        if not self.table.exists():
            self.table.create(self.spark.createDataFrame([], AUDIT_SCHEMA))
        self.table.append(rows)


def propagate_erasure(
    spark: SparkSession,
    requests: DataFrame,
    layer_tables: Mapping[str, Mapping[str, MergeTable]],
    audit: AuditLog | None = None,
) -> dict[str, int]:
    """Orchestration (reference ``gdpr:725-869``): split normalized
    requests per subject type, then for each layer × entity apply the
    anonymize MERGE across *all* historization flavors (current rows,
    SCD2 history, SCD3 prev_* — a redaction must hit every version,
    SURVEY §7 phase 5). Returns per-subject-type counts.

    ``layer_tables[layer][entity]`` maps e.g.
    ``("silver", "passengers") -> MergeTable``; entity keys are
    ``passengers`` / ``drivers`` / ``vehicles`` with optional
    ``:prev`` suffix for SCD3 tables.
    """
    normalized = normalize_requests(requests).cache()
    counts: dict[str, int] = {}
    set_builders = {
        "passengers": lambda prev: passenger_anonymize_set(prev),
        "drivers": lambda prev: driver_anonymize_set(prev),
        "vehicles": lambda prev: vehicle_anonymize_set(),
    }
    key_cols = {
        "passengers": "passenger_id",
        "drivers": "driver_id",
        "vehicles": "vehicle_id",
    }
    for subject_type in ("passenger", "driver", "vehicle"):
        entity = subject_type + "s"
        subjects = normalized.filter(
            F.col("subject_type") == subject_type
        ).select("subject_id")
        counts[subject_type] = subjects.count()
        if counts[subject_type] == 0:
            continue
        for layer, tables in layer_tables.items():
            for ent_key, table in tables.items():
                base, _, flavor = ent_key.partition(":")
                if base != entity:
                    continue
                ids = subjects.select(
                    F.col("subject_id").alias(key_cols[entity])
                )
                set_map = set_builders[entity](flavor == "prev")
                merge_update_by_ids(table, ids, key_cols[entity], set_map)
                if audit is not None:
                    audit.record(
                        layer,
                        ent_key,
                        subjects.select("subject_id"),
                        sorted(set_map),
                    )
    normalized.unpersist()
    return counts
