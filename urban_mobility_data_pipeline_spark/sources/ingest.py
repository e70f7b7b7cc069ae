"""Quarantining text ingestion: JSONL / CSV crawl feeds with malformed
records routed to a dead-letter frame instead of killing the job or
silently disappearing (Spark-native extension; the reference ingests
only from Postgres JDBC, ``src/bronze/trips_oltb_to_bronze.py`` — a
web-scale corpus pipeline's front door is compressed JSONL).

Design notes for the 100 TB path:

- The reader runs in PERMISSIVE mode with an explicit schema — schema
  inference would mean a second full pass over the input.
- Splitting good/bad rows filters on the corrupt-record column, which
  Spark forbids directly on the streaming-from-source plan (the column
  is populated at parse time only for rows that need it; see
  SPARK-26243 / the "referenced columns only include the internal
  corrupt record column" error). The split therefore persists the
  parsed frame once — one parse of the input serves both outputs —
  instead of the naive workaround of reading the file twice.
- Both outputs stay partition-aligned with the input files; no shuffle
  is introduced by ingestion itself.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt(ddl_schema: str) -> T.StructType:
    schema = T.StructType.fromDDL(ddl_schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not predeclare {CORRUPT_COL}")
    return schema.add(CORRUPT_COL, T.StringType(), True)


def _split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    parsed = parsed.persist(StorageLevel.MEMORY_AND_DISK)
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad


def parse_jsonl(spark: SparkSession, path: str, ddl_schema: str) -> DataFrame:
    """Raw PERMISSIVE parse (corrupt column populated, not yet split,
    not persisted) — for callers that manage the cache lifecycle
    themselves (see :func:`...extensions.corpus_ingest.ingest_feed`)."""
    return (
        spark.read.schema(_schema_with_corrupt(ddl_schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_jsonl_quarantined(
    spark: SparkSession, path: str, ddl_schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with an explicit schema; return
    ``(good, quarantine)``. ``good`` has exactly the declared columns;
    ``quarantine`` holds the raw text of every line that failed to
    parse or type-check, ready for a dead-letter sink.

    The split persists the parsed frame, and Spark caches by logical
    plan — calling this twice on the SAME directory in one session
    returns the first call's snapshot even if files were added since.
    For repeated cycles over a growing feed, use
    ``corpus_ingest.ingest_feed`` (which unpersists per cycle) or the
    streaming path."""
    return _split(parse_jsonl(spark, path, ddl_schema))


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    ddl_schema: str,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_jsonl_quarantined` (same PERMISSIVE +
    corrupt-column split; malformed rows keep their raw line)."""
    return _split(parse_csv(spark, path, ddl_schema, header=header, sep=sep))


def parse_csv(
    spark: SparkSession,
    path: str,
    ddl_schema: str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV twin of :func:`parse_jsonl` (raw parse, caller-managed
    lifecycle)."""
    return (
        spark.read.schema(_schema_with_corrupt(ddl_schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("enforceSchema", "false")
        .csv(path)
    )
