"""Structured-Streaming incremental pipeline (SURVEY.md §2.10 rebuild
option).

The reference emulates streaming with watermark-driven batch
micro-batches (control table + ``updated_at > wm`` scans, §3.1-3.2). The
Spark-native equivalent is ``readStream`` + ``foreachBatch`` with
``Trigger.AvailableNow``: the checkpoint replaces ``etl_control`` (file
offsets instead of timestamp watermarks), each micro-batch runs the same
clean→dedup→merge operators, and the run drains everything available
then stops — identical cadence to the reference's scheduled jobs with
exactly-once file-source semantics.

Both layers are offered: ``run_available_now`` (streaming-native) and
the batch control-table path in ``operators.watermark`` (reference
parity). At 100 TB the streaming path wins: no re-scan of old
partitions, no manual coarse-prune predicate — the source only lists new
files.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory. The schema must be
    pinned (streaming sources don't infer), which doubles as the
    schema-registry discipline SURVEY §1.2 calls for."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def run_available_now(
    source: DataFrame,
    checkpoint: str,
    batch_fn: Callable[[DataFrame, int], None],
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """Drain all available input through ``transform`` into ``batch_fn``
    (one call per micro-batch) and stop — the streaming twin of a
    reference incremental job run. ``batch_fn`` typically wraps a
    MergeTable upsert, so every sink the batch engines support is also a
    streaming sink."""
    df = transform(source) if transform is not None else source

    query = (
        df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
