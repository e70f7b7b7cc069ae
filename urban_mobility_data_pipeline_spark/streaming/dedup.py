"""Streaming deduplication — the Structured-Streaming analogue of the
reference's W1 latest-per-key batch dedup (SURVEY §2.6), for the
at-least-once ingestion case: a retried producer or replayed file
re-delivers the same business key, and the stream must emit it once.

``dropDuplicatesWithinWatermark`` keys the state store on the dedup
keys and — unlike plain ``dropDuplicates`` on a stream, whose state
grows forever — expires each key's entry once the event-time watermark
passes it, so state is bounded by (key arrival rate × watermark delay),
not by stream lifetime. Duplicates arriving within the watermark window
of the first occurrence are dropped even when their timestamps differ
(the retry case: same event_id, later send time).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence per ``keys`` wins; re-deliveries within the
    event-time ``watermark`` of the first are dropped; state for a key
    is freed once the watermark passes it (bounded state — the property
    that matters on an unbounded stream)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
