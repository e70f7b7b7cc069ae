"""Stream-stream interval join.

The reference has no streaming operators (SURVEY.md §2.10); this is the
Structured-Streaming-native correlation primitive — e.g. payments
arriving within an hour of their trip, impressions joined to clicks.

State bounding is the scale story: with both sides watermarked and the
join condition carrying an explicit event-time interval, Spark derives
how long each side's rows must be buffered (watermark delay + interval
width) and evicts state beyond it. An unconstrained stream-stream join
would buffer forever; this one holds O(rate × (delay + interval))
per side regardless of total stream length.

The same function works on batch DataFrames (watermarks become no-ops),
so batch twins can pin the join's semantics in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Pairs where ``left_ts + lower <= right_ts <= left_ts + upper``
    and the ``on`` keys match. ``left_ts``/``right_ts`` must be distinct
    column names (timestamp type); ``lower``/``upper`` are SQL interval
    strings. For streaming inputs set both watermarks — required by
    Spark for outer modes, and what bounds state for inner."""
    if left_watermark:
        left = left.withWatermark(left_ts, left_watermark)
    if right_watermark:
        right = right.withWatermark(right_ts, right_watermark)
    cond: Column = (
        F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    ) & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    for k in on:
        cond = cond & (left[k] == right[k])
    dup = [c for c in right.columns if c in left.columns and c not in on]
    if dup:
        raise ValueError(f"non-key columns present on both sides: {dup}")
    joined = left.join(right, cond, how)
    if how == "inner":
        return joined.drop(*[right[k] for k in on])
    # outer modes: both sides' key columns survive the join and one may
    # be NULL — emit a single coalesced key so downstream references are
    # unambiguous
    sel = [F.coalesce(left[k], right[k]).alias(k) for k in on]
    sel += [left[c] for c in left.columns if c not in on]
    sel += [right[c] for c in right.columns if c not in on]
    return joined.select(*sel)
