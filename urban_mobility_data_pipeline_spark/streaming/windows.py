"""Event-time window aggregations usable in batch AND streaming plans.

The reference has no streaming operators (SURVEY.md §2.10); these are
the Spark-native extensions. Each builder returns a transformation that
works identically on a batch DataFrame and a ``readStream`` DataFrame —
in streaming mode add ``watermark`` to bound state and admit late data
up to the delay.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Mapping[str, Column],
    extra_keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time windows (``F.window``). With ``watermark`` set
    on a streaming df, state for closed windows is dropped after the
    delay — Spark's late-data contract replacing the reference's
    recompute-affected batch strategy."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), duration).alias("window")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Mapping[str, Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), duration, slide).alias("window")
    ).agg(*[expr.alias(name) for name, expr in aggs.items()])


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: Mapping[str, Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows with a per-key inactivity gap (``F.session_window``)
    — the stateful twin of the deterministic gaps-and-islands batch
    sessionization in ``plans.parity.user_session_windows``."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"),
        *[F.col(k) for k in keys],
    ).agg(*[expr.alias(name) for name, expr in aggs.items()])
