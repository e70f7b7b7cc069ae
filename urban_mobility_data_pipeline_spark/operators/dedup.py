"""Window-based versioning operators (SURVEY.md §2.6 W1-W2).

The reference's single most-used operator: latest-version-per-business-key
via ``row_number()`` (every Silver job, every snapshot/scd3/hist dim, both
facts — ``src/silver/trips_bronze_to_silver.py:209-219``,
``src/gold/_marts/facts/fact_trips.py:112-118``).

Scale note: ``row_number`` over ``partitionBy(key)`` is a single hash
shuffle on the key — the same shuffle a groupBy would pay — and AQE
handles skewed keys. The reference orders only by ``raw_loaded_at``,
which is nondeterministic under ties (SURVEY.md §2.6); we always append
caller-supplied tiebreakers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def _version_window(keys: Sequence[str], order_desc: Sequence[str | Column]):
    ordering = [
        (F.col(c) if isinstance(c, str) else c).desc_nulls_last() for c in order_desc
    ]
    return Window.partitionBy(*keys).orderBy(*ordering)


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_desc: Sequence[str | Column]
) -> DataFrame:
    """Keep the newest version per business key (reference W1,
    ``src/silver/trips_bronze_to_silver.py:209-219``).

    ``order_desc`` is the version ordering, newest first; pass extra
    columns (e.g. ``updated_at``, ``batch_id``) as tiebreakers — the
    reference omits them and is nondeterministic under equal
    ``raw_loaded_at`` (SURVEY.md §7 risk 2).
    """
    w = _version_window(keys, order_desc)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def current_and_previous(
    df: DataFrame,
    keys: Sequence[str],
    order_desc: Sequence[str | Column],
    prev_cols: Sequence[str],
    prev_prefix: str = "prev_",
) -> DataFrame:
    """Current + previous version per key, previous columns renamed
    ``prev_*`` (reference W2 + J7 SCD3 seed,
    ``src/gold/_conformed/scd3/dim_passenger.py:63-95``).

    The reference self-joins rn=1 against rn=2; ``lead()`` over the same
    descending window gives the previous version's columns in the SAME
    single window pass — one shuffle, no join (the rewrite SURVEY §2.6
    anticipates).
    """
    w = _version_window(keys, order_desc)
    ranked = df.withColumns(
        {
            _RN: F.row_number().over(w),
            **{
                f"{prev_prefix}{c}": F.lead(c).over(w) for c in prev_cols
            },
        }
    )
    return ranked.filter(F.col(_RN) == 1).drop(_RN)
