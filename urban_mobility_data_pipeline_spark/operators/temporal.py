"""Temporal joins Spark lacks as built-ins: as-of join and bucketed
range join.

No reference counterpart (the reference joins only on equi-keys —
SURVEY.md §2.3); these are the engine-completeness additions a
time-series user expects (pandas ``merge_asof``, DuckDB ``ASOF JOIN``,
kdb ``aj``). Built scale-first:

- ``asof_join`` is the union-sort-carry formulation: ONE hash shuffle on
  the join keys (same cost as any groupBy), a single window pass, and no
  join amplification — per key the cost is O((|L|+|R|) log) regardless of
  how many left rows share a key, where a naive
  join-then-rank pays O(|L|·|R|) pairs before pruning.
- ``range_join`` avoids the BroadcastNestedLoopJoin Catalyst would plan
  for a pure inequality join by bucketizing time into window-width
  buckets and equi-joining on the bucket id (each left row explodes to
  exactly 2 candidate buckets). The plan becomes a shuffled hash/SMJ on
  the bucket key — linear shuffle, bounded fan-out — with the precise
  interval predicate applied as a post-join filter.

Both operate on any orderable numeric/timestamp column; the catalog
drives them with epoch-microsecond longs (the engine-neutral event-time
representation, see plans/_helpers.py).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_TAG = "__asof_side"
_CARRY = "__asof_carry"
_BUCKET = "__rj_bucket"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Mapping[str, str],
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the payload of the
    nearest right row per key — most recent ``right_ts <= left_ts`` for
    ``direction="backward"``, earliest ``right_ts >= left_ts`` for
    ``"forward"`` (exact matches included, as in pandas ``merge_asof``).

    ``payload`` maps right-column -> output alias (aliases must not
    collide with left columns). Rows with no match keep NULL payload
    (left-join semantics). ``tolerance`` (same unit as the ts columns)
    NULLs the payload when the matched row is farther than that.

    Ties: several right rows sharing (key, ts) are nondeterministic —
    pre-dedupe the right side (e.g. row_number over a tiebreaker) if the
    input allows duplicates.

    Plan shape: unionByName -> one Exchange on ``on`` -> one running
    window -> filter. Right payload is carried as a struct gated on the
    side tag, so NULL payload values inside a right row are carried
    as-is (not skipped for an older non-NULL).
    """
    on = list(on)
    out = list(payload.values())
    clash = set(out) & set(left.columns)
    if clash:
        raise ValueError(f"payload aliases collide with left columns: {clash}")

    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        *[F.col(src).alias(dst) for src, dst in payload.items()],
    ).withColumn(_TAG, F.lit(0))
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_TAG, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = F.last(
        F.when(F.col(_TAG) == 0, F.struct(F.col(_TS), *[F.col(c) for c in out])),
        ignorenulls=True,
    ).over(w)

    u = u.withColumn(_CARRY, carry).where(F.col(_TAG) == 1)
    if tolerance is not None:
        dist = (
            F.col(_TS) - F.col(f"{_CARRY}.{_TS}")
            if direction == "backward"
            else F.col(f"{_CARRY}.{_TS}") - F.col(_TS)
        )
        u = u.withColumn(
            _CARRY, F.when(dist <= F.lit(tolerance), F.col(_CARRY))
        )
    return u.select(
        *left.columns,
        *[F.col(f"{_CARRY}.{c}").alias(c) for c in out],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    window: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Inner pairs where ``left_ts <= right_ts < left_ts + window``
    (and optional equi-keys ``on`` match). Column names of ``left`` and
    ``right`` must be disjoint apart from ``on``.

    ``window`` is in the ts columns' own unit (e.g. microseconds for the
    catalog's epoch-micros longs). Each left row belongs to time bucket
    ``ts div window`` and its half-open window can only span that bucket
    and the next, so exploding the left side to those 2 bucket ids and
    equi-joining on the id yields every candidate exactly once — no
    dedupe, no cross product.
    """
    lb = F.expr(f"`{left_ts}` div {int(window)}")
    l = left.withColumn(_BUCKET, F.explode(F.array(lb, lb + F.lit(1))))
    r = right.withColumn(_BUCKET, F.expr(f"`{right_ts}` div {int(window)}"))
    cond: Column = l[_BUCKET] == r[_BUCKET]
    for k in on:
        cond = cond & (l[k] == r[k])
    cond = (
        cond
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] < l[left_ts] + F.lit(int(window)))
    )
    joined = l.join(r, cond, "inner")
    keep = [l[c] for c in left.columns] + [
        r[c] for c in right.columns if c not in on
    ]
    return joined.select(*keep)
