"""Hash helpers (SURVEY.md §1.3, §2.9).

- ``scd_hash``: the reference's change-detection key — SHA-256 of
  ``||``-joined, null-coalesced-to-'' business columns
  (``src/silver/trips_bronze_to_silver.py:286-319``).
- ``surrogate_int_key``: deterministic int key, ``xxhash64`` + ``pmod``
  (``src/gold/_marts/facts/fact_payments.py:135``,
  ``static/dim_payment.py:103-108``).
- ``md5_int_key``: portable variant of the same recipe built from md5 so
  external engines (e.g. a DuckDB oracle) can reproduce it bit-for-bit;
  same shape (uniform hash → pmod → +1), different hash family.

All are pure Column expressions — JVM-side, codegen-friendly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pmod modulus from the reference (fact_payments.py:135): keys land in
#: [1, 2147483646], leaving 0 free for the UNKNOWN member.
KEY_MODULUS = 2147483646


def _as_cols(cols: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def scd_hash(cols: Sequence[str | Column], sep: str = "||") -> Column:
    """SHA-256 change-detection hash over null-coalesced stringified
    columns (reference recipe at
    ``src/silver/trips_bronze_to_silver.py:286-319``).

    Caution (SURVEY.md §7 risk 3): include only columns whose string
    rendering is stable across engines (strings/ints/dates) — double
    rendering differs between runtimes.
    """
    parts = [F.coalesce(c.cast("string"), F.lit("")) for c in _as_cols(cols)]
    return F.sha2(F.concat_ws(sep, *parts), 256)


def surrogate_int_key(cols: Sequence[str | Column]) -> Column:
    """Deterministic positive int surrogate key:
    ``pmod(xxhash64(concat_ws('||', …)), 2147483646) + 1``
    (reference ``fact_payments.py:135``, ``static/dim_payment.py:107``)."""
    parts = [F.coalesce(c.cast("string"), F.lit("")) for c in _as_cols(cols)]
    h = F.xxhash64(F.concat_ws("||", *parts))
    return (F.pmod(h, F.lit(KEY_MODULUS)) + 1).cast("int")


def md5_int_key(cols: Sequence[str | Column]) -> Column:
    """Portable int surrogate key: first 15 hex chars of md5 → base-16 int
    (60 bits, fits a long) → pmod+1. Bit-reproducible in any engine with
    md5, unlike xxhash64."""
    parts = [F.coalesce(c.cast("string"), F.lit("")) for c in _as_cols(cols)]
    h15 = F.substring(F.md5(F.concat_ws("||", *parts)), 1, 15)
    as_long = F.conv(h15, 16, 10).cast("long")
    return (F.pmod(as_long, F.lit(KEY_MODULUS)) + 1).cast("int")


def rendezvous_shard(key: str | Column, n_shards: int) -> Column:
    """Rendezvous (highest-random-weight, Thaler & Ravishankar 1998)
    shard assignment: shard = argmax_s md5(key '#' s).

    The property that matters at 100 TB: growing ``n_shards`` by one
    moves ONLY the keys whose new shard wins the argmax — an expected
    1/(n+1) of the corpus — where ``pmod(hash, n)`` reshuffles ~all of
    it. Entirely map-side: a ``greatest`` over ``n_shards`` (weight,
    shard) structs, no shuffle, no lookup table. Weights are fixed-width
    md5 hex prefixes (lexicographic == numeric); ties are impossible in
    practice and break to the higher shard (``greatest`` on the struct).
    """
    k = _as_cols([key])[0].cast("string")
    candidates = [
        F.struct(
            F.substring(F.md5(F.concat_ws("#", k, F.lit(str(s)))), 1, 16).alias("w"),
            F.lit(s).alias("shard"),
        )
        for s in range(n_shards)
    ]
    return F.greatest(*candidates).getField("shard")
