"""Rule-based cleaning operators (SURVEY.md §2.2 P4-P10).

The reference repeats these per-table as 50-line ``withColumn`` chains
(e.g. ``src/silver/trips_bronze_to_silver.py:132-190``); here they are
parameterized, single-``select`` transformations so the logical plan stays
small and whole-stage codegen keeps one projection node.

All operators are pure ``DataFrame -> DataFrame`` with only built-in
JVM-side expressions — no UDFs — so Catalyst can push the resulting
predicates/projections into scans.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Strings the reference treats as NULL after trim+lower
#: (``src/silver/trips_bronze_to_silver.py:162-170``).
NULL_LIKES = ("null", "n/a", "none", "-", "")


def scrub_null_likes(col: Column | str) -> Column:
    """NULL-out null-like free text (reference P5,
    ``src/silver/trips_bronze_to_silver.py:132,162-170``).

    trim → if lower(trimmed) ∈ NULL_LIKES then NULL else trimmed.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(F.lower(c).isin(*NULL_LIKES), F.lit(None)).otherwise(c)


def normalize_strings(
    df: DataFrame,
    lower_cols: Iterable[str] = (),
    upper_cols: Iterable[str] = (),
    scrub_cols: Iterable[str] = (),
) -> DataFrame:
    """Case/space normalization (reference P7: ``lower(trim())`` for enums &
    emails — ``src/silver/trips_bronze_to_silver.py:159-172``;
    ``upper(trim())`` for plates/currency — ``vehicles:142-149``)."""
    exprs: dict[str, Column] = {}
    for c in lower_cols:
        exprs[c] = F.lower(F.trim(F.col(c)))
    for c in upper_cols:
        exprs[c] = F.upper(F.trim(F.col(c)))
    for c in scrub_cols:
        exprs[c] = scrub_null_likes(c)
    return df.withColumns(exprs)


def null_out_when(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Generic conditional NULL-out: for each ``col -> bad_predicate`` set
    the column NULL where the predicate holds (reference P6 shape)."""
    return df.withColumns(
        {c: F.when(pred, F.lit(None)).otherwise(F.col(c)) for c, pred in rules.items()}
    )


def clamp_domain(
    df: DataFrame,
    non_negative: Iterable[str] = (),
    int_range: Mapping[str, tuple[int, int]] | None = None,
    length_equals: Mapping[str, int] | None = None,
    allowed_values: Mapping[str, Iterable[str]] | None = None,
) -> DataFrame:
    """Domain clamp → NULL (reference P6): negative distance/fare → NULL
    (``trips:148-157,173-178``), amount<0 → NULL (``payments:148-153``),
    score ∉ 1..5 → NULL (``ratings:144-150``), currency len≠3 → NULL
    (``payments:154-160``), enum ∉ allowed set → NULL
    (``drivers:193-196``)."""
    rules: dict[str, Column] = {}
    for c in non_negative:
        rules[c] = F.col(c) < 0
    for c, (lo, hi) in (int_range or {}).items():
        rules[c] = (F.col(c) < lo) | (F.col(c) > hi)
    for c, n in (length_equals or {}).items():
        rules[c] = F.length(F.col(c)) != n
    for c, allowed in (allowed_values or {}).items():
        rules[c] = ~F.col(c).isin(*allowed)
    return null_out_when(df, rules)


EMAIL_RE = r"^[^@\s]+@[^@\s]+\.[^@\s]+$"


def email_invalid_flag(col: Column | str) -> Column:
    """Invalid-email DQ flag (reference P8,
    ``src/silver/passengers_bronze_to_silver.py:228-232``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~c.rlike(EMAIL_RE)


def dq_flags(df: DataFrame, flags: Mapping[str, Column]) -> DataFrame:
    """Attach boolean data-quality flag columns; violations are *recorded*,
    never dropped (reference P9 stance,
    ``src/silver/trips_bronze_to_silver.py:222-281``)."""
    return df.withColumns(dict(flags))


def redact_when(
    df: DataFrame,
    predicate: Column,
    set_values: Mapping[str, Column],
    null_cols: Iterable[str] = (),
) -> DataFrame:
    """Conditional redaction (reference P10 "GDPR safety belt":
    ``is_deleted==true`` ⇒ force ``full_name='ANONYMIZED'``,
    email/phone/city NULL — ``passengers_bronze_to_silver.py:170-192``)."""
    exprs: dict[str, Column] = {}
    for c, v in set_values.items():
        exprs[c] = F.when(predicate, v).otherwise(F.col(c))
    for c in null_cols:
        exprs[c] = F.when(predicate, F.lit(None)).otherwise(F.col(c))
    return df.withColumns(exprs)
