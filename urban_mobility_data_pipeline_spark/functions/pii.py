"""PII detection / redaction Column builders (LLM-pipeline extension,
SURVEY.md §7 phase 6 — the document-surface twin of the reference's
row-level GDPR masking, ``gdpr/gdpr_propagate_erasure.py``).

A pre-training corpus pipeline scrubs PII *inside free text*, not just
in typed columns. Everything here is built-in ``regexp_count`` /
``regexp_replace`` — JVM-side, codegen'd, map-only; the patterns stick
to the regex subset shared by Java (Spark) and RE2 (DuckDB/Go) so the
same constants drive both the engine and its oracle: no lookaround, no
backreferences.

Redaction order matters and is fixed by ``PII_PATTERNS``: credit-card
before phone (a spaced card number contains a phone-shaped substring),
email before anything that could eat its digits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (kind, pattern, placeholder) in redaction order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "credit_card",
        r"\b\d{4}([- ]\d{4}){3}\b",
        "<CARD>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b(\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts (``n_email``, ``n_credit_card``, ...) —
    the audit signal a corpus pipeline aggregates before deciding to
    redact vs drop. One ``regexp_count`` per kind, all map-only."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{kind}": F.regexp_count(c, F.lit(pat)).cast("int")
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its typed placeholder, in
    ``PII_PATTERNS`` order. Idempotent: placeholders contain no digits
    or ``@``, so a second pass matches nothing."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, placeholder in PII_PATTERNS:
        c = F.regexp_replace(c, pat, placeholder)
    return c


def duck_pii_count_sql(text_expr: str) -> dict[str, str]:
    """DuckDB fragments computing the same per-kind counts from the
    same pattern constants (oracle generation — cannot drift)."""
    return {
        f"n_{kind}": (
            f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS INTEGER)"
        )
        for kind, pat, _ in PII_PATTERNS
    }
