"""PII detection/redaction: the regexes run against synthetic literals
(the driver corpus is PII-free by construction, so these fixtures are
where the patterns earn their keep), plus DuckDB parity for the shared
pattern constants."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.functions import pii

FIXTURES = [
    # (text, expected_counts_by_kind, expected_redacted)
    (
        "contact alice@example.com or bob.smith+tag@sub.domain.org now",
        {"email": 2},
        "contact <EMAIL> or <EMAIL> now",
    ),
    (
        "call 555-867-5309 or 555.867.5309",
        {"phone": 2},
        "call <PHONE> or <PHONE>",
    ),
    (
        "card 4111 1111 1111 1111 expires soon",
        {"credit_card": 1},
        "card <CARD> expires soon",
    ),
    (
        "ssn 123-45-6789 on file",
        {"ssn": 1},
        "ssn <SSN> on file",
    ),
    (
        "server at 192.168.0.1 responded",
        {"ipv4": 1},
        "server at <IP> responded",
    ),
    (
        "the quick brown fox 123 jumps",
        {},
        "the quick brown fox 123 jumps",
    ),
    (
        # card digits must NOT additionally count as phone
        "pay 4111-1111-1111-1111 or phone 555-867-5309",
        {"credit_card": 1, "phone": 1},
        "pay <CARD> or phone <PHONE>",
    ),
]


def _scan(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    counts = pii.pii_counts("text")
    return (
        df.select(
            "i",
            *[c.alias(k) for k, c in counts.items()],
            pii.redact_pii("text").alias("redacted"),
        )
        .orderBy("i")
        .collect()
    )


def test_counts_and_redaction(spark):
    rows = _scan(spark, [t for t, _, _ in FIXTURES])
    for row, (text, want, want_red) in zip(rows, FIXTURES):
        for kind, _, _ in pii.PII_PATTERNS:
            assert row[f"n_{kind}"] == want.get(kind, 0), (text, kind)
        assert row.redacted == want_red, text


def test_redaction_idempotent(spark):
    once = [r.redacted for r in _scan(spark, [t for t, _, _ in FIXTURES])]
    twice = [r.redacted for r in _scan(spark, once)]
    assert once == twice


def test_redacted_text_counts_zero(spark):
    redacted = [r.redacted for r in _scan(spark, [t for t, _, _ in FIXTURES])]
    for row in _scan(spark, redacted):
        for kind, _, _ in pii.PII_PATTERNS:
            assert row[f"n_{kind}"] == 0


@pytest.mark.parametrize("text,want,_red", FIXTURES)
def test_duckdb_counts_agree(spark, text, want, _red):
    """The duck_pii_count_sql fragments (used to generate catalog
    oracles) count exactly what the Spark side counts."""
    con = duckdb.connect()
    frags = pii.duck_pii_count_sql("?")
    for kind, _, _ in pii.PII_PATTERNS:
        sql = f"SELECT {frags[f'n_{kind}']}".replace("?", "$tx")
        (got,) = con.execute(sql, {"tx": text}).fetchone()
        assert got == want.get(kind, 0), (text, kind)
    con.close()
