"""Driver-slot pre-flight: the EXACT contract the external driver
exercises — the 50 rotating slots from __spark_entry__.queries(),
each re-run under a HOSTILE (non-UTC) session time zone and compared
to its oracle — as a committed test instead of a manual round-end
ritual. A query that forgets to self-pin UTC through
configure_session fails here before it can fail a driver round."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests._compare import compare, duck_connection

HOSTILE_TZ = "America/New_York"

_SLOTS = sorted(entry.oracle_sql())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_contract_shape():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert len(qs) == 50
    assert set(osql) <= set(qs)


def test_entry_smoke_under_hostile_tz(spark):
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    try:
        assert entry.entry(spark).count() > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


@pytest.mark.parametrize("name", _SLOTS)
def test_driver_slot_under_hostile_tz(name, spark, sf_dir, duck):
    # poison EVERY semantics-bearing conf before every call — the
    # query must re-pin them itself (configure_session._SEMANTIC_KEYS)
    # for timestamp columns to hash identically to the oracle and for
    # mid-query MergeTable writes to keep stats-bearing TIMESTAMP_MICROS
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        df = entry.queries()[name](spark, sf_dir)
        compare(df, duck, entry.oracle_sql()[name], name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
