"""Every catalog query with an oracle must hash-match DuckDB at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from urban_mobility_data_pipeline_spark.plans.catalog import ORACLES, QUERIES
from tests._compare import compare, duck_connection

_ORACLE_NAMES = sorted(ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_every_query_has_callable():
    for name in ORACLES:
        assert name in QUERIES, f"oracle without query: {name}"


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_parity(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLES[name], name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
