"""Spark-vs-DuckDB comparison harness mirroring the driver's correctness
gate: row-count + schema (column names) + order-insensitive value
comparison on the same parquet tables."""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from urban_mobility_data_pipeline_spark.sources.files import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    return sorted(out)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> None:
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()
    # NaN→None normalization happens in _canon_cell
    a_cols, e_cols = sorted(actual.columns), sorted(expected.columns)
    assert a_cols == e_cols, f"{name}: column mismatch {a_cols} vs {e_cols}"
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} vs {len(expected)}"
    )
    a_rows, e_rows = canonical_rows(actual), canonical_rows(expected)
    mismatches = [
        (i, x, y) for i, (x, y) in enumerate(zip(a_rows, e_rows)) if x != y
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
