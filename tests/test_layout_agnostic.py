"""Layout-agnostic table loading (VERDICT r8 item 8).

The driver ships one FILE per table (``events.parquet``), but every
distributed writer produces a DIRECTORY of part files — and a real
warehouse often drops the ``.parquet`` suffix entirely. The engine's
loaders (``sources.files.load_table`` / ``plans._helpers.table`` /
``plans.streaming_q._stream_table``) must read all three shapes
identically; the streaming glob previously matched ZERO files on a
directory-shaped table (the pathGlobFilter harness bug caught by
BENCH_SCALING r8).

A representative query slice — TPC-H-ish join/agg, union showcase,
documents gate, embeddings top-k, indexed BM25, and a REAL streaming
query — runs against a multi-file copy of sf0.001 where half the
tables are ``{name}.parquet/`` directories and half are bare
``{name}/`` directories, and must match the single-file run row for
row."""

from __future__ import annotations

import math

import pytest

from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES
from urban_mobility_data_pipeline_spark.sources.files import (
    TESTDATA_TABLES,
    load_table,
    resolve_table_path,
)

SLICE = [
    "daily_sales_recompute",
    "event_scalar_union_showcase",
    "documents_gopher_gate",
    "embedding_bq_hamming_topk",
    "doc_bm25_topk_indexed",
    "streaming_hourly_event_counts",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if math.isnan(v) else repr(round(v, 9))
    return str(v)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_canon(r[c]) for c in cols) for r in df.collect()
    )


@pytest.fixture(scope="module")
def multi_file_sf(spark, sf_dir, tmp_path_factory):
    """sf0.001 rewritten as directory-shaped tables, 3 part files each;
    alternating bare-dir / suffixed-dir naming."""
    dst = tmp_path_factory.mktemp("multi_layout")
    for i, t in enumerate(TESTDATA_TABLES):
        df = load_table(spark, sf_dir, t)
        name = t if i % 2 == 0 else f"{t}.parquet"
        df.repartition(3).write.parquet(str(dst / name))
    return str(dst)


def test_resolver_accepts_all_shapes(spark, sf_dir, multi_file_sf):
    for i, t in enumerate(TESTDATA_TABLES):
        path, is_dir = resolve_table_path(spark, multi_file_sf, t)
        assert is_dir, t
        want = t if i % 2 == 0 else f"{t}.parquet"
        assert path.endswith(want), (t, path)
        fpath, fdir = resolve_table_path(spark, sf_dir, t)
        assert fpath.endswith(f"{t}.parquet"), (t, fpath)
    # row counts survive the rewrite
    for t in ("events", "documents", "lineitem"):
        a = load_table(spark, sf_dir, t).count()
        b = load_table(spark, multi_file_sf, t).count()
        assert a == b, t


@pytest.mark.parametrize("qname", SLICE)
def test_query_slice_matches_on_directory_layout(
    spark, sf_dir, multi_file_sf, qname
):
    got = _rows(QUERIES[qname](spark, multi_file_sf))
    want = _rows(QUERIES[qname](spark, sf_dir))
    assert got == want, qname
