"""Guard against testdata schema drift on events.ts.

The driver's testdata has shipped events.ts as TIMESTAMP(NANOS) (round
1-2) and TIMESTAMP(MICROS) (round 3+). plans._helpers.table() must
derive the same canonical ts_us (epoch micros, bigint) regardless of
the physical parquet type, so a regeneration can't take down every
events-dependent query again (VERDICT r3 item 1).
"""

from __future__ import annotations

import datetime
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from urban_mobility_data_pipeline_spark.plans._helpers import table


def test_events_ts_us_exists_and_bigint(spark, sf_dir):
    """Whatever the shipped physical type, ts_us must come out bigint."""
    df = table(spark, sf_dir, "events")
    dtypes = dict(df.dtypes)
    assert dtypes.get("ts_us") == "bigint", dtypes


def _roundtrip(spark, unit: str) -> list[int]:
    """Write a tiny events table with ts at the given timestamp unit and
    load it through table(), returning the derived ts_us values."""
    ts = [
        datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
        datetime.datetime(2024, 6, 15, 12, 30, 45, 999999),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["view", "purchase"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    d = tempfile.mkdtemp(prefix=f"umdp_events_{unit}_")
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    df = table(spark, d, "events")
    assert dict(df.dtypes)["ts_us"] == "bigint"
    return [r.ts_us for r in df.orderBy("event_id").select("ts_us").collect()]

def test_ts_us_identical_for_micros_and_nanos(spark):
    """Micros-typed and nanos-typed parquet must yield identical ts_us."""
    expected = [1704067200123456, 1718454645999999]
    assert _roundtrip(spark, "us") == expected
    assert _roundtrip(spark, "ns") == expected


def test_documents_embeddings_schema_expectations(spark, sf_dir):
    """The driver regenerated events.parquet with a different physical
    type between rounds (handled adaptively in plans/_helpers.table);
    this guard makes any documents/embeddings drift fail LOUDLY with
    guidance instead of as 19 cryptic oracle mismatches. If it fires:
    the LLM-ops oracles embed _EMB_DIM=64 hyperplane/centroid literals
    (plans/llm_ops.py) and text recipes keyed to (doc_id, text, lang,
    source, n_chars) — regenerate those constants to match."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert {f.name for f in docs.schema.fields} >= {
        "doc_id", "text", "lang", "source", "n_chars"
    }, f"documents schema drifted: {docs.schema.simpleString()}"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    names = {f.name for f in emb.schema.fields}
    assert names >= {"vec_id", "embedding", "label"}, (
        f"embeddings schema drifted: {emb.schema.simpleString()}"
    )
    dim = emb.selectExpr("size(embedding) AS d").distinct().collect()
    assert [r["d"] for r in dim] == [64], (
        f"embedding dim drifted from 64: {dim} — update _EMB_DIM and the "
        "generated plane/centroid oracle literals in plans/llm_ops.py"
    )
