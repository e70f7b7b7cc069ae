"""The adaptive SemDeDup quantizer's STRIDE-SAMPLED training path
(engaged only when the corpus exceeds ~40 vectors per centroid — no
driver testdata scale reaches that, so this pin builds one that does)
must hash-match the unrolled DuckDB oracle exactly: same k, same
stride, same sampled k-means trajectory, same verdicts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests._compare import compare
from urban_mobility_data_pipeline_spark.extensions.similarity import (
    TRAIN_PER_CENTROID,
    adaptive_quantizer_k,
    semantic_dedup,
)
from urban_mobility_data_pipeline_spark.plans.llm_ops import (
    _adaptive_semdedup_oracle,
)


@pytest.fixture(scope="module")
def synth_emb(spark, tmp_path_factory):
    """6,000 16-d vectors in 12 planted directions + id-keyed jitter:
    k = ceil(sqrt(4*6000)) = 155, 40*155 = 6200 < 2*6000 so
    stride = ceil(6000/6200) = 1... bump N so stride >= 2."""
    n = 14_000
    k = adaptive_quantizer_k(n)
    stride = max(1, -(-n // (TRAIN_PER_CENTROID * k)))
    assert stride >= 2, (n, k, stride)  # the path under test
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: (
                F.cos((F.col("id") % 12).cast("double") * i.cast("double"))
                + F.pmod(F.xxhash64(F.col("id"), i), F.lit(997)).cast(
                    "double"
                )
                / 997.0
                * 0.3
            ).cast("float"),
        ).alias("embedding"),
    )
    path = tmp_path_factory.mktemp("stride_emb") / "embeddings.parquet"
    df.coalesce(1).write.parquet(str(path))
    return str(path)


def test_stride_sampled_training_matches_oracle(spark, synth_emb):
    emb = spark.read.parquet(synth_emb)
    got = semantic_dedup(emb, threshold=0.35)
    con = duckdb.connect()
    # Spark wrote a directory-shaped table; DuckDB needs the part glob
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{synth_emb}/*.parquet'"
    )
    compare(
        got,
        con,
        _adaptive_semdedup_oracle(3, 4.0),
        "adaptive_semdedup_stride",
    )
