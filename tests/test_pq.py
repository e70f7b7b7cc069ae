"""Product quantization (extensions/similarity.py): code-space
properties and ADC search quality against the exact baseline. Both
catalog queries are hash-checked by test_parity_oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.similarity import (
    PQ_M,
    _subvectors,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)
from urban_mobility_data_pipeline_spark.plans._helpers import table

SUBDIM = 64 // PQ_M


def test_codes_are_valid_and_complete(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    n_labels = emb.select("label").distinct().count()
    cb = pq_codebooks(emb, subdim=SUBDIM)
    assert cb.count() == n_labels * PQ_M
    codes = pq_encode(emb, cb, m=PQ_M, subdim=SUBDIM)
    # every vector got exactly one code per subspace, all in range
    assert codes.count() == n_vecs * PQ_M
    bad = codes.where(
        (F.col("code") < 0) | (F.col("code") >= n_labels)
    ).count()
    assert bad == 0


def test_adc_self_query_is_top1(spark, sf_dir):
    """For any query q, score(x) = Σ_j q_j · codeword(x_j) is maximized
    by picking the per-subspace argmax codeword — which is EXACTLY the
    code tuple pq_encode assigns to q itself. So with the query vector
    included in the database, ADC must rank it first (id tiebreak keeps
    it deterministic among same-code vectors: vec 0 wins). This pins
    encode and ADC against each other without relying on the (weak
    per-subspace) label structure of the synthetic embeddings."""
    emb = table(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb, subdim=SUBDIM)
    codes = pq_encode(emb, cb, m=PQ_M, subdim=SUBDIM)  # query included
    qsub = (
        emb.where(F.col("vec_id") == 0)
        .select(_subvectors("embedding", PQ_M, SUBDIM).alias("s"))
        .select(F.col("s.j").alias("j"), F.col("s.sv").alias("sv"))
    )
    top = pq_adc_topk(codes, cb, qsub, k=10).collect()
    assert top[0]["vec_id"] == 0, top[:3]
    # scores are non-increasing down the list
    scores = [r["adc_score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_codes_stable_across_partitionings(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb, subdim=SUBDIM)
    a = sorted(
        map(tuple, pq_encode(emb, cb, m=PQ_M, subdim=SUBDIM).collect())
    )
    emb2 = emb.repartition(13)
    cb2 = pq_codebooks(emb2, subdim=SUBDIM)
    b = sorted(
        map(tuple, pq_encode(emb2, cb2, m=PQ_M, subdim=SUBDIM).collect())
    )
    assert a == b
