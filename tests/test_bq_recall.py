"""Binary-quantization (sign-bit) search characterization.

Mirrors test_pq_recall.py: on a clustered synthetic corpus (dim=64 so
the codes pack into exactly two 32-bit words), recall@10 of the
Hamming-candidates -> exact-cosine-rerank pipeline is measured against
the exact cosine top-k, across the candidate-set size dial. Floors are
pinned from measurement on the committed seed, with slack.

Also pins the packing contract itself: bq_codes' two words reproduce a
NumPy sign-bit reference bit-for-bit (MSB-first fold, strict > 0).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.similarity import (
    bq_codes,
    bq_hamming_topk,
    cosine_topk,
)

DIM, N_CLUSTERS, PER_CLUSTER = 64, 30, 12
QIDS = [0, 97, 241]
K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(N_CLUSTERS, DIM)) * 8.0
    rows, vid = [], 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + rng.normal(size=DIM)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    raw = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()
    exact = {
        q: {
            r["vec_id"]
            for r in cosine_topk(raw, query_vec_id=q, k=K).collect()
        }
        for q in QIDS
    }
    yield raw, rows, exact
    raw.unpersist()


def test_bq_codes_match_numpy_reference(corpus):
    raw, rows, _ = corpus
    got = {r["vec_id"]: (r["bq_lo"], r["bq_hi"]) for r in
           bq_codes(raw, dim=DIM).collect()}
    for vid, vec, _label in rows[:50]:
        bits = [1 if x > 0 else 0 for x in vec]
        lo = int("".join(map(str, bits[:32])), 2)
        hi = int("".join(map(str, bits[32:])), 2)
        assert got[vid] == (lo, hi), vid


def _recall(raw, exact, candidates):
    hits = total = 0
    for q in QIDS:
        got = {
            r["vec_id"]
            for r in bq_hamming_topk(
                raw, query_vec_id=q, dim=DIM, k=K, candidates=candidates
            ).collect()
        }
        hits += len(got & exact[q])
        total += K
    return hits / total


def test_bq_recall_clustered(corpus):
    """On the clustered corpus — the workload binary embeddings are
    deployed for (neighbors share a center, so they share most sign
    bits) — measured recall@10 on seed 7 is 1.00 at EVERY candidate
    size down to 20. Floor 0.95 keeps jitter slack."""
    raw, _, exact = corpus
    assert _recall(raw, exact, 20) >= 0.95


@pytest.mark.parametrize(
    "candidates,floor",
    [(20, 0.30), (40, 0.60), (80, 0.65)],
)
def test_bq_recall_isotropic_worst_case(spark, candidates, floor):
    """Worst case for 1-bit codes: isotropic gaussian vectors (no
    cluster structure, all cosines near 0, sign agreement ~ coin
    flips). Measured on seed 7 (360 vectors): recall@10 =
    0.40/0.70/0.73 at 20/40/80 candidates — the candidates dial buys
    recall roughly linearly until the Hamming signal saturates. Floors
    pin the measured curve with slack; the clustered test above shows
    the same codes at recall 1.0, bounding the structure-dependence of
    the method from both sides."""
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=DIM)], 0) for i in range(360)
    ]
    raw = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()
    try:
        exact = {
            q: {
                r["vec_id"]
                for r in cosine_topk(raw, query_vec_id=q, k=K).collect()
            }
            for q in QIDS
        }
        assert _recall(raw, exact, candidates) >= floor
    finally:
        raw.unpersist()


def test_bq_candidates_bound_rerank(corpus):
    """The rerank never scores more than `candidates` float vectors:
    with candidates == K the output is exactly the K Hamming winners."""
    raw, _, _ = corpus
    out = bq_hamming_topk(
        raw, query_vec_id=0, dim=DIM, k=K, candidates=K
    ).collect()
    assert len(out) == K
    assert all(r["hamming"] is not None for r in out)
