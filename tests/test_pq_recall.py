"""PQ / IVF-PQ recall characterization (VERDICT r6 item 5).

Mirrors the IVF recall-curve tests in test_similarity_ivf.py: on a
clustered synthetic corpus — the workload PQ is for — recall@10 vs the
exact cosine top-k is measured across the quantizer's three dials:

* ``m``       — number of subspaces (effective cells = ncodes^m, the
                product-expressiveness axis),
* ``ncodes``  — codebook size per subspace (the nbits axis:
                nbits = log2(ncodes)),
* ``nprobe``  — IVF coarse-quantizer pruning in the composed IVF-PQ.

Floors are documented from measurement (see each test's docstring),
not aspirational: the grid was swept once on the committed seed and
the assertions pin the observed values with slack.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.similarity import (
    _subvectors,
    cosine_topk,
    ivf_assign,
    ivf_centroids,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)
from urban_mobility_data_pipeline_spark.functions.vectors import cosine, norm

DIM, N_CLUSTERS, PER_CLUSTER = 16, 40, 12
QIDS = [0, 121, 305]
K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    """Deterministic clustered corpus: 40 well-separated centers x 12
    points, noise << center separation, label = cluster id. Returns
    (raw, l2-normalized, exact top-10 sets per query)."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(N_CLUSTERS, DIM)) * 10.0
    rows, vid = [], 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + rng.normal(size=DIM)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    raw = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()
    n = norm("embedding")
    normed = raw.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double") / n).alias(
            "embedding"
        ),
    ).cache()
    normed.count()
    exact = {
        q: {r["vec_id"] for r in cosine_topk(normed, q, k=K).collect()}
        for q in QIDS
    }
    yield raw, normed, exact
    raw.unpersist()
    normed.unpersist()


def _recall(raw, normed, exact, m, ncodes=N_CLUSTERS, nprobe=None, dim=DIM):
    """recall@10 averaged over QIDS for a (m, ncodes, nprobe) config.

    ncodes < N_CLUSTERS coarsens the codebook by folding labels
    (label % ncodes) BEFORE the per-label means — fewer, blurrier
    codewords, exactly what a smaller nbits buys. nprobe=None is plain
    PQ over the whole corpus; an int composes the IVF coarse stage the
    same way embedding_ivfpq_topk does."""
    subdim = dim // m
    cb = pq_codebooks(
        normed.withColumn("label", F.col("label") % ncodes), subdim=subdim
    )
    codes_all = pq_encode(normed, cb, m=m, subdim=subdim).cache()
    if nprobe is not None:
        cents = ivf_centroids(raw).select(
            "cell",
            F.transform("centroid", lambda x: F.round(x, 6)).alias(
                "centroid"
            ),
        )
        assigned = ivf_assign(raw, cents)
    hits = 0
    for q in exact:
        codes = codes_all.where(F.col("vec_id") != q)
        if nprobe is not None:
            qv = raw.where(F.col("vec_id") == q).select(
                F.col("embedding").alias("__qv")
            )
            cell_rank = (
                cents.join(F.broadcast(qv))
                .select("cell", cosine("centroid", "__qv").alias("__s"))
                .orderBy(F.desc("__s"), F.asc("cell"))
                .limit(nprobe)
                .select("cell")
            )
            cand = assigned.join(F.broadcast(cell_rank), "cell").select(
                "vec_id"
            )
            codes = codes.join(cand, "vec_id", "left_semi")
        qsub = (
            normed.where(F.col("vec_id") == q)
            .select(_subvectors("embedding", m, subdim).alias("s"))
            .select(F.col("s.j").alias("j"), F.col("s.sv").alias("sv"))
        )
        got = {
            r["vec_id"] for r in pq_adc_topk(codes, cb, qsub, k=K).collect()
        }
        hits += len(got & exact[q])
    codes_all.unpersist()
    return hits / (K * len(exact))


def test_pq_recall_grows_with_m_at_fixed_nbits(corpus):
    """The defining PQ tradeoff: at a FIXED per-subspace codebook size
    (ncodes=5, ~2.3 bits), splitting into more subspaces multiplies the
    effective cell count (5^m) and recall climbs accordingly. Measured
    on the committed seed: m=1 -> 0.37, m=2 -> 0.77, m=4 -> 0.93."""
    raw, normed, exact = corpus
    curve = {m: _recall(raw, normed, exact, m, ncodes=5) for m in (1, 2, 4)}
    assert curve[1] <= 0.6, curve  # a 5-codeword flat quantizer is coarse
    assert curve[2] >= curve[1], curve
    assert curve[4] >= curve[2], curve
    assert curve[4] >= 0.8, curve  # 5^4 = 625 effective cells


def test_pq_recall_grows_with_codebook_size(corpus):
    """The nbits axis at m=1 (pure vector quantization, no product):
    5 codewords -> 0.37 measured, 40 codewords (one per true cluster)
    -> 0.93. More bits per subspace buys recall."""
    raw, normed, exact = corpus
    coarse = _recall(raw, normed, exact, 1, ncodes=5)
    fine = _recall(raw, normed, exact, 1, ncodes=N_CLUSTERS)
    assert coarse <= 0.6, coarse
    assert fine >= 0.8, fine
    assert fine > coarse


def test_pq_recall_floor_on_clustered_corpus(corpus):
    """Where PQ's contract applies (label centroids approximate the
    vectors), every adequate config holds recall@10 >= 0.8: measured
    0.90-0.93 for m in {2, 4, 8} at ncodes=40."""
    raw, normed, exact = corpus
    for m in (2, 4, 8):
        r = _recall(raw, normed, exact, m)
        assert r >= 0.8, (m, r)


def test_ivfpq_recall_monotone_in_nprobe_and_converges_to_pq(corpus):
    """The composed IVF-PQ: recall is non-decreasing in nprobe, holds
    the 0.8 floor already at nprobe=1 on a clustered corpus (the right
    cell is found immediately — same claim the IVF curve test pins),
    and at nprobe = all cells the IVF stage prunes nothing, so recall
    equals plain PQ's exactly."""
    raw, normed, exact = corpus
    curve = [
        _recall(raw, normed, exact, 4, nprobe=p) for p in (1, 2, 4, N_CLUSTERS)
    ]
    assert all(a <= b + 1e-9 for a, b in zip(curve, curve[1:])), curve
    assert curve[0] >= 0.8, curve
    assert curve[-1] == _recall(raw, normed, exact, 4), curve


def test_pq_recall_on_unclustered_fixture(spark, sf_dir):
    """The driver fixture's 64-dim vectors carry no per-label cosine
    structure, so mean-per-label codewords are weak — the measured
    curve (m=1 -> 0.03, m=4 -> 0.17, m=16 -> 0.30) stays low but rises
    with m: finer subspace splits recover direction information even
    from an uninformative codebook. Pins that the quantizer degrades
    GRACEFULLY (more subspaces never hurt badly) rather than asserting
    clustered-corpus floors the data cannot support."""
    fixture_qids = [0, 7, 42]  # the measured query set
    raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = norm("embedding")
    normed = raw.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double") / n).alias(
            "embedding"
        ),
    ).cache()
    exact = {
        q: {r["vec_id"] for r in cosine_topk(normed, q, k=K).collect()}
        for q in fixture_qids
    }
    lo = _recall(raw, normed, exact, 1, ncodes=10, dim=64)
    hi = _recall(raw, normed, exact, 16, ncodes=10, dim=64)
    normed.unpersist()
    assert hi > lo, (lo, hi)
    assert hi >= 0.2, hi
