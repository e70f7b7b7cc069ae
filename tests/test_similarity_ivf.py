"""IVF similarity search: assignment, pruning, recall vs brute force."""

from __future__ import annotations

from urban_mobility_data_pipeline_spark.extensions.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_centroids,
    ivf_topk,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_assignment_covers_all_vectors(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    assert cents.count() == 10  # one per label
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()  # every vector in exactly one cell
    assert assigned.select("cell").distinct().count() <= 10


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    exact = {r["vec_id"] for r in cosine_topk(emb, 0, k=10).collect()}
    probe_all = {
        r["vec_id"]
        for r in ivf_topk(emb, cents, 0, k=10, nprobe=10).collect()
    }
    assert probe_all == exact  # nprobe = all cells ⇒ exhaustive ⇒ exact
    probe1 = ivf_topk(emb, cents, 0, k=10, nprobe=3).collect()
    assert len(probe1) == 10
    recall = len({r["vec_id"] for r in probe1} & exact) / 10
    assert recall >= 0.3  # pruned search still finds a meaningful fraction
