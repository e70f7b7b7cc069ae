"""Lloyd's spherical k-means (extensions/similarity.py:spherical_kmeans).

Gold check: a pure-NumPy replica of the exact contract (lowest-id init,
argmax-cosine assignment with lower-cell ties, 6dp-rounded positional
means) must agree label-for-label. Plus the classic Lloyd's property:
the spherical objective (mean cosine to the assigned centroid) is
non-decreasing over iterations.
"""

from __future__ import annotations

import numpy as np
import pytest

from urban_mobility_data_pipeline_spark.extensions.similarity import (
    spherical_kmeans,
)

K, ITERS = 8, 3


def _load(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids[order], vecs[order]


def _gold_assign(vecs, cents):
    # cosine matrix; argmax with lower-cell tiebreak (np.argmax keeps
    # the first max, and cells are ordered)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = vn @ cn.T
    return sims.argmax(axis=1), sims


def _gold_kmeans(ids, vecs, k, iters):
    cents = vecs[:k].copy()
    cells = np.arange(k)
    for _ in range(iters):
        lab_idx, _ = _gold_assign(vecs, cents)
        labels = cells[lab_idx]
        new_cells, new_cents = [], []
        for c in sorted(set(labels.tolist())):
            new_cells.append(c)
            new_cents.append(np.round(vecs[labels == c].mean(axis=0), 6))
        cells, cents = np.array(new_cells), np.array(new_cents)
    lab_idx, sims = _gold_assign(vecs, cents)
    return cells[lab_idx], sims.max(axis=1), cells, cents


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assignments, cents = spherical_kmeans(emb, k=K, iters=ITERS)
    return assignments.collect(), cents.collect()


def test_matches_numpy_gold(spark, sf_dir, result):
    ids, vecs = _load(spark, sf_dir)
    gold_labels, gold_sims, _, _ = _gold_kmeans(ids, vecs, K, ITERS)
    gold = dict(zip(ids.tolist(), gold_labels.tolist()))
    gold_cos = dict(zip(ids.tolist(), gold_sims.tolist()))
    assignment_rows, _ = result
    assert len(assignment_rows) == len(ids)
    for r in assignment_rows:
        assert gold[r.vec_id] == r.cell, f"vec {r.vec_id}"
        assert abs(gold_cos[r.vec_id] - r.centroid_cos) < 5e-6


def test_centroids_are_rounded_means(result):
    _, cent_rows = result
    for r in cent_rows:
        for comp in r.centroid:
            assert comp == round(comp, 6)


def test_objective_monotone(spark, sf_dir):
    ids, vecs = _load(spark, sf_dir)
    objs = []
    for t in range(1, ITERS + 1):
        _, sims, _, _ = _gold_kmeans(ids, vecs, K, t)
        objs.append(sims.mean())
    # 6dp centroid rounding can nudge the objective by ~1e-6 at most
    for a, b in zip(objs, objs[1:]):
        assert b >= a - 1e-5, objs


def test_all_cells_survive(result):
    assignment_rows, cent_rows = result
    assert {r.cell for r in cent_rows} == set(range(K))
    assert {r.cell for r in assignment_rows} == set(range(K))


def test_kmeans_centroids_drive_ivf(spark, sf_dir):
    """The trained quantizer is a drop-in for the IVF contract: search
    through spherical_kmeans centroids reaches the recall floor of the
    label-mean stand-in at the same nprobe, and nprobe=k is exact."""
    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, cents = spherical_kmeans(emb, k=K, iters=ITERS)
    exact = {r.vec_id for r in cosine_topk(emb, 0, k=10).collect()}
    full = {
        r.vec_id for r in ivf_topk(emb, cents, 0, k=10, nprobe=K).collect()
    }
    assert full == exact
    pruned = {
        r.vec_id for r in ivf_topk(emb, cents, 0, k=10, nprobe=3).collect()
    }
    assert len(pruned & exact) / 10 >= 0.3
