"""Connected-components algorithms (VERDICT r3 item 7): min-label
propagation vs alternating large-star/small-star, which must agree and
the star variant must converge in O(log n) rounds on a chain — the
adversarial case for label propagation (O(diameter))."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.dedup import (
    connected_components,
)


def _labels(df) -> dict[int, int]:
    return {r["node"]: r["label"] for r in df.collect()}


def _run(spark, edge_rows, node_ids, algorithm, stats=None):
    edges = spark.createDataFrame(
        edge_rows or [(None, None)], "doc_a long, doc_b long"
    )
    if not edge_rows:
        edges = edges.filter(F.col("doc_a").isNotNull())
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    return _labels(
        connected_components(
            edges, nodes, algorithm=algorithm, stats=stats,
            max_iterations=50,
        )
    )


def test_star_chain_graph_logarithmic_rounds(spark):
    """50-node chain: label propagation needs ~diameter rounds; the
    large-star/small-star variant must finish in <=7."""
    chain = [(i, i + 1) for i in range(49)]
    stats: dict = {}
    got = _run(spark, chain, range(50), "star", stats)
    assert got == {i: 0 for i in range(50)}
    assert stats["algorithm"] == "star"
    assert stats["rounds"] <= 7, stats


def test_star_and_label_agree_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(45)
    ]
    a = _run(spark, edges, nodes, "label")
    b = _run(spark, edges, nodes, "star")
    assert a == b
    # labels are component minima: every label labels itself
    assert all(a[lbl] == lbl for lbl in set(a.values()))


def test_isolated_nodes_label_themselves(spark):
    got = _run(spark, [(1, 2)], [1, 2, 3, 4], "star")
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}
    got = _run(spark, [(1, 2)], [1, 2, 3, 4], "label")
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


def test_two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge edge form one component."""
    cl1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    bridge = [(3, 10)]
    for alg in ("label", "star"):
        got = _run(spark, cl1 + cl2 + bridge, list(range(4)) + list(range(10, 14)), alg)
        assert set(got.values()) == {0}, (alg, got)


def test_auto_shallow_graph_stays_label(spark):
    """Shallow dup-clique graph: auto converges inside the label probe
    and never pays the star fallback."""
    cl = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    stats: dict = {}
    got = _run(spark, cl, range(5), "auto", stats)
    assert got == {i: 0 for i in range(5)}
    assert stats["algorithm"] == "auto+label"
    assert stats["converged"] and stats["rounds"] <= 4


def test_auto_deep_chain_falls_back_to_star(spark):
    """80-node chain: the 8-round label probe can't converge; auto
    contracts through the partial labels and star finishes — total
    rounds stay far below the 79-round label cost."""
    chain = [(i, i + 1) for i in range(79)]
    stats: dict = {}
    got = _run(spark, chain, range(80), "auto", stats)
    assert got == {i: 0 for i in range(80)}
    assert stats["algorithm"] == "auto+star"
    assert stats["converged"]
    assert stats["rounds"] <= 18, stats  # 8 probe + O(log n) star; vs 79 label-only


def _union_find_reference(n_nodes, edge_rows):
    """Plain-Python union-find with min-label canonicalization."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def test_randomized_cross_check_vs_union_find(spark):
    """Both distributed algorithms match a sequential union-find on
    random graphs across densities (sparse forest → near-complete)."""
    for seed, n, m in ((11, 30, 12), (12, 40, 40), (13, 25, 140)):
        rng = random.Random(seed)
        edge_rows = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        expected = _union_find_reference(n, edge_rows)
        for alg in ("label", "star"):
            got = _run(spark, edge_rows, range(n), alg)
            assert got == expected, (seed, alg)


def test_unconverged_without_stats_raises(spark):
    """Exhausting max_iterations with stats=None must raise, not hand
    back partial labels indistinguishable from correct output
    (ADVICE r4)."""
    import pytest

    chain = [(i, i + 1) for i in range(30)]
    edges = spark.createDataFrame(chain, "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(n,) for n in range(31)], "doc_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            edges, nodes, algorithm="label", max_iterations=3
        )
    # opting in via stats returns the partial labels + converged=False
    stats: dict = {}
    connected_components(
        edges, nodes, algorithm="label", max_iterations=3, stats=stats
    )
    assert stats["converged"] is False


def test_scratch_rounds_reclaimed_eagerly(spark, tmp_path, monkeypatch):
    """Only the final round's scratch (plus pinned stage inputs) may
    remain on disk after a call — intermediate rounds are deleted as
    soon as the next round supersedes them (ADVICE/VERDICT r4)."""
    import os
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    chain = [(i, i + 1) for i in range(8)]
    edges = spark.createDataFrame(chain, "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(n,) for n in range(9)], "doc_id long")
    out = connected_components(edges, nodes, algorithm="label")
    assert {r["label"] for r in out.collect()} == {0}
    scratch_dirs = [
        d for d in os.listdir(tmp_path) if d.startswith("umdp_cc_rounds_")
    ]
    assert len(scratch_dirs) == 1
    contents = sorted(os.listdir(tmp_path / scratch_dirs[0]))
    # pinned symmetrized edge table + exactly ONE surviving label round
    assert contents[0] == "edges"
    assert len(contents) == 2 and contents[1].startswith("labels_"), contents


def test_simhash_banding_candidates_are_exact(spark, sf_dir):
    """Pigeonhole guarantee: for max_hamming=3 < 4 bands, the banded
    candidate set must equal brute-force all-pairs hamming <= 3 — the
    verify step filters, it can never miss a pair."""
    from urban_mobility_data_pipeline_spark.extensions.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    sigs = {
        r["doc_id"]: r["simhash32"]
        for r in simhash_signatures(docs).collect()
    }
    ids = sorted(sigs)
    brute = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert banded == brute
    assert len(brute) > 0  # the fixture genuinely exercises the path


def test_cross_corpus_near_dups_matches_self_join_restriction(spark, sf_dir):
    """Semantic pin for the contamination operator: splitting a corpus
    into A (low ids) and B (high ids), cross_corpus_near_dups(A, B)
    must equal the (a in A, b in B) restriction of the single-corpus
    near_dup_pairs — same bands, same verify, different join shape."""
    from urban_mobility_data_pipeline_spark.extensions.dedup import (
        cross_corpus_near_dups,
        near_dup_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mid = 250
    a = docs.filter(F.col("doc_id") < mid)
    b = docs.filter(F.col("doc_id") >= mid)
    cross = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in cross_corpus_near_dups(a, b, threshold=0.1).collect()
    }
    # ids in A are all < ids in B, so near_dup_pairs' doc_a<doc_b cross
    # pairs are exactly the (A, B)-sided ones
    full = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in near_dup_pairs(docs, threshold=0.1).collect()
        if r["doc_a"] < mid <= r["doc_b"]
    }
    assert cross == full
    assert len(cross) > 0  # the fixture genuinely exercises the path
