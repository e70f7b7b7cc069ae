"""extensions/graph.py: PageRank invariants on a known small graph.
The catalog query trade_network_pagerank is hash-checked against the
unrolled-CTE oracle by test_parity_oracle."""

from __future__ import annotations

import pytest

from urban_mobility_data_pipeline_spark.cache import release_scratch
from urban_mobility_data_pipeline_spark.extensions.graph import pagerank


@pytest.fixture
def star_edges(spark):
    # hub h connected to 4 spokes, bidirectional
    pairs = [("h", f"s{i}") for i in range(4)]
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src string, dst string")


def test_pagerank_star(spark, star_edges):
    ranks = {r["node"]: r["rank"] for r in pagerank(star_edges).collect()}
    release_scratch()
    assert set(ranks) == {"h", "s0", "s1", "s2", "s3"}
    # probability mass ~1 (quantization loses <1e-10)
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    # the hub dominates every spoke, spokes are symmetric
    assert all(ranks["h"] > ranks[f"s{i}"] for i in range(4))
    assert len({ranks[f"s{i}"] for i in range(4)}) == 1


def test_pagerank_deterministic_across_partitionings(spark, star_edges):
    a = sorted(map(tuple, pagerank(star_edges).collect()))
    release_scratch()
    b = sorted(
        map(tuple, pagerank(star_edges.repartition(7)).collect())
    )
    release_scratch()
    assert a == b


def test_pagerank_uniform_on_cycle(spark):
    # directed 3-cycle given in both directions = every node identical
    nodes = ["a", "b", "c"]
    rows = []
    for i, u in enumerate(nodes):
        v = nodes[(i + 1) % 3]
        rows += [(u, v), (v, u)]
    edges = spark.createDataFrame(rows, "src string, dst string")
    ranks = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    release_scratch()
    assert len(set(ranks.values())) == 1
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
