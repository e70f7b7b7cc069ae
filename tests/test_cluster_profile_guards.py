"""Cluster-shape config matrix for the plan guards (VERDICT r8 item 6).

Every plan pin elsewhere in the suite runs at the local test profile
(shuffle.partitions=8). A real cluster runs with hundreds of shuffle
partitions, AQE on, and the default broadcast threshold — and a plan
property that silently flips there (a broadcast that becomes a
sort-merge join, a new cartesian product, Python creeping into the hot
path) is exactly the regression the guards exist to catch. This module
re-plans the WHOLE batch catalog plus the key broadcast/top-k pins
under a cluster-ish profile and asserts nothing flips.
"""

from __future__ import annotations

import pytest

from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES

#: the profile a 1000-executor job would actually run with. The
#: size-gated small-table spread is disabled (maxBytes=0) because at
#: cluster scale the corpus exceeds the gate and the spread IS a no-op —
#: this models that; its local-mode invariants live in
#: test_spread_scan.py.
CLUSTER_CONF = {
    "spark.sql.shuffle.partitions": "200",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    "spark.umdp.spread.maxBytes": "0",
}

_BATCH = sorted(n for n in QUERIES if not n.startswith("streaming_"))


@pytest.fixture(scope="module", autouse=True)
def cluster_profile(spark):
    saved = {}
    for k, v in CLUSTER_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _plan(spark, sf_dir, name: str) -> str:
    return (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


@pytest.mark.parametrize("name", _BATCH)
def test_catalog_guards_hold_at_cluster_profile(name, spark, sf_dir):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name


#: key plan-shape pins that must not flip with partition count /
#: broadcast threshold: (query, required substrings, forbidden ones)
KEY_PINS = [
    (
        "corpus_dsir_sample",
        ["TakeOrderedAndProject", "BroadcastHashJoin"],
        ["SortMergeJoin"],
    ),
    (
        "embedding_bq_hamming_topk",
        ["TakeOrderedAndProject", "BroadcastHashJoin"],
        ["SortMergeJoin"],
    ),
    (
        "doc_retrieval_eval_mrr",
        ["windowspecdefinition(query_id", "BroadcastHashJoin"],
        ["SortMergeJoin"],
    ),
    ("documents_gopher_gate", ["FileScan"], ["Exchange"]),
    (
        "doc_bm25_topk_indexed",
        ["TakeOrderedAndProject", "BroadcastHashJoin"],
        ["SortMergeJoin"],
    ),
    (
        "star_latest_dim_showcase",
        ["BroadcastHashJoin"],
        ["SortMergeJoin", "CartesianProduct"],
    ),
]


@pytest.mark.parametrize(
    "name,required,forbidden", KEY_PINS, ids=[p[0] for p in KEY_PINS]
)
def test_key_plan_shapes_hold_at_cluster_profile(
    name, required, forbidden, spark, sf_dir
):
    plan = _plan(spark, sf_dir, name)
    for frag in required:
        assert frag in plan, (name, frag)
    for frag in forbidden:
        assert frag not in plan, (name, frag)
