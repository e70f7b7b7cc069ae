"""Plan-shape pins for the round-7 extension wave: the properties that
make each query scale-safe must survive optimizer/engine upgrades, so
they are asserted on the physical plan, not just prose in docstrings.
(Mirrors test_analytics_extra.py's plan checks for the core catalog.)"""

from __future__ import annotations

import pytest

from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    return (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_dsir_sample_is_takeordered_with_broadcast_models(spark, sf_dir):
    """The resample must forward at most k rows per partition and both
    bucket models must broadcast — never shuffle the corpus on bucket."""
    plan = _plan(spark, sf_dir, "corpus_dsir_sample")
    assert "TakeOrderedAndProject(limit=80" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_bq_topk_is_nested_takeordered(spark, sf_dir):
    """Candidate generation (limit=candidates) and the rerank (limit=k)
    must BOTH plan as TakeOrderedAndProject; the candidate set joins
    back by broadcast, so the float vectors never shuffle."""
    plan = _plan(spark, sf_dir, "embedding_bq_hamming_topk")
    assert "TakeOrderedAndProject(limit=40" in plan
    assert "TakeOrderedAndProject(limit=10" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_retrieval_eval_windows_partition_by_query(spark, sf_dir):
    """Per-query ranking must partition the window on query_id (bounded
    by queries x matching docs) and the stats/df sides must broadcast —
    a SortMergeJoin would mean the corpus is shuffling on tokens."""
    plan = _plan(spark, sf_dir, "doc_retrieval_eval_mrr")
    assert "windowspecdefinition(query_id" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_gopher_gate_is_single_scan_no_shuffle(spark, sf_dir):
    """The rule bundle is map-side only: one scan, no exchange besides
    none at all, no Python. The size-gated small-table spread (its own
    invariants live in test_spread_scan.py) is disabled here so the
    assertion sees the query's OWN shape."""
    spark.conf.set("spark.umdp.spread.maxBytes", "0")
    try:
        plan = _plan(spark, sf_dir, "documents_gopher_gate")
    finally:
        spark.conf.unset("spark.umdp.spread.maxBytes")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("FileScan") == 1


@pytest.mark.parametrize(
    "name",
    [
        "corpus_unimax_mixing",
        "corpus_temperature_mixing",
        "corpus_vocab_coverage_curve",
    ],
)
def test_mixing_queries_scan_corpus_once(spark, sf_dir, name):
    """The allocators' corpus-sized work is ONE token-count scan; the
    waterfilling/share math must run on the tiny per-source or vocab
    frame, staged via the scratch registry where the DAG branches (an
    InMemoryTableScan in the plan = every extra branch reads the cached
    20-row frame, not the corpus)."""
    plan = _plan(spark, sf_dir, name)
    assert "InMemoryTableScan" in plan


def test_packing_efficiency_no_python(spark, sf_dir):
    plan = _plan(spark, sf_dir, "documents_packing_efficiency")
    assert "BatchEvalPython" not in plan


def test_kmeans_assignment_joins_broadcast_only(spark, sf_dir):
    """Every k-means assignment round broadcasts the k-row centroid
    frame — the corpus must never be shuffled for a join (the only
    exchanges are the per-cell mean aggregations)."""
    plan = _plan(spark, sf_dir, "embedding_kmeans_cells")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_cms_sketch_is_broadcast_min_query(spark, sf_dir):
    """The 256-row sketch broadcasts into the estimate join and the
    result is a top-20 TakeOrderedAndProject, never a global sort."""
    plan = _plan(spark, sf_dir, "corpus_cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject(limit=20" in plan


def test_fold_leakage_adds_no_corpus_scan(spark, sf_dir):
    """Fold labels are pure md5 projections on the pair set: the plan
    must scan documents exactly as often as the bare pair pipeline."""
    leak = _plan(spark, sf_dir, "documents_fold_leakage")
    pairs = _plan(spark, sf_dir, "doc_near_dup_pairs")
    assert leak.count("documents.parquet") == pairs.count("documents.parquet")


def test_conformance_showcase_is_map_only(spark, sf_dir):
    """The P4-P10 three-table fold must stay a pure projection union:
    no join, no exchange — the cleaning block never shuffles."""
    plan = _plan(spark, sf_dir, "conformance_masking_showcase")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_scd_showcase_single_shuffle_broadcast_dim(spark, sf_dir):
    """One o_custkey exchange serves both SCD windows and the rollup;
    the calendar dim (with its UNKNOWN row) broadcasts."""
    plan = _plan(spark, sf_dir, "scd_calendar_showcase")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_showcase_dims_broadcast(spark, sf_dir):
    """Both the customer key-set and the priority dim broadcast — the
    fact path shuffles once for the latest-per-key window and never
    for a join."""
    plan = _plan(spark, sf_dir, "star_latest_dim_showcase")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_containment_pairs_no_cartesian(spark, sf_dir):
    """The rare-shingle self-join is keyed on the shingle (buckets
    bounded by CONTAIN_RARE_DF_MAX) — never a cartesian/nested-loop
    pair enumeration."""
    plan = _plan(spark, sf_dir, "doc_containment_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
