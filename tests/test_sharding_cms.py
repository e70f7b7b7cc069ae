"""Rendezvous sharding (functions/hashing.py:rendezvous_shard) and the
count-min heavy-hitter sketch (plans/llm_ops.py:corpus_cms_heavy_hitters).

The sharding test pins the property the operator exists for: growing the
shard count by one moves ONLY keys that land on the new shard (expected
1/(n+1) of them), where modulo sharding reshuffles almost everything.
The CMS tests pin the sketch's one-sided error (est >= exact, always)
and that heavy hitters still surface through the 256-counter sketch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.functions.hashing import (
    rendezvous_shard,
)
from urban_mobility_data_pipeline_spark.plans.llm_ops import (
    corpus_cms_heavy_hitters,
    corpus_vocabulary,
)

N = 8


def _assignments(docs, n):
    return {
        r.doc_id: r.shard
        for r in docs.select(
            "doc_id", rendezvous_shard("doc_id", n).alias("shard")
        ).collect()
    }


def test_reshard_moves_only_to_new_shard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before, after = _assignments(docs, N), _assignments(docs, N + 1)
    movers = {d for d in before if before[d] != after[d]}
    assert movers, "a grown ring must win some keys"
    # every mover went TO the new shard; nothing shuffled between old ones
    assert all(after[d] == N for d in movers)
    frac = len(movers) / len(before)
    assert 0.4 / (N + 1) < frac < 2.5 / (N + 1), frac


def test_reshard_beats_modulo(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before, after = _assignments(docs, N), _assignments(docs, N + 1)
    rdv_moved = sum(before[d] != after[d] for d in before) / len(before)
    mod = {
        r.doc_id: (r.m_before, r.m_after)
        for r in docs.select(
            "doc_id",
            F.pmod(F.xxhash64("doc_id"), F.lit(N)).alias("m_before"),
            F.pmod(F.xxhash64("doc_id"), F.lit(N + 1)).alias("m_after"),
        ).collect()
    }
    mod_moved = sum(a != b for a, b in mod.values()) / len(mod)
    assert rdv_moved < mod_moved / 3, (rdv_moved, mod_moved)


def test_assignment_is_map_side(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        docs.select(
            "doc_id", rendezvous_shard("doc_id", N).alias("shard")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_balance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes = list(_assignments(docs, N).values())
    per = [sizes.count(s) for s in range(N)]
    assert min(per) > 0.5 * len(sizes) / N
    assert max(per) < 1.6 * len(sizes) / N


def test_cms_one_sided_error(spark, sf_dir):
    rows = corpus_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.est_count >= r.exact_count, r


def test_cms_recovers_true_heavy_hitters(spark, sf_dir):
    top_exact = {
        r.token
        for r in corpus_vocabulary(spark, sf_dir)
        .orderBy(F.desc("cf"), "token")
        .limit(5)
        .collect()
    }
    sketched = {r.token for r in corpus_cms_heavy_hitters(spark, sf_dir).collect()}
    assert top_exact <= sketched, top_exact - sketched


def test_quantile_sketch_error_bound(spark, sf_dir):
    """The histogram sketch's midpoint estimate sits within 12.5% of the
    exact percentile (8 sub-bins per octave, and the pct-th value is at
    least 4 bin-widths above zero by construction)."""
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        documents_length_quantiles_sketch,
    )

    rows = documents_length_quantiles_sketch(spark, sf_dir).collect()
    assert {r.pct for r in rows} == {50, 90, 99}
    for r in rows:
        assert abs(r.est_value - r.exact_value) <= 0.125 * r.exact_value, r
