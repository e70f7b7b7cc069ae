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
    least 4 bin-widths above zero by construction). The exact column is
    the AUDIT leg — a full-corpus global sort gated out of the catalog
    row (VERDICT r9 item 8) and exercised only here."""
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        length_quantiles_sketch,
    )

    rows = length_quantiles_sketch(
        spark, sf_dir, with_exact_audit=True
    ).collect()
    assert {r.pct for r in rows} == {50, 90, 99}
    for r in rows:
        assert abs(r.est_value - r.exact_value) <= 0.125 * r.exact_value, r


def test_quantile_sketch_default_plan_has_no_global_sort_audit(
    spark, sf_dir
):
    """Plan guard (VERDICT r9 item 8): the catalog row's DEFAULT plan
    must be Exchange-bounded — no full-corpus row_number window (the
    only unpartitioned window left runs over the aggregated bins frame,
    dozens of rows)."""
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        documents_length_quantiles_sketch,
    )

    plan = documents_length_quantiles_sketch(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan, plan


def test_reshard_touches_only_mover_partitions(spark, sf_dir, tmp_path):
    """The storage-layer payoff: growing the ring 8 -> 9 on a
    shard-partitioned MergeTable moves ~1/9 of rows, and every shard
    partition with no movers keeps its data files BYTE-IDENTICAL."""
    import os

    from urban_mobility_data_pipeline_spark.extensions.sharding import (
        SHARD_COL,
        create_sharded,
        reshard,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    # a small deterministic slice: with ~7 movers over 8 shards, some
    # shards provably receive none — the byte-identical claim needs that
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(64)
        .localCheckpoint()
    )
    tbl = MergeTable(spark, str(tmp_path / "sharded"))
    create_sharded(tbl, docs, "doc_id", N)

    def files_by_shard():
        out = {}
        for f in tbl._data_files():
            part = [p for p in f.split(os.sep) if p.startswith(f"{SHARD_COL}=")]
            out.setdefault(part[0], set()).add(f)
        return out

    before_files = files_by_shard()
    before = _assignments(docs, N)
    stats = reshard(tbl, "doc_id", N + 1)
    after_rows = {r.doc_id: r.shard for r in tbl.read().select("doc_id", SHARD_COL).collect()}

    # every row accounted for, movers all on the new shard
    assert stats["total"] == len(before)
    movers = {d for d, s in after_rows.items() if s != before[d]}
    assert len(movers) == stats["moved"]
    assert all(after_rows[d] == N for d in movers)
    assert 0.4 / (N + 1) < stats["moved"] / stats["total"] < 2.5 / (N + 1)

    # shards that lost no rows kept their exact files
    after_files = files_by_shard()
    untouched = {
        f"{SHARD_COL}={s}"
        for s in range(N)
        if not any(before[d] == s for d in movers)
    }
    assert untouched, "expected at least one untouched shard"
    for part in untouched:
        assert after_files.get(part) == before_files.get(part), part

    # a second reshard to the same n is a no-op
    stats2 = reshard(tbl, "doc_id", N + 1)
    assert stats2["moved"] == 0
