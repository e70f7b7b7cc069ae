"""Materialized BM25 index: must match the from-scratch query exactly,
skip bloom-negative files on probe, and stay current under incremental
refresh (delete+append postings, delta-maintained stats)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.lexical_index import (
    bm25_postings,
    bm25_stats,
    bm25_topk_indexed,
    build_bm25_index,
    refresh_bm25_index,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor
from urban_mobility_data_pipeline_spark.plans.llm_ops import (
    BM25_B,
    BM25_K1,
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    QUERIES,
)

TERMS = list(BM25_QUERY_TERMS)


def _topk_rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture()
def index(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings = MergeTable(
        spark, str(tmp_path / "postings"), bucket_keys=["token"],
        num_buckets=8,
    )
    stats = MergeTable(spark, str(tmp_path / "stats"))
    build_bm25_index(docs, postings, stats)
    return docs, postings, stats


def test_indexed_matches_from_scratch_query(spark, sf_dir, index):
    """The index is a layout change, not a semantics change: identical
    top-k (ids, rounded scores, match counts) to doc_bm25_topk."""
    _docs, postings, stats = index
    got = _topk_rows(
        bm25_topk_indexed(
            postings, stats, TERMS, k=BM25_TOP_K, k1=BM25_K1, b=BM25_B
        )
    )
    want = _topk_rows(QUERIES["doc_bm25_topk"](spark, sf_dir))
    assert got == want
    assert len(want) == BM25_TOP_K


def test_probe_skips_bloom_negative_files(index):
    """The probe's scan set is the bloom-candidate files only — the
    lexical analogue of reading nprobe IVF cells. With a token-bucketed
    layout the query terms' buckets are a strict subset of the table."""
    _docs, postings, _stats = index
    cands, skipped = postings.prune_files_by_keys(["token"], TERMS)
    assert cands, "query terms must hit at least one file"
    assert skipped, (
        "probe read every postings file — token blooms/bucketing are "
        "not pruning"
    )


def test_refresh_tracks_update_append_and_erasure(spark, index, tmp_path):
    """Incremental refresh == full rebuild, through an append, a text
    update, and an erasure — postings row-identical, stats (n_docs,
    total_dl) exactly re-derivable, and the probe unchanged."""
    docs, postings, stats = index
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    corpus.create(docs)
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))
    # adopt the prebuilt index as the bootstrap
    refresh_bm25_index(corpus, postings, stats, cursor)
    assert refresh_bm25_index(corpus, postings, stats, cursor) == 0

    victim, goner = [
        r[0] for r in docs.select("doc_id").limit(2).collect()
    ]
    new_id = docs.agg(F.max("doc_id")).first()[0] + 1
    corpus.append(
        docs.limit(1).select(
            F.lit(new_id).cast("long").alias("doc_id"),
            F.lit("merge window dup merge window of fresh text").alias(
                "text"
            ),
            *[
                F.col(c)
                for c in docs.columns
                if c not in ("doc_id", "text")
            ],
        )
    )
    upd = corpus.read().filter(F.col("doc_id") == victim).withColumn(
        "text", F.lit("window window window dup appears here too")
    )
    corpus.merge(upd, keys=["doc_id"], update_set={"text": F.col("s.text")})
    corpus.delete(F.col("doc_id") == goner)

    n = refresh_bm25_index(corpus, postings, stats, cursor)
    assert n >= 3

    live = postings.read()
    rebuilt = bm25_postings(corpus.read())
    assert (
        live.exceptAll(rebuilt).count() == 0
        and rebuilt.exceptAll(live).count() == 0
    )
    got_stats = stats.read().collect()[0]
    want_stats = bm25_stats(corpus.read()).collect()[0]
    assert got_stats["n_docs"] == want_stats["n_docs"]
    assert abs(got_stats["total_dl"] - want_stats["total_dl"]) < 1e-6

    fresh_postings = MergeTable(
        spark, str(tmp_path / "p2"), bucket_keys=["token"], num_buckets=8
    )
    fresh_stats = MergeTable(spark, str(tmp_path / "s2"))
    build_bm25_index(corpus.read(), fresh_postings, fresh_stats)
    got = _topk_rows(bm25_topk_indexed(postings, stats, TERMS))
    want = _topk_rows(bm25_topk_indexed(fresh_postings, fresh_stats, TERMS))
    assert got == want


def test_refresh_never_rewrites_untouched_postings_files(
    spark, index, tmp_path
):
    """An all-new-ids ingest batch must leave every existing postings
    file in place: the MoR delete writes no DV (nothing matches) and
    the new docs' postings arrive as append-only files. This is the
    invariant that keeps refresh cost O(batch) — the CoW point-delete
    used before round 8 rewrote every token bucket per refresh because
    bloom false positives compound across a multi-thousand key set."""
    docs, postings, stats = index
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    corpus.create(docs)
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))
    refresh_bm25_index(corpus, postings, stats, cursor)
    files_before = set(postings._load()[0]["files"])

    base = docs.agg(F.max("doc_id")).first()[0] + 1
    fresh = spark.range(base, base + 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("fresh batch text number "), F.col("id")).alias(
            "text"
        ),
        *[
            F.lit(None).cast(dict(docs.dtypes)[c]).alias(c)
            for c in docs.columns
            if c not in ("doc_id", "text")
        ],
    )
    corpus.append(fresh)
    n = refresh_bm25_index(corpus, postings, stats, cursor)
    assert n == 500

    manifest = postings._load()[0]
    files_after = set(manifest["files"])
    assert files_before <= files_after, sorted(files_before - files_after)[:5]
    assert not manifest.get("dvs"), manifest["dvs"]
    # and the maintained stats still equal a recount
    got = stats.read().first()
    want = bm25_stats(corpus.read()).first()
    assert got["n_docs"] == want["n_docs"]
    assert abs(got["total_dl"] - want["total_dl"]) < 1e-6
