"""Incrementally maintained LSH band index: the delta-maintained path
must agree exactly with the batch near-dup pipeline, across ingest,
update, and erasure cycles."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.dedup import (
    LSH_BANDS,
    near_dup_pairs,
)
from urban_mobility_data_pipeline_spark.extensions.dedup_index import (
    band_rows,
    incremental_near_dups,
    refresh_dedup_index,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor

THRESHOLD = 0.1


@pytest.fixture(scope="module")
def split_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    return docs, old, new


@pytest.fixture()
def store(spark, split_docs):
    _, old, _ = split_docs
    root = tempfile.mkdtemp(prefix="umdp_dedupidx_")
    corpus = MergeTable(spark, root + "/corpus")
    corpus.create(old)
    index = MergeTable(spark, root + "/index")
    cursor = VersionCursor(spark, root + "/cursor")
    return corpus, index, cursor


def test_bootstrap_builds_full_index(store, split_docs):
    corpus, index, cursor = store
    _, old, _ = split_docs
    n = refresh_dedup_index(corpus, index, cursor)
    assert n == old.count()
    assert index.read().count() == old.count() * LSH_BANDS
    # idempotent: nothing changed, nothing folded
    assert refresh_dedup_index(corpus, index, cursor) == 0


def test_incremental_probe_matches_batch_pipeline(spark, store, split_docs):
    corpus, index, cursor = store
    docs, old, new = split_docs
    refresh_dedup_index(corpus, index, cursor)

    got = {
        (min(r["new_id"], r["corpus_id"]), max(r["new_id"], r["corpus_id"]))
        for r in incremental_near_dups(
            new, corpus, index, threshold=THRESHOLD
        ).collect()
    }
    # ground truth: full-corpus batch pairs restricted to old x new
    new_ids = {r[0] for r in new.select("doc_id").collect()}
    old_ids = {r[0] for r in old.select("doc_id").collect()}
    want = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs(docs, threshold=THRESHOLD).collect()
        if (r["doc_a"] in new_ids) != (r["doc_b"] in new_ids)
    }
    assert got == want
    assert want, "fixture must exercise at least one cross pair"


def test_refresh_tracks_update_and_erasure(spark, store, split_docs):
    corpus, index, cursor = store
    _, old, _ = split_docs
    refresh_dedup_index(corpus, index, cursor)

    victim, other = [
        r[0] for r in old.select("doc_id").limit(2).collect()
    ]
    before_keys = {
        (r["band_id"], r["band_key"])
        for r in index.read().filter(F.col("doc_id") == victim).collect()
    }

    # text update: band keys must change in place, same (doc, band) rows
    upd = corpus.read().filter(F.col("doc_id") == victim).withColumn(
        "text", F.lit("a wholly different document body now entirely")
    )
    corpus.merge(upd, keys=["doc_id"], update_set={"text": F.col("s.text")})
    # erasure: all B rows must vanish
    corpus.delete(F.col("doc_id") == other)

    n = refresh_dedup_index(corpus, index, cursor)
    assert n >= 2
    after = index.read()
    after_victim = {
        (r["band_id"], r["band_key"])
        for r in after.filter(F.col("doc_id") == victim).collect()
    }
    assert len(after_victim) == LSH_BANDS
    assert after_victim != before_keys
    assert after.filter(F.col("doc_id") == other).count() == 0
    # the maintained index equals a from-scratch rebuild, row for row
    rebuilt = band_rows(corpus.read())
    assert (
        after.exceptAll(rebuilt).count() == 0
        and rebuilt.exceptAll(after).count() == 0
    )
