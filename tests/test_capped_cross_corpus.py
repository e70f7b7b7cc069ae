"""Capped cross-corpus candidate generation: the union-side cap must
refine BOTH sides of an oversized bucket identically (one-sided
refinement would split true cross pairs apart), degenerate to the
uncapped pipeline when nothing saturates, and bound the join when a
boilerplate bucket saturates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.dedup import (
    bucket_overflow_stats,
    cross_corpus_band_keys,
    cross_corpus_near_dups,
)

THRESHOLD = 0.1


@pytest.fixture(scope="module")
def corpora(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    b = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    return a, b


def _pairs(df):
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()}


def test_huge_cap_equals_uncapped(spark, corpora):
    a, b = corpora
    plain = _pairs(cross_corpus_near_dups(a, b, threshold=THRESHOLD))
    capped = _pairs(
        cross_corpus_near_dups(a, b, threshold=THRESHOLD, bucket_cap=10**9)
    )
    assert plain, "fixture must produce cross pairs"
    assert capped == plain


def test_oversized_bucket_refines_both_sides(spark):
    # two corpora of boilerplate copies: every band bucket holds all
    # docs from BOTH sides. With cap < union size, refinement re-keys
    # the whole bucket; because both sides refine identically, the
    # exact copies (agreeing on every band) survive as candidates
    # until truncation, and truncation is measured.
    boiler = "terms of service apply to all pages of this web site"
    a = spark.createDataFrame(
        [(i, boiler) for i in range(4)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(100 + i, boiler) for i in range(4)], "doc_id long, text string"
    )
    got = _pairs(
        cross_corpus_near_dups(a, b, threshold=THRESHOLD, bucket_cap=8)
    )
    # union bucket size is 8 <= cap, so nothing refines: all 16 pairs
    assert len(got) == 16
    # cap 4 < union 8: the bucket refines (identically on both sides
    # since copies share every band), then truncates to the 4 lowest
    # ids = all of corpus A -> zero cross pairs survive, and the
    # overflow report says exactly how many members were dropped
    got4 = _pairs(
        cross_corpus_near_dups(a, b, threshold=THRESHOLD, bucket_cap=4)
    )
    assert got4 == set()
    ovf = bucket_overflow_stats(
        cross_corpus_band_keys(a, b, with_refine=True),
        "doc_id",
        4,
        combine=lambda k, r: F.md5(F.concat(k, r)),
    )
    rows = {r["band_id"]: r for r in ovf.collect()}
    # every band's single bucket is oversized, 4 members dropped each
    assert all(r["oversized_buckets"] == 1 for r in rows.values())
    assert all(r["truncated_members"] == 4 for r in rows.values())
