"""DSIR importance-resampling behavior (extensions/dsir.py).

The oracle row (corpus_dsir_sample) pins cross-engine equivalence;
these tests pin the SEMANTICS the method is for: importance weights
must steer selection toward the target domain, and the resample must
be a deterministic, partition-layout-independent function of the
corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.dsir import (
    doc_bucket_counts,
    dsir_log_weights,
    dsir_resample,
)
from urban_mobility_data_pipeline_spark.functions import text as T


@pytest.fixture(scope="module")
def corpus(spark):
    """Two distinguishable vocabularies: 'wiki' docs draw from one word
    pool, 'crawl' docs from a disjoint pool, plus crawl docs that LOOK
    like wiki (the ones DSIR exists to find)."""
    wiki_words = ["atom", "orbit", "cell", "enzyme", "theorem"]
    crawl_words = ["buy", "click", "sale", "free", "offer"]
    rows = []
    for i in range(30):
        rows.append((i, " ".join(wiki_words[j % 5] for j in range(i, i + 8)), "wiki"))
    for i in range(30, 90):
        rows.append((i, " ".join(crawl_words[j % 5] for j in range(i, i + 8)), "crawl"))
    for i in range(90, 100):  # wiki-looking crawl docs
        rows.append((i, " ".join(wiki_words[j % 5] for j in range(i, i + 8)), "crawl"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def weights(corpus):
    fb = doc_bucket_counts(corpus, T.words("text"))
    return dsir_log_weights(fb, ("wiki",)).cache()


def test_weights_separate_domains(weights):
    """Mean log weight of wiki-vocabulary docs (any source) must exceed
    mean log weight of crawl-vocabulary docs — the importance ratio
    orders documents by target-likeness, not by source label."""
    rows = {r["doc_id"]: r["log_weight"] for r in weights.collect()}
    wiki_like = [rows[i] for i in range(30)] + [rows[i] for i in range(90, 100)]
    crawl_like = [rows[i] for i in range(30, 90)]
    assert min(wiki_like) > max(crawl_like)


def test_resample_prefers_target_lookalikes(weights):
    """Gumbel top-k over the weights must pull in the wiki-looking
    crawl docs (ids 90..99) ahead of pure-crawl docs."""
    kept = {r["doc_id"] for r in dsir_resample(weights, 40).collect()}
    assert set(range(90, 100)) <= kept
    assert len(kept & set(range(30, 90))) == 0


def test_resample_partition_layout_independent(corpus, weights):
    """The kept set is a pure function of the data: reshuffling the
    corpus into a different partition layout must reproduce it."""
    fb2 = doc_bucket_counts(corpus.repartition(7, "source"), T.words("text"))
    w2 = dsir_log_weights(fb2, ("wiki",))
    a = [(r["doc_id"], r["priority"]) for r in dsir_resample(weights, 25).collect()]
    b = [(r["doc_id"], r["priority"]) for r in dsir_resample(w2, 25).collect()]
    assert a == b


def test_weights_cover_every_doc(weights, corpus):
    assert weights.count() == corpus.count()
    assert weights.where(F.col("n_feats") <= 0).count() == 0
