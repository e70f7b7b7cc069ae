"""Incrementally maintained vocabulary: after every ingest/mutation
cycle, the delta-folded vocab table must equal a from-scratch rollup of
the current corpus — across updates (redeliveries), inserts, partition
rewrites (change-feed re-emission), and GDPR deletes."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
    ingest_feed,
)
from urban_mobility_data_pipeline_spark.extensions.vocab import (
    current_vocabulary,
    refresh_vocabulary,
    vocab_contributions,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor

B1 = [
    '{"doc_id": 1, "text": "the data engine runs the merge in a batch and the log is there", "lang": "en"}',
    '{"doc_id": 2, "text": "a stream is a log of batches in the engine and the table is the view", "lang": "en"}',
]
B2 = [
    # redelivery of doc 1 with different tokens + a brand-new doc
    '{"doc_id": 1, "text": "the data engine now runs the compaction in a cycle and the log is kept", "lang": "en"}',
    '{"doc_id": 3, "text": "the vocabulary is a rollup of tokens in the corpus and the delta is small", "lang": "en"}',
]


def _expected(corpus):
    return {
        r["token"]: (r["df"], r["cf"])
        for r in vocab_contributions(corpus.read()).collect()
    }


def _got(vocab):
    return {
        r["token"]: (r["df"], r["cf"])
        for r in current_vocabulary(vocab).collect()
    }


def test_incremental_vocab_matches_full_recompute(spark, tmp_path):
    for i, b in enumerate((B1, B2)):
        d = tmp_path / f"b{i}"
        d.mkdir()
        (d / "feed.jsonl").write_text("\n".join(b) + "\n")
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    # token-bucketed: each delta MERGE rewrites only touched buckets
    vocab = MergeTable(
        spark, str(tmp_path / "vocab"), bucket_keys=["token"], num_buckets=8
    )
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))

    # cycle 1: bootstrap
    ingest_feed(spark, str(tmp_path / "b0"), corpus, quarantine)
    n = refresh_vocabulary(corpus, vocab, cursor)
    assert n == 2
    assert _got(vocab) == _expected(corpus)

    # cycle 2: update-in-place + insert — the delta must subtract doc
    # 1's old tokens and add its new ones
    ingest_feed(spark, str(tmp_path / "b1"), corpus, quarantine)
    n = refresh_vocabulary(corpus, vocab, cursor)
    assert 0 < n <= 3  # changed slice, not the whole corpus
    assert _got(vocab) == _expected(corpus)
    # a token only doc 1's OLD text had is gone from the live view
    assert "batch" not in _got(vocab)

    # no-op cycle: nothing changed, nothing recomputed
    assert refresh_vocabulary(corpus, vocab, cursor) == 0
    assert _got(vocab) == _expected(corpus)


def test_incremental_vocab_survives_erasure_and_reemission(spark, tmp_path):
    """GDPR erasure rewrites the corpus (and the change feed re-emits
    surviving rows of rewritten files): the delta for untouched docs
    must cancel to zero and the erased doc's tokens must be
    subtracted."""
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        erase_document_ids,
    )

    d = tmp_path / "b0"
    d.mkdir()
    (d / "feed.jsonl").write_text("\n".join(B1) + "\n")
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    vocab = MergeTable(spark, str(tmp_path / "vocab"))
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))

    ingest_feed(spark, str(d), corpus, quarantine)
    refresh_vocabulary(corpus, vocab, cursor)

    # vacuum=False keeps the before-image files for the delta read
    erase_document_ids(
        spark,
        [2],
        {"documents": corpus},
        id_cols={"documents": ["doc_id"]},
        vacuum=False,
    )
    n = refresh_vocabulary(corpus, vocab, cursor)
    assert n >= 1
    assert _got(vocab) == _expected(corpus)
    # doc-2-only tokens are out of the live vocabulary
    assert "stream" not in _got(vocab)
    # df never goes negative even for shared tokens
    assert all(df >= 0 and cf >= 0 for df, cf in _got(vocab).values())


def test_vocab_refresh_cli(spark, tmp_path):
    """The vocab_refresh job drives delta maintenance through the CLI
    dispatcher after a corpus_ingest cycle."""
    from urban_mobility_data_pipeline_spark.run import main

    (tmp_path / "feed").mkdir()
    (tmp_path / "feed" / "f.jsonl").write_text("\n".join(B1) + "\n")
    lake = str(tmp_path / "lake")
    assert main(
        ["corpus_ingest", "--lake", lake, "--source", str(tmp_path / "feed")],
        spark=spark,
    ) == 0
    assert main(["vocab_refresh", "--lake", lake], spark=spark) == 0
    corpus = MergeTable(spark, str(tmp_path / "lake" / "corpus" / "documents"))
    vocab = MergeTable(spark, str(tmp_path / "lake" / "corpus" / "vocab"))
    assert _got(vocab) == _expected(corpus)
    # second run is a no-op (cursor drained), not a recompute
    assert main(["vocab_refresh", "--lake", lake], spark=spark) == 0
    assert _got(vocab) == _expected(corpus)
