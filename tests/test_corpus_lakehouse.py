"""End-to-end corpus lakehouse via extensions/corpus_ingest (the same
function the corpus_ingest CLI job runs): JSONL crawl ingest (with quarantine) →
quality gates + PII redaction → MERGE-upsert into a transactional
corpus table → incremental second batch with re-deliveries → GDPR
erasure. Ties sources/ingest, functions/text, functions/pii,
operators/merge and extensions/gdpr_corpus into the one pipeline a
training-data team actually runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
    ingest_feed,
)
from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
    erase_document_ids,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

SCHEMA = "doc_id long, text string, lang string"

BATCH_1 = [
    '{"doc_id": 1, "text": "the quick brown fox jumps over a lazy dog in the park", "lang": "en"}',
    '{"doc_id": 2, "text": "reach me at alice@example.com for the meeting notes and the agenda items", "lang": "en"}',
    '{"doc_id": 3, "text": "xx", "lang": "en"}',  # fails min-length gate
    'not even json',  # -> quarantine
]

BATCH_2 = [
    # re-delivery of doc 1 with edited text: must UPDATE, not duplicate
    '{"doc_id": 1, "text": "the quick brown fox jumps over a very lazy dog in the old park", "lang": "en"}',
    '{"doc_id": 4, "text": "call the office at 555-867-5309 and ask for the records desk today please", "lang": "en"}',
]


@pytest.fixture
def lake(spark, tmp_path):
    (tmp_path / "b1").mkdir()
    (tmp_path / "b1" / "feed.jsonl").write_text("\n".join(BATCH_1) + "\n")
    (tmp_path / "b2").mkdir()
    (tmp_path / "b2" / "feed.jsonl").write_text("\n".join(BATCH_2) + "\n")
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    return tmp_path, corpus, quarantine


def _ingest(spark, path, corpus, quarantine):
    return ingest_feed(spark, path, corpus, quarantine)


def test_two_batch_ingest_upserts_and_gates(spark, lake):
    tmp_path, corpus, quarantine = lake
    counts = _ingest(spark, str(tmp_path / "b1"), corpus, quarantine)
    assert counts == {"upserted": 2, "quarantined": 1, "compacted": 0, "near_dup_rejected": 0, "dedup_skipped_bands": 0, "dedup_unchecked": 0, "model_gated": 0}
    rows = {r.doc_id: r for r in corpus.read().collect()}
    assert set(rows) == {1, 2}  # doc 3 gated out, bad line quarantined
    assert "<EMAIL>" in rows[2].text and "alice@example.com" not in rows[2].text
    assert quarantine.read().count() == 1

    _ingest(spark, str(tmp_path / "b2"), corpus, quarantine)
    rows = {r.doc_id: r for r in corpus.read().collect()}
    assert set(rows) == {1, 2, 4}  # re-delivery updated in place
    assert "very lazy" in rows[1].text
    assert corpus.read().filter(F.col("doc_id") == 1).count() == 1
    assert "<PHONE>" in rows[4].text

    # the txn log kept both versions: time travel still sees batch 1
    v1 = {r.doc_id: r for r in corpus.read(version=1).collect()}
    assert "very lazy" not in v1[1].text


def test_erasure_reaches_the_ingested_corpus(spark, lake):
    tmp_path, corpus, quarantine = lake
    _ingest(spark, str(tmp_path / "b1"), corpus, quarantine)
    _ingest(spark, str(tmp_path / "b2"), corpus, quarantine)
    deleted = erase_document_ids(
        spark,
        [2],
        {"documents": corpus},
        id_cols={"documents": ["doc_id"]},
    )
    assert deleted == {"documents": 1}
    assert corpus.read().filter(F.col("doc_id") == 2).count() == 0
    # physical: no surviving parquet file contains the redacted text
    import glob

    for f in glob.glob(str(tmp_path / "corpus" / "**" / "*.parquet"), recursive=True):
        with open(f, "rb") as fh:
            assert b"meeting notes" not in fh.read()


def test_corpus_ingest_cli(spark, tmp_path):
    """The corpus_ingest job drives the same loop through the CLI
    dispatcher (injected session; scripts/run analogue)."""
    from urban_mobility_data_pipeline_spark.run import main

    (tmp_path / "feed").mkdir()
    (tmp_path / "feed" / "f.jsonl").write_text("\n".join(BATCH_1) + "\n")
    rc = main(
        [
            "corpus_ingest",
            "--lake",
            str(tmp_path / "lake"),
            "--source",
            str(tmp_path / "feed"),
        ],
        spark=spark,
    )
    assert rc == 0
    docs = MergeTable(spark, str(tmp_path / "lake" / "corpus" / "documents"))
    assert docs.read().count() == 2
    q = MergeTable(spark, str(tmp_path / "lake" / "corpus" / "quarantine"))
    assert q.read().count() == 1


def test_stream_ingest_is_exactly_once(spark, tmp_path):
    """The streaming ingest twin: each run drains only yet-unseen feed
    files (checkpointed offsets), re-deliveries in a later file update
    in place, and a no-new-files run is a no-op."""
    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        stream_ingest_feed,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    ckpt = str(tmp_path / "ckpt")
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))

    (feed / "b1.jsonl").write_text("\n".join(BATCH_1) + "\n")
    stream_ingest_feed(spark, str(feed), corpus, quarantine, ckpt)
    assert {r.doc_id for r in corpus.read().collect()} == {1, 2}
    assert quarantine.read().count() == 1

    (feed / "b2.jsonl").write_text("\n".join(BATCH_2) + "\n")
    stream_ingest_feed(spark, str(feed), corpus, quarantine, ckpt)
    rows = {r.doc_id: r for r in corpus.read().collect()}
    assert set(rows) == {1, 2, 4}
    assert "very lazy" in rows[1].text  # updated, not duplicated
    assert corpus.read().filter(F.col("doc_id") == 1).count() == 1
    # b1's lines were NOT reprocessed: quarantine still has one row
    assert quarantine.read().count() == 1

    stream_ingest_feed(spark, str(feed), corpus, quarantine, ckpt)
    assert corpus.read().count() == 3


DUP_KEY_BATCH = [
    # same doc_id delivered twice in ONE feed (original + redelivery
    # landing together): the MERGE source must be deduplicated or each
    # copy matches the target row and the corpus silently duplicates
    '{"doc_id": 7, "text": "the quick brown fox jumps over a lazy dog in the park", "lang": "en"}',
    '{"doc_id": 7, "text": "the quick brown fox jumps over a lazy dog in the park tonight again", "lang": "en"}',
    '{"doc_id": 8, "text": "reach the records office for the agenda and the meeting notes today", "lang": "en"}',
]


def test_duplicate_key_feed_lands_one_row_per_doc(spark, tmp_path):
    """ADVICE r5 (medium): a feed carrying the same doc_id twice must
    produce exactly one corpus row, chosen deterministically (longest
    text wins), in both the batch and a fresh-table rerun."""
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "f.jsonl").write_text("\n".join(DUP_KEY_BATCH) + "\n")
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    counts = ingest_feed(spark, str(feed), corpus, quarantine)
    assert counts == {"upserted": 2, "quarantined": 0, "compacted": 0, "near_dup_rejected": 0, "dedup_skipped_bands": 0, "dedup_unchecked": 0, "model_gated": 0}
    rows = {r.doc_id: r for r in corpus.read().collect()}
    assert sorted(rows) == [7, 8]
    assert corpus.read().filter(F.col("doc_id") == 7).count() == 1
    assert "tonight again" in rows[7].text  # longest-text winner

    # re-ingesting the same dup-key feed stays idempotent (MERGE update)
    ingest_feed(spark, str(feed), corpus, quarantine)
    assert corpus.read().count() == 2


def test_stream_duplicate_key_batch_lands_one_row(spark, tmp_path):
    """The streaming twin: one micro-batch spanning a redelivery file
    plus the original must still land a single row per doc_id."""
    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        stream_ingest_feed,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    # two files, same doc_id — availableNow drains both in one run
    (feed / "a.jsonl").write_text(DUP_KEY_BATCH[0] + "\n")
    (feed / "b.jsonl").write_text("\n".join(DUP_KEY_BATCH[1:]) + "\n")
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    stream_ingest_feed(
        spark, str(feed), corpus, quarantine, str(tmp_path / "ckpt")
    )
    assert corpus.read().filter(F.col("doc_id") == 7).count() == 1
    assert corpus.read().count() == 2


def test_empty_feed_is_harmless(spark, tmp_path):
    """An ingest cycle over a feed with no parseable rows must not
    corrupt the corpus: zero upserts, zero quarantine rows, and a
    subsequent real batch proceeds normally."""
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "empty.jsonl").write_text("")
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    counts = ingest_feed(spark, str(feed), corpus, quarantine)
    assert counts == {"upserted": 0, "quarantined": 0, "compacted": 0, "near_dup_rejected": 0, "dedup_skipped_bands": 0, "dedup_unchecked": 0, "model_gated": 0}
    assert not quarantine.exists()

    (feed / "b1.jsonl").write_text("\n".join(BATCH_1) + "\n")
    counts = ingest_feed(spark, str(feed), corpus, quarantine)
    assert counts["upserted"] == 2
    assert corpus.read().count() == 2


def test_model_quality_gate_at_the_ingest_door(spark, sf_dir, tmp_path):
    """The MODEL curation tier (r11): with a trained weights artifact,
    ingest_feed scores every heuristically-curated doc map-side and
    admits exactly the docs the classifier scores >= min_prob — the
    verdict is computed independently here via score_logistic, so the
    pin holds whatever the trained weights say. Docs the model gates
    are counted, not quarantined."""
    import json as _json

    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.classifier import (
        QUALITY_FEATURE_COLS,
        gopher_feature_frame,
        score_logistic,
        train_logistic,
    )
    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        QUALITY_GATE_MIN_PROB,
    )
    from urban_mobility_data_pipeline_spark.plans._helpers import table

    # train the artifact on the testdata corpus (the quality_model_
    # refresh bootstrap shape)
    model_dir = str(tmp_path / "quality_model")
    train_logistic(
        gopher_feature_frame(table(spark, sf_dir, "documents")),
        QUALITY_FEATURE_COLS,
        materialize_dir=model_dir,
    )

    # a feed that clears the CHEAP heuristic gates either way: one
    # long fluent doc, one terse doc (>=5 words, no punctuation, has a
    # stopword) that the Gopher-distilled model is free to reject
    feed_rows = [
        {"doc_id": 1, "text": (
            "the quick brown fox jumps over the lazy dog while the "
            "inquisitive cat watches from a warm stone wall nearby and "
            "the evening settles in over the quiet village streets"
        ), "lang": "en"},
        {"doc_id": 2, "text": "the market closed early again today",
         "lang": "en"},
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "f.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in feed_rows) + "\n"
    )

    # independent expectation: score the curated texts directly
    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        curate,
    )

    curated = curate(
        spark.createDataFrame(
            [(r["doc_id"], r["text"], r["lang"]) for r in feed_rows],
            "doc_id long, text string, lang string",
        )
    )
    scored = score_logistic(
        gopher_feature_frame(curated, keep=("doc_id",)),
        spark.read.parquet(model_dir).select(*[f"w{j}" for j in range(6)]),
        QUALITY_FEATURE_COLS,
    )
    expect_keep = {
        r["doc_id"]
        for r in scored.filter(
            F.col("quality_prob") >= QUALITY_GATE_MIN_PROB
        ).collect()
    }
    n_curated = curated.count()
    assert 0 < len(expect_keep) <= n_curated  # the feed clears curation

    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    counts = ingest_feed(
        spark, str(feed), corpus, quarantine,
        quality_model_dir=model_dir,
    )
    got = {r[0] for r in corpus.read().select("doc_id").collect()}
    assert got == expect_keep
    assert counts["model_gated"] == n_curated - len(expect_keep)
    assert counts["quarantined"] == 0  # gated docs are curation, not errors


def test_stream_mixed_batch_keeps_all_dead_letter_kinds(spark, tmp_path):
    """ADVICE r11: a micro-batch producing BOTH near-dup rejects and
    malformed rows must quarantine both. The old code ran two guarded
    appends; the first stamped the batch_id, so the second saw
    `already=True` and silently dropped its dead letters — violating
    the 'dead letters are kept, never dropped' contract. Dead letters
    now union into ONE append per batch."""
    import json as _json

    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        stream_ingest_feed,
    )
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    base_text = (
        "the quick brown fox jumps over the lazy dog while the "
        "inquisitive cat watches from a warm stone wall nearby"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    index = MergeTable(spark, str(tmp_path / "index"))
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))
    ckpt = str(tmp_path / "ckpt")

    # run 1: seed the corpus + index
    (feed / "a.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": base_text, "lang": "en"}) + "\n"
    )
    stream_ingest_feed(
        spark, str(feed), corpus, quarantine, ckpt,
        dedup_index=index, dedup_cursor=cursor,
    )
    assert corpus.read().count() == 1 and not quarantine.exists()

    # run 2: ONE new file -> one micro-batch carrying a near-dup AND a
    # malformed line
    (feed / "b.jsonl").write_text(
        _json.dumps(
            {"doc_id": 2, "text": base_text + " again", "lang": "en"}
        )
        + "\nnot even json\n"
    )
    stream_ingest_feed(
        spark, str(feed), corpus, quarantine, ckpt,
        dedup_index=index, dedup_cursor=cursor,
    )
    assert {r[0] for r in corpus.read().select("doc_id").collect()} == {1}
    dead = quarantine.read().collect()
    assert len(dead) == 2, dead  # BOTH kinds survived the batch
    payloads = [r["raw_record"] for r in dead]
    assert any("matched_doc_id" in p for p in payloads)  # near-dup reject
    assert any("not even json" in p for p in payloads)  # malformed row

    # replay safety unchanged: a third run with no new files is a no-op
    stream_ingest_feed(
        spark, str(feed), corpus, quarantine, ckpt,
        dedup_index=index, dedup_cursor=cursor,
    )
    assert quarantine.read().count() == 2
