"""Quarantining JSONL/CSV ingestion: malformed records land in the
dead-letter frame, valid ones parse to the declared schema, nothing is
silently dropped."""

from __future__ import annotations

import pytest

from urban_mobility_data_pipeline_spark.sources.ingest import (
    CORRUPT_COL,
    read_csv_quarantined,
    read_jsonl_quarantined,
)

JSONL_LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
    '{"doc_id": "not-a-number", "text": "bad type", "lang": "en"}',
    '{"doc_id": 4, "text": "truncated...',  # unparseable JSON
    '{"doc_id": 5, "text": "ok", "lang": "de"}',
]


@pytest.fixture
def jsonl_path(tmp_path):
    p = tmp_path / "crawl.jsonl"
    p.write_text("\n".join(JSONL_LINES) + "\n")
    return str(p)


def test_jsonl_split_counts(spark, jsonl_path):
    good, bad = read_jsonl_quarantined(
        spark, jsonl_path, "doc_id long, text string, lang string"
    )
    assert good.count() == 3
    assert bad.count() == 2
    assert good.columns == ["doc_id", "text", "lang"]
    assert bad.columns == ["raw_record"]
    # nothing dropped: every input line is in exactly one output
    assert good.count() + bad.count() == len(JSONL_LINES)


def test_jsonl_good_rows_typed(spark, jsonl_path):
    good, _ = read_jsonl_quarantined(
        spark, jsonl_path, "doc_id long, text string, lang string"
    )
    rows = {r.doc_id: r.text for r in good.collect()}
    assert rows == {1: "hello world", 2: "bonjour", 5: "ok"}


def test_jsonl_quarantine_keeps_raw_lines(spark, jsonl_path):
    _, bad = read_jsonl_quarantined(
        spark, jsonl_path, "doc_id long, text string, lang string"
    )
    raw = sorted(r.raw_record for r in bad.collect())
    assert any("not-a-number" in r for r in raw)
    assert any("truncated" in r for r in raw)


def test_schema_must_not_predeclare_corrupt_col(spark, jsonl_path):
    with pytest.raises(ValueError):
        read_jsonl_quarantined(
            spark, jsonl_path, f"doc_id long, {CORRUPT_COL} string"
        )


def test_csv_split(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(
        "doc_id,n\n"
        "1,10\n"
        "2,twenty\n"  # type failure -> quarantine
        "3,30\n"
    )
    good, bad = read_csv_quarantined(spark, str(p), "doc_id long, n long")
    assert {r.doc_id for r in good.collect()} == {1, 3}
    raw = [r.raw_record for r in bad.collect()]
    assert raw == ["2,twenty"]


def test_all_good_input_has_empty_quarantine(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    good, bad = read_jsonl_quarantined(spark, str(p), "a long")
    assert good.count() == 2
    assert bad.count() == 0
