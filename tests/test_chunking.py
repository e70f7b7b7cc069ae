"""Sliding-window chunking semantics on a synthetic long document —
start offsets, stride overlap, tail truncation (the sf fixtures cover
1-2 chunks per doc; this pins the general case)."""

from __future__ import annotations

import pytest

from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES
from urban_mobility_data_pipeline_spark.plans.llm_ops import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)


@pytest.fixture
def corpus_dir(spark, tmp_path):
    words_150 = " ".join(f"w{i}" for i in range(150))
    rows = [
        (1, words_150, "en", "src0", len(words_150)),
        (2, "short doc", "en", "src0", 9),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_long_doc_chunk_layout(spark, corpus_dir):
    out = {
        (r.doc_id, r.chunk_id): r
        for r in QUERIES["documents_chunked"](spark, corpus_dir).collect()
    }
    # 150 tokens, chunk 64, stride 48 -> starts 1, 49, 97 (ceil(86/48)=2 extra)
    assert sorted(k for k in out if k[0] == 1) == [(1, 0), (1, 1), (1, 2)]
    assert [out[(1, i)].chunk_start for i in range(3)] == [1, 49, 97]
    # consecutive chunks overlap by chunk - stride tokens
    assert CHUNK_TOKENS - CHUNK_STRIDE == 16
    # full chunks carry CHUNK_TOKENS tokens; the tail truncates
    assert out[(1, 0)].n_chunk_tokens == CHUNK_TOKENS
    assert out[(1, 1)].n_chunk_tokens == CHUNK_TOKENS
    assert out[(1, 2)].n_chunk_tokens == 150 - 97 + 1

    # a doc shorter than one chunk yields exactly one truncated chunk
    assert sorted(k for k in out if k[0] == 2) == [(2, 0)]
    assert out[(2, 0)].n_chunk_tokens == 2


def test_overlap_hashes_differ_but_cover(spark, corpus_dir):
    rows = [
        r
        for r in QUERIES["documents_chunked"](spark, corpus_dir).collect()
        if r.doc_id == 1
    ]
    hashes = {r.chunk_hash for r in rows}
    assert len(hashes) == len(rows)  # distinct windows -> distinct digests
    # coverage: last chunk reaches the final token
    last = max(rows, key=lambda r: r.chunk_id)
    assert last.chunk_start + last.n_chunk_tokens - 1 == 150
