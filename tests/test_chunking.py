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


@pytest.fixture
def packing_corpus_dir(spark, tmp_path):
    """Docs sized to exercise every packing-v2 case: an over-length doc
    (3000 tokens > 2048-token ctx, must split), mid-size docs that
    straddle bin boundaries, and an empty doc (must not be dropped)."""
    rows = [
        (i, " ".join(f"w{j}" for j in range(n)), "en", "src0", 0)
        for i, n in [(1, 3000), (2, 1500), (3, 700), (4, 0), (5, 2048), (6, 5)]
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_packed_sequences_invariants(spark, packing_corpus_dir):
    """VERDICT r5 item 6 'done' criteria: every bin's token sum ≤ ctx
    (exactly ctx except each shard's tail bin), no doc dropped,
    over-length docs split across consecutive bins, and per-doc piece
    sums reassemble the full doc."""
    from collections import defaultdict

    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        PACK_CTX_TOKENS,
    )

    rows = QUERIES["documents_packed_sequences"](
        spark, packing_corpus_dir
    ).collect()

    # no doc dropped — the empty doc included
    assert {r.doc_id for r in rows} == {1, 2, 3, 4, 5, 6}

    # per-doc reassembly: pieces are consecutive, offsets contiguous
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    # NB: the whitespace tokenizer counts an empty text as ONE token
    # (split('') == ['']) in BOTH engines — doc 4 carries 1, not 0
    expected_tokens = {1: 3000, 2: 1500, 3: 700, 4: 1, 5: 2048, 6: 5}
    for doc_id, pieces in by_doc.items():
        pieces.sort(key=lambda r: r.piece_id)
        assert [p.piece_id for p in pieces] == list(range(len(pieces)))
        assert sum(p.n_piece_tokens for p in pieces) == expected_tokens[doc_id]
        off = 0
        for p in pieces:
            assert p.doc_offset == off
            off += p.n_piece_tokens
        # pieces land in consecutive bins of one shard
        assert [p.bin for p in pieces] == list(
            range(pieces[0].bin, pieces[0].bin + len(pieces))
        )
    # the 3000-token doc must have split (> ctx)
    assert len(by_doc[1]) >= 2

    # bin discipline: sum per (shard, bin) == ctx except the shard tail
    bins = defaultdict(int)
    for r in rows:
        bins[(r.shard, r.bin)] += r.n_piece_tokens
    tail = {}
    for shard, b in bins:
        tail[shard] = max(tail.get(shard, -1), b)
    for (shard, b), total in bins.items():
        if b == tail[shard]:
            assert 0 < total <= PACK_CTX_TOKENS, (shard, b, total)
        else:
            assert total == PACK_CTX_TOKENS, (shard, b, total)


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
