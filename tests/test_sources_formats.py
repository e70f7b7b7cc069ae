"""Source-format breadth: ORC read/write with pushdown, raw-text
corpus ingestion, and binaryFile media-directory ingestion feeding the
multimodal decode path."""

from __future__ import annotations

import os
import struct
import tempfile
import wave

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.sources.files import (
    load_path,
    read_media_dir,
    read_text_corpus,
    write_append_partitioned,
)


def test_orc_roundtrip_with_pushdown(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = tempfile.mkdtemp(prefix="umdp_orc_") + "/orders"
    write_append_partitioned(
        orders, path, ["o_orderstatus"], fmt="orc"
    )
    back = load_path(spark, path, fmt="orc")
    assert back.count() == orders.count()
    # same totals through the other format
    a = orders.agg(F.sum("o_totalprice")).first()[0]
    b = back.agg(F.sum("o_totalprice")).first()[0]
    assert abs(a - b) < 1e-6
    # predicate pushdown reaches the ORC scan; partition column prunes
    q = back.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0)
    ).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "OrcScan" in plan or "Format: ORC" in plan or "orc" in plan.lower()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split(
        "PushedFilters:"
    )[1][:200]


def test_text_corpus_wholetext_and_line_modes(spark):
    root = tempfile.mkdtemp(prefix="umdp_txt_")
    with open(os.path.join(root, "a.txt"), "w") as f:
        f.write("the quick brown fox\njumps over the lazy dog\n")
    with open(os.path.join(root, "b.txt"), "w") as f:
        f.write("spark reads raw text corpora\n")

    whole = read_text_corpus(spark, root, wholetext=True)
    rows = {r["source"].rsplit("/", 1)[-1]: r for r in whole.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert "quick brown fox" in rows["a.txt"]["text"]
    assert rows["a.txt"]["doc_id"] != rows["b.txt"]["doc_id"]
    # deterministic across re-reads
    again = {
        r["source"].rsplit("/", 1)[-1]: r["doc_id"]
        for r in read_text_corpus(spark, root, wholetext=True).collect()
    }
    assert again == {k: v["doc_id"] for k, v in rows.items()}

    lines = read_text_corpus(spark, root, wholetext=False)
    assert lines.count() == 3
    assert lines.select("doc_id").distinct().count() == 3


def test_text_corpus_feeds_quality_pipeline(spark):
    from urban_mobility_data_pipeline_spark.functions import text as T

    root = tempfile.mkdtemp(prefix="umdp_txt2_")
    with open(os.path.join(root, "doc.txt"), "w") as f:
        f.write("the cat and the dog sat in a sunny garden of delights")
    docs = read_text_corpus(spark, root)
    out = docs.select(
        "doc_id", T.whitespace_token_count("text").alias("n_words")
    ).first()
    assert out["n_words"] == 12


def _ppm_bytes(w: int, h: int, rgb=(10, 20, 30)) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + bytes(rgb) * (w * h)


def _wav_bytes() -> bytes:
    import io

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(struct.pack("<4h", 0, 1000, -1000, 0))
    return buf.getvalue()


def test_media_dir_feeds_multimodal_decode(spark):
    from urban_mobility_data_pipeline_spark.extensions.multimodal import (
        decode_media,
    )

    root = tempfile.mkdtemp(prefix="umdp_media_")
    with open(os.path.join(root, "img.ppm"), "wb") as f:
        f.write(_ppm_bytes(4, 3))
    with open(os.path.join(root, "clip.wav"), "wb") as f:
        f.write(_wav_bytes())

    media = read_media_dir(spark, root)
    metas = {
        r["meta"]["format"]: r["meta"]["n_bytes"] for r in media.collect()
    }
    assert set(metas) == {"ppm", "wav"}
    assert metas["ppm"] == len(_ppm_bytes(4, 3))

    feats = {
        r["format"]: r for r in decode_media(media).collect()
    }
    assert feats["ppm"]["width"] == 4 and feats["ppm"]["height"] == 3
    assert feats["wav"]["sample_rate"] == 8000


def test_media_dir_glob_and_unknown_ext(spark):
    root = tempfile.mkdtemp(prefix="umdp_media2_")
    with open(os.path.join(root, "img.ppm"), "wb") as f:
        f.write(_ppm_bytes(2, 2))
    with open(os.path.join(root, "notes.xyz"), "wb") as f:
        f.write(b"not media")
    only_ppm = read_media_dir(spark, root, glob="*.ppm")
    assert only_ppm.count() == 1
    allf = read_media_dir(spark, root)
    fmts = {r["meta"]["format"] for r in allf.collect()}
    assert fmts == {"ppm", "unknown"}


def test_text_feed_through_corpus_ingest(spark, tmp_path):
    """A raw-text crawl dump flows through the full ingest_feed loop
    (gates, PII redaction, MERGE) and re-ingest is idempotent."""
    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        ingest_feed,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "good.txt").write_text(
        "the model trains on a large and carefully cleaned corpus of text"
    )
    (feed / "short.txt").write_text("too short")  # fails MIN_WORDS gate

    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    r1 = ingest_feed(spark, str(feed), corpus, quarantine, fmt="text")
    assert r1["upserted"] == 1 and r1["quarantined"] == 0
    assert corpus.read().count() == 1

    r2 = ingest_feed(spark, str(feed), corpus, quarantine, fmt="text")
    assert r2["upserted"] == 1  # same doc re-curated...
    assert corpus.read().count() == 1  # ...merged, not duplicated
