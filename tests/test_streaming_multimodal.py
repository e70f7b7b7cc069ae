"""Streaming pipeline (availableNow) and multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.multimodal import (
    attach_binary_payload,
    decode_media,
    frame_sample,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.streaming.incremental import (
    read_parquet_stream,
    run_available_now,
)
from urban_mobility_data_pipeline_spark.streaming.windows import (
    session_agg,
    tumbling_agg,
)


def _events(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(1704067200000000) + F.col("id") * 60_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        (F.col("id").cast("double") * 1.5).alias("value"),
    )


def test_available_now_drains_and_resumes(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _events(spark, 100).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    target = MergeTable(spark, str(tmp_path / "tgt"))
    seen_batches = []

    def sink(batch_df, batch_id):
        seen_batches.append(batch_id)
        cleaned = batch_df.filter(F.col("value") >= 0)
        if target.exists():
            target.append(cleaned)
        else:
            target.create(cleaned)

    stream = read_parquet_stream(spark, src_dir, schema)
    run_available_now(stream, ckpt, sink)
    assert target.read().count() == 100

    # new files only: checkpoint replaces the etl_control watermark
    _events(spark, 100).withColumn(
        "event_id", F.col("event_id") + 1000
    ).write.mode("append").parquet(src_dir)
    run_available_now(read_parquet_stream(spark, src_dir, schema), ckpt, sink)
    assert target.read().count() == 200  # no reprocessing of old files


def test_tumbling_agg_batch_matches_manual(spark):
    ev = _events(spark, 120)  # 1/min → 2 hours
    out = tumbling_agg(
        ev, "ts", "1 hour", {"n": F.count(F.lit(1)), "v": F.round(F.sum("value"), 2)}
    ).select(F.col("window.start").alias("s"), "n", "v")
    rows = {str(r["s"]): r["n"] for r in out.collect()}
    assert sum(rows.values()) == 120 and len(rows) == 2


def test_streaming_windowed_agg_with_watermark(spark, tmp_path):
    src_dir = str(tmp_path / "wsrc")
    _events(spark, 60).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = read_parquet_stream(spark, src_dir, schema)
    agg = tumbling_agg(
        stream, "ts", "30 minutes", {"n": F.count(F.lit(1))}, watermark="10 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select sum(n) as total from win_counts").first()["total"]
    assert got == 60


def test_session_agg_batch(spark):
    ev = _events(spark, 50)
    out = session_agg(
        ev, "ts", "5 minutes", ["user_id"], {"n": F.count(F.lit(1))}
    )
    assert out.agg(F.sum("n")).first()[0] == 50


def test_multimodal_fake_decode_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = attach_binary_payload(docs, "text", "doc_id", "png")
    feats = decode_media(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    r0 = {r["media_id"]: r for r in rows}
    again = {r["media_id"]: r for r in decode_media(media, fake=True).collect()}
    for k in r0:
        assert r0[k]["phash"] == again[k]["phash"]  # deterministic
        assert 64 <= r0[k]["width"] < 256


def test_multimodal_undecodable_format_dropped(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    media = attach_binary_payload(docs, "text", "doc_id", "tiff")
    assert decode_media(media, fake=True).count() == 0


def test_multimodal_real_codec_is_explicit_stub(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    media = attach_binary_payload(docs, "text", "doc_id", "png")
    with pytest.raises(NotImplementedError):
        decode_media(media)
    with pytest.raises(NotImplementedError):
        frame_sample(media)


def test_frame_sample_fans_out(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    media = attach_binary_payload(docs, "text", "doc_id", "mp4")
    frames = frame_sample(media, every_n=10, max_frames=3, fake=True)
    pdf = frames.toPandas()
    assert pdf.groupby("media_id").size().max() <= 3
    assert (pdf["frame_index"] % 10 == 0).all()
