"""Edge cases for the gopher-style repetition features (functions/text.py)
that the sf0.001 oracle-parity sweep can't hit: empty docs, single-token
docs, fully-repeated docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.functions import text as T


def _feats(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    staged = df.select("doc_id", T.words("text").alias("w"))
    rep = T.repetition_features(F.col("w"))
    rows = (
        staged.select(
            "doc_id",
            F.size("w").alias("n"),
            rep["uniq_word_ratio"].alias("uniq"),
            rep["dup_bigram_frac"].alias("dupbg"),
            F.size(T.word_bigrams(F.col("w"))).alias("n_bg"),
        )
        .orderBy("doc_id")
        .collect()
    )
    return rows


def test_single_token_doc_has_no_bigrams(spark):
    (r,) = _feats(spark, ["hello"])
    assert r.n == 1 and r.n_bg == 0
    assert r.uniq == 1.0
    assert r.dupbg == 0.0  # no bigrams -> 0, not 1


def test_empty_text_degenerates_like_tokenizer(spark):
    # split('') yields [''] — one empty token, same as the DuckDB oracle.
    (r,) = _feats(spark, [""])
    assert r.n == 1 and r.n_bg == 0
    assert r.uniq == 1.0 and r.dupbg == 0.0


def test_fully_repeated_doc(spark):
    (r,) = _feats(spark, ["spam spam spam spam"])
    assert r.n == 4 and r.n_bg == 3
    assert r.uniq == 0.25
    assert r.dupbg == round(1 - 1 / 3, 6)


def test_all_distinct_doc(spark):
    (r,) = _feats(spark, ["a b c d"])
    assert r.uniq == 1.0 and r.dupbg == 0.0


def test_bigram_order_and_content(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    (row,) = df.select(
        T.word_bigrams(T.words("text")).alias("bg")
    ).collect()
    assert row.bg == ["x y", "y z"]
