"""Incrementally maintained DSIR bucket model: after every ingest or
mutation cycle the delta-folded model must produce EXACTLY the same
(bucket, lr) frame as batch-training on the current corpus — across
updates, inserts, change-feed re-emission, and GDPR erasure. That
equality is what lets a deployed gate swap batch-trained and
maintained models without a hash change."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
    ingest_feed,
)
from urban_mobility_data_pipeline_spark.extensions.dsir import (
    doc_bucket_counts,
    dsir_bucket_log_ratios,
)
from urban_mobility_data_pipeline_spark.extensions.dsir_model import (
    current_log_ratios,
    dsir_contributions,
    refresh_dsir_model,
)
from urban_mobility_data_pipeline_spark.functions import text as T
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor

B1 = [
    '{"doc_id": 1, "text": "the data engine runs the merge in a batch", "lang": "en"}',
    '{"doc_id": 2, "text": "la tabla y el registro is in the motor de datos", "lang": "es"}',
    '{"doc_id": 3, "text": "a stream is a log of batches in the engine", "lang": "en"}',
]
B2 = [
    # redelivery of doc 1 with different tokens + a brand-new es doc
    '{"doc_id": 1, "text": "the data engine now runs the compaction cycle", "lang": "en"}',
    '{"doc_id": 4, "text": "el flujo es un registro of the lotes in la tabla", "lang": "es"}',
]

def TARGET():
    return F.col("lang") == "en"


def _batch_ratios(corpus):
    docs = corpus.read().withColumn(
        "source", F.col("lang")
    )  # dsir batch API keys the target slice by source
    fb = doc_bucket_counts(docs, T.words("text"))
    return {
        r["bucket"]: r["lr"]
        for r in dsir_bucket_log_ratios(fb, ("en",)).collect()
    }


def _maintained_ratios(model):
    return {
        r["bucket"]: r["lr"] for r in current_log_ratios(model).collect()
    }


def _setup(spark, tmp_path, batches):
    for i, b in enumerate(batches):
        d = tmp_path / f"b{i}"
        d.mkdir()
        (d / "feed.jsonl").write_text("\n".join(b) + "\n")
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    quarantine = MergeTable(spark, str(tmp_path / "quarantine"))
    model = MergeTable(spark, str(tmp_path / "model"))
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))
    return corpus, quarantine, model, cursor


def test_maintained_model_matches_batch_training(spark, tmp_path):
    corpus, quarantine, model, cursor = _setup(spark, tmp_path, (B1, B2))

    # cycle 1: bootstrap
    ingest_feed(spark, str(tmp_path / "b0"), corpus, quarantine)
    n = refresh_dsir_model(corpus, model, cursor, TARGET())
    assert n == 3
    assert _maintained_ratios(model) == _batch_ratios(corpus)

    # cycle 2: update-in-place + insert — delta subtracts doc 1's old
    # features and adds the new ones
    ingest_feed(spark, str(tmp_path / "b1"), corpus, quarantine)
    n = refresh_dsir_model(corpus, model, cursor, TARGET())
    # adds + removes of rewritten files: includes re-emitted doc 3,
    # whose before/after contributions cancel to a zero delta
    assert 0 < n <= 4
    assert _maintained_ratios(model) == _batch_ratios(corpus)

    # no-op cycle
    assert refresh_dsir_model(corpus, model, cursor, TARGET()) == 0
    assert _maintained_ratios(model) == _batch_ratios(corpus)


def test_maintained_model_survives_erasure(spark, tmp_path):
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        erase_document_ids,
    )

    corpus, quarantine, model, cursor = _setup(spark, tmp_path, (B1,))
    ingest_feed(spark, str(tmp_path / "b0"), corpus, quarantine)
    refresh_dsir_model(corpus, model, cursor, TARGET())

    erase_document_ids(
        spark,
        [3],
        {"documents": corpus},
        id_cols={"documents": ["doc_id"]},
        vacuum=False,
    )
    n = refresh_dsir_model(corpus, model, cursor, TARGET())
    assert n >= 1
    assert _maintained_ratios(model) == _batch_ratios(corpus)
    # counts never negative after the subtraction
    live = model.read().filter(F.col("r") > 0)
    assert live.where((F.col("r") < 0) | (F.col("t") < 0)).count() == 0
    # contributions invariant: live model == full rollup of current docs
    full = {
        (r["bucket"], r["r"], r["t"])
        for r in dsir_contributions(
            corpus.read(), TARGET()
        ).collect()
    }
    got = {
        (r["bucket"], r["r"], r["t"]) for r in live.collect()
    }
    assert got == full


def test_dsir_model_refresh_cli(spark, tmp_path):
    """The dsir_model_refresh job drives delta maintenance through the
    CLI dispatcher after a corpus_ingest cycle."""
    from urban_mobility_data_pipeline_spark.run import main

    (tmp_path / "feed").mkdir()
    (tmp_path / "feed" / "f.jsonl").write_text("\n".join(B1) + "\n")
    lake = str(tmp_path / "lake")
    assert main(
        ["corpus_ingest", "--lake", lake, "--source", str(tmp_path / "feed")],
        spark=spark,
    ) == 0
    assert main(["dsir_model_refresh", "--lake", lake], spark=spark) == 0
    corpus = MergeTable(spark, str(tmp_path / "lake" / "corpus" / "documents"))
    model = MergeTable(spark, str(tmp_path / "lake" / "corpus" / "dsir_model"))
    full = {
        (r["bucket"], r["r"], r["t"])
        for r in dsir_contributions(corpus.read(), TARGET()).collect()
    }
    got = {
        (r["bucket"], r["r"], r["t"])
        for r in model.read().filter(F.col("r") > 0).collect()
    }
    assert got == full
    # second run is a no-op (cursor drained), not a recompute
    assert main(["dsir_model_refresh", "--lake", lake], spark=spark) == 0


def test_dataset_card_cli(spark, tmp_path):
    """dataset_card publishes a reproducible JSON card keyed to the
    corpus version: same corpus -> byte-identical card; card numbers
    match direct aggregation."""
    import json

    from urban_mobility_data_pipeline_spark.run import main

    (tmp_path / "feed").mkdir()
    (tmp_path / "feed" / "f.jsonl").write_text("\n".join(B1) + "\n")
    lake = str(tmp_path / "lake")
    assert main(
        ["corpus_ingest", "--lake", lake, "--source", str(tmp_path / "feed")],
        spark=spark,
    ) == 0
    assert main(["dataset_card", "--lake", lake], spark=spark) == 0
    path = tmp_path / "lake" / "corpus" / "dataset_card.json"
    card = json.loads(path.read_text())
    corpus = MergeTable(spark, str(tmp_path / "lake" / "corpus" / "documents"))
    assert card["n_docs"] == corpus.read().count()
    assert set(card["languages"]) == {
        r["lang"] for r in corpus.read().select("lang").distinct().collect()
    }
    assert card["exact_dup_rate"] == 0.0
    first = path.read_bytes()
    assert main(["dataset_card", "--lake", lake], spark=spark) == 0
    assert path.read_bytes() == first  # reproducible on unchanged corpus
