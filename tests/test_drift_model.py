"""Incrementally maintained drift histogram: after every mutation cycle
the delta-folded (group, octave) table must equal a from-scratch rollup
of the current corpus, and the PSI report off the histogram must equal
the batch report off the documents — across inserts, updates
(redeliveries), and GDPR deletes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.drift_model import (
    current_histogram,
    hist_contributions,
    psi_from_counts,
    refresh_drift_hist,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor


def _expected(corpus):
    return {
        (r.grp, r.e): r.c
        for r in hist_contributions(corpus.read()).collect()
    }


def _got(hist):
    return {(r.grp, r.e): r.c for r in current_histogram(hist).collect()}


@pytest.fixture()
def setup(spark, sf_dir, tmp_path):
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    corpus.create(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    hist = MergeTable(spark, str(tmp_path / "hist"))
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))
    return corpus, hist, cursor


def test_bootstrap_and_noop(spark, setup):
    corpus, hist, cursor = setup
    n = refresh_drift_hist(corpus, hist, cursor)
    assert n == corpus.read().count()
    assert _got(hist) == _expected(corpus)
    assert refresh_drift_hist(corpus, hist, cursor) == 0  # already current


def test_maintained_tracks_all_mutations(spark, setup):
    corpus, hist, cursor = setup
    refresh_drift_hist(corpus, hist, cursor)

    # insert a new source with a very different length profile
    new = spark.createDataFrame(
        [(100_000 + i, "z" * 30, "en", "src_new", 3000 + i) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    corpus.merge(new, keys=["doc_id"], insert=True)
    n = refresh_drift_hist(corpus, hist, cursor)
    assert 0 < n
    assert _got(hist) == _expected(corpus)

    # update: shift an existing slice's lengths across octaves
    upd = corpus.read().where(F.col("source") == "src0").select(
        "doc_id", "text", "lang", "source",
        (F.col("n_chars") * 4).alias("n_chars"),
    )
    corpus.merge(
        upd.localCheckpoint(),
        keys=["doc_id"],
        update_set={"n_chars": F.col("s.n_chars")},
        insert=False,
    )
    refresh_drift_hist(corpus, hist, cursor)
    assert _got(hist) == _expected(corpus)

    # GDPR-style delete of a whole source
    corpus.delete(F.col("source") == "src1")
    refresh_drift_hist(corpus, hist, cursor)
    assert _got(hist) == _expected(corpus)

    # PSI off the maintained histogram == PSI off the documents
    got = {
        r.source: (r.n_docs, r.psi, r.drift_tier)
        for r in psi_from_counts(current_histogram(hist)).collect()
    }
    want = {
        r.source: (r.n_docs, r.psi, r.drift_tier)
        for r in psi_from_counts(hist_contributions(corpus.read())).collect()
    }
    assert got == want
    # the planted long-doc source must show up hot
    assert got["src_new"][2] == "shifted"


def test_batch_query_uses_shared_tail(spark, sf_dir):
    """The catalog query and the maintained path are the same definition:
    psi_from_counts over hist_contributions of the raw documents must
    reproduce the registered query exactly."""
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        corpus_source_drift_psi,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(
        (r.source, r.n_docs, r.psi, r.drift_tier)
        for r in psi_from_counts(
            hist_contributions(docs, "source", "n_chars")
        ).collect()
    )
    b = sorted(
        (r.source, r.n_docs, r.psi, r.drift_tier)
        for r in corpus_source_drift_psi(spark, sf_dir).collect()
    )
    assert a == b


def test_drift_refresh_cli_cycle(spark, tmp_path):
    """The drift_refresh job end-to-end through run.main: ingest ->
    bootstrap -> noop (0 changed) -> second ingest folds only the new
    docs."""
    import json as _json

    from urban_mobility_data_pipeline_spark.run import main

    (tmp_path / "f1").mkdir()
    (tmp_path / "f1" / "a.jsonl").write_text(
        "\n".join(
            _json.dumps({
                "doc_id": i,
                "text": f"document number {i} talks about cities transit {'words ' * i}and rivers bridges stations platform schedules",
                "lang": "en",
            })
            for i in range(6)
        )
        + "\n"
    )
    lake = str(tmp_path / "lake")
    assert main(["corpus_ingest", "--lake", lake, "--source", str(tmp_path / "f1")], spark=spark) == 0
    assert main(["drift_refresh", "--lake", lake], spark=spark) == 0
    hist = MergeTable(spark, f"{lake}/corpus/drift_hist")
    assert hist.exists() and hist.read().count() > 0
    v0 = hist.detail()["version"]
    # noop tick: histogram table untouched
    assert main(["drift_refresh", "--lake", lake], spark=spark) == 0
    assert hist.detail()["version"] == v0
    # a new language arrives -> one more fold, new cells appear
    (tmp_path / "f2").mkdir()
    (tmp_path / "f2" / "b.jsonl").write_text(
        _json.dumps({"doc_id": 50, "text": "this is a much longer report about the transit network of a large city and it keeps going with details on bridges rivers stations platforms schedules fares zones maps depots lines signals crossings tunnels and the many riders who use them every single day of the year", "lang": "de"}) + "\n"
    )
    assert main(["corpus_ingest", "--lake", lake, "--source", str(tmp_path / "f2")], spark=spark) == 0
    assert main(["drift_refresh", "--lake", lake], spark=spark) == 0
    langs = {r.grp for r in hist.read().where(F.col("c") > 0).collect()}
    assert langs == {"en", "de"}
