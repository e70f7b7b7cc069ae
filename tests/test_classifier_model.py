"""Train-once classifier artifact + drift-triggered refresh + GDPR
propagation through model artifacts (VERDICT r10 items 3 and 9).

The oracle sweep already hash-checks the training trajectory; here we
pin the artifact lifecycle an oracle can't see:

- artifact-backed weights are BIT-IDENTICAL to inline training, and a
  present artifact short-circuits training (proven by poisoning it);
- the maintained weak-label/feature histogram equals a from-scratch
  rollup after every mutation cycle (same invariant as the drift
  model);
- a same-distribution append keeps the standing model (psi below
  trigger, no retrain); a distribution flood retrains it;
- GDPR erasure reaches the artifact tier: with a retrain closure the
  weights are re-derived from the post-erasure corpus, without one
  the artifact is deleted — never silently stale.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.classifier import (
    artifact_exists,
    train_logistic,
)
from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
    clf_hist_contributions,
    refresh_quality_classifier,
)
from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
    ModelArtifact,
    erase_document_ids,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor
from urban_mobility_data_pipeline_spark.plans._helpers import table
from urban_mobility_data_pipeline_spark.plans.llm_ops import (
    _LOGREG_FEATURE_COLS,
    _logreg_feature_frame,
)


def _weights(spark, model_dir):
    return {
        k: v
        for k, v in spark.read.parquet(model_dir).collect()[0].asDict().items()
    }


def test_artifact_weights_bit_identical_and_short_circuit(
    spark, sf_dir, tmp_path
):
    feats = _logreg_feature_frame(table(spark, sf_dir, "documents"))
    inline = train_logistic(feats, _LOGREG_FEATURE_COLS).collect()[0]
    model_dir = str(tmp_path / "weights")
    stored = train_logistic(
        feats, _LOGREG_FEATURE_COLS, materialize_dir=model_dir
    ).collect()[0]
    for j in range(6):
        assert stored[f"w{j}"] == inline[f"w{j}"], j  # bit-for-bit
    art = _weights(spark, model_dir)
    assert art["n_docs"] == feats.count()

    # poison the artifact; a second call must READ it, not retrain
    spark.range(1).select(
        *[F.lit(float(j + 100)).alias(f"w{j}") for j in range(6)],
        F.lit(7).cast("long").alias("n_docs"),
    ).coalesce(1).write.mode("overwrite").parquet(model_dir)
    again = train_logistic(
        feats, _LOGREG_FEATURE_COLS, materialize_dir=model_dir
    ).collect()[0]
    assert again["w0"] == 100.0  # came from the artifact, not training


@pytest.fixture()
def setup(spark, sf_dir, tmp_path):
    corpus = MergeTable(spark, str(tmp_path / "corpus"))
    corpus.create(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    hist = MergeTable(spark, str(tmp_path / "hist"))
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))
    model_dir = str(tmp_path / "model")
    return corpus, hist, cursor, model_dir


def _refresh(corpus, model_dir, hist, cursor, **kw):
    return refresh_quality_classifier(
        corpus,
        model_dir,
        hist,
        cursor,
        _logreg_feature_frame,
        _LOGREG_FEATURE_COLS,
        **kw,
    )


def _hist_expected(corpus):
    return {
        (r.feat, r.b): r.c
        for r in clf_hist_contributions(
            _logreg_feature_frame(corpus.read()), _LOGREG_FEATURE_COLS
        ).collect()
    }


def _hist_got(hist):
    return {
        (r.feat, r.b): r.c
        for r in hist.read().filter(F.col("c") > 0).collect()
    }


def test_refresh_lifecycle_stable_then_drift(spark, setup):
    corpus, hist, cursor, model_dir = setup

    r = _refresh(corpus, model_dir, hist, cursor)
    assert r["retrained"] == 1 and r["changed"] == corpus.read().count()
    assert artifact_exists(model_dir)
    assert _hist_got(hist) == _hist_expected(corpus)
    w0 = _weights(spark, model_dir)

    # no new commits -> no work, no retrain
    r = _refresh(corpus, model_dir, hist, cursor)
    assert r == {
        "changed": 0, "psi": 0.0, "psi_feature": "", "retrained": 0,
    }

    # same-distribution append (clones of existing docs, new ids):
    # the histogram shifts only by volume, PSI stays under trigger
    clones = (
        corpus.read()
        .limit(50)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
    corpus.merge(clones, keys=["doc_id"], insert=True)
    r = _refresh(corpus, model_dir, hist, cursor)
    # change-feed re-emission may over-report ids (a CoW merge rewrites
    # whole files; unchanged docs cancel in the delta) — the invariant
    # is the histogram and the no-retrain verdict, not the raw count
    assert r["changed"] > 0 and r["retrained"] == 0
    assert r["psi"] < 0.25
    assert _weights(spark, model_dir) == w0  # artifact stands
    assert _hist_got(hist) == _hist_expected(corpus)

    # distribution flood: 1000 degenerate docs (pure symbols, no
    # stopwords -> label 0, extreme x3/x4 bins) on a 550-doc corpus
    junk = spark.createDataFrame(
        [
            (2_000_000 + i, "!!! ### $$$ %%% ^^^ &&&", "xx", "junkfeed", 23)
            for i in range(1000)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    corpus.merge(junk, keys=["doc_id"], insert=True)
    r = _refresh(corpus, model_dir, hist, cursor)
    assert r["changed"] > 0 and r["psi"] >= 0.25
    assert r["retrained"] == 1 and r["psi_feature"] != ""
    w1 = _weights(spark, model_dir)
    assert w1 != w0  # retrained against the shifted corpus
    assert w1["n_docs"] == corpus.read().count()
    assert _hist_got(hist) == _hist_expected(corpus)


def test_gdpr_erasure_reaches_artifacts(spark, setup):
    corpus, hist, cursor, model_dir = setup
    _refresh(corpus, model_dir, hist, cursor)
    w_before = _weights(spark, model_dir)
    erased = [r.doc_id for r in corpus.read().limit(20).collect()]

    def retrain():
        train_logistic(
            _logreg_feature_frame(corpus.read()),
            _LOGREG_FEATURE_COLS,
            materialize_dir=model_dir,
        )

    snap_dir = model_dir + "_train_hist"
    art = ModelArtifact(model_dir, snap_dir, retrain=retrain)
    deleted = erase_document_ids(
        spark,
        erased,
        {"documents": corpus},
        artifacts={"quality_classifier": art},
    )
    assert deleted["documents"] == 20
    w_after = _weights(spark, model_dir)
    assert w_after != w_before  # re-derived, not stale
    # and equals a from-scratch train on the post-erasure corpus
    fresh = train_logistic(
        _logreg_feature_frame(corpus.read()), _LOGREG_FEATURE_COLS
    ).collect()[0]
    for j in range(6):
        assert w_after[f"w{j}"] == fresh[f"w{j}"], j


def test_gdpr_invalidates_without_retrain(spark, setup):
    corpus, hist, cursor, model_dir = setup
    _refresh(corpus, model_dir, hist, cursor)
    snap_dir = model_dir + "_train_hist"
    assert artifact_exists(model_dir) and os.path.isdir(snap_dir)
    art = ModelArtifact(model_dir, snap_dir)  # no retrain closure
    erased = [r.doc_id for r in corpus.read().limit(5).collect()]
    erase_document_ids(
        spark,
        erased,
        {"documents": corpus},
        artifacts={"m": art},
    )
    # deleted outright — the next consumer retrains; never stale
    assert not artifact_exists(model_dir)
    assert not os.path.isdir(snap_dir)
    assert not art.exists()


def _scores_map(scores):
    return {
        r["doc_id"]: (r["quality_prob"], r["predicted"], r["label"])
        for r in scores.read().collect()
    }


def _batch_scores(spark, corpus, model_dir):
    from urban_mobility_data_pipeline_spark.extensions.classifier import (
        score_logistic,
    )

    w = spark.read.parquet(model_dir).select(
        *[f"w{j}" for j in range(6)]
    )
    out = score_logistic(
        _logreg_feature_frame(corpus.read()), w, _LOGREG_FEATURE_COLS
    )
    return {
        r["doc_id"]: (r["quality_prob"], r["predicted"], r["label"])
        for r in out.collect()
    }


def test_maintained_scores_fold_exactly_and_rekey_on_retrain(
    spark, setup, tmp_path
):
    """refresh_quality_scores: the maintained per-doc score table
    equals a from-scratch scoring of the current corpus after every
    mutation cycle (scoring folds EXACTLY, unlike training), and a
    model retrain — a new artifact fingerprint — forces one full
    rescore so rows can never mix model versions."""
    from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
        refresh_quality_scores,
    )

    corpus, hist, cursor, model_dir = setup
    _refresh(corpus, model_dir, hist, cursor)  # trains the artifact
    scores = MergeTable(spark, str(tmp_path / "scores"))
    s_cursor = VersionCursor(spark, str(tmp_path / "scursor"))

    def tick():
        return refresh_quality_scores(
            corpus, model_dir, scores, s_cursor,
            _logreg_feature_frame, _LOGREG_FEATURE_COLS,
        )

    r = tick()
    assert r["mode"] == "full"
    assert _scores_map(scores) == _batch_scores(spark, corpus, model_dir)
    assert tick() == {"changed": 0, "mode": "noop"}

    # mutate: update one doc's text, append new docs, erase one
    ids = [r_[0] for r_ in corpus.read().select("doc_id").limit(2).collect()]
    upd = corpus.read().filter(F.col("doc_id") == ids[0]).withColumn(
        "text", F.lit("a wholly different short text now here today ok")
    )
    corpus.merge(
        upd.localCheckpoint(), keys=["doc_id"],
        update_set={"text": F.col("s.text")}, insert=False,
    )
    corpus.delete(F.col("doc_id") == ids[1])
    fresh = corpus.read().limit(3).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    corpus.merge(fresh.localCheckpoint(), keys=["doc_id"], insert=True)
    r = tick()
    assert r["mode"] == "delta" and r["changed"] > 0
    got = _scores_map(scores)
    assert got == _batch_scores(spark, corpus, model_dir)
    assert ids[1] not in got  # erased id left the scores table too

    # retrain the model (GDPR/drift path): fingerprint changes -> the
    # next tick does ONE full rescore under the new weights
    from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
        rebuild_quality_classifier,
    )

    corpus.delete(F.col("doc_id").isin(
        [r_[0] for r_ in corpus.read().select("doc_id").limit(40).collect()]
    ))
    rebuild_quality_classifier(
        corpus, model_dir, hist, _logreg_feature_frame,
        _LOGREG_FEATURE_COLS,
    )
    r = tick()
    assert r["mode"] == "full"
    assert _scores_map(scores) == _batch_scores(spark, corpus, model_dir)


def test_refresh_after_erase_does_not_double_fold(spark, setup):
    """ADVICE r11 (medium): a GDPR rebuild reseeds the histogram from
    the post-erasure corpus; if the cursor is NOT advanced with it, the
    next refresh tick takes the steady-state branch and folds the
    erasure's (after − before) delta into the already-reseeded state —
    double-subtracting erased docs. rebuild_quality_classifier(cursor=)
    (the shape run.py's erase closure uses) pins the cursor to the
    corpus head, so the tick after an erase is a clean no-op and the
    live histogram stays equal to the from-scratch rollup."""
    corpus, hist, cursor, model_dir = setup
    _refresh(corpus, model_dir, hist, cursor)  # bootstrap

    # a normal commit between the bootstrap and the erase (the
    # double-count ALSO hits commits between cursor and erase)
    clones = corpus.read().limit(10).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    corpus.merge(clones.localCheckpoint(), keys=["doc_id"], insert=True)

    erased = [r.doc_id for r in corpus.read().limit(15).collect()]

    def retrain():
        from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
            rebuild_quality_classifier,
        )

        rebuild_quality_classifier(
            corpus, model_dir, hist,
            _logreg_feature_frame, _LOGREG_FEATURE_COLS,
            cursor=cursor,
        )

    art = ModelArtifact(
        model_dir, model_dir + "_train_hist", retrain=retrain
    )
    erase_document_ids(
        spark, erased, {"documents": corpus},
        artifacts={"quality_classifier": art},
    )
    # reseed already matches the post-erasure corpus
    assert _hist_got(hist) == _hist_expected(corpus)

    # the next maintenance tick must see a caught-up cursor: no fold
    r = _refresh(corpus, model_dir, hist, cursor)
    assert r == {
        "changed": 0, "psi": 0.0, "psi_feature": "", "retrained": 0,
    }
    assert _hist_got(hist) == _hist_expected(corpus)

    # and a LATER real commit still folds exactly from the reseeded base
    more = corpus.read().limit(5).select(
        (F.col("doc_id") + 4_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    corpus.merge(more.localCheckpoint(), keys=["doc_id"], insert=True)
    r = _refresh(corpus, model_dir, hist, cursor)
    assert r["changed"] > 0
    assert _hist_got(hist) == _hist_expected(corpus)


def test_artifact_paths_accept_file_scheme(spark, setup, tmp_path):
    """ADVICE r11: artifact + sidecar paths may arrive file://-prefixed
    (MergeTable supports the scheme via _local_path); artifact_exists,
    ModelArtifact, and the scores fingerprint sidecar must strip it
    before raw filesystem operations instead of crashing or silently
    missing the stored state."""
    from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
        refresh_quality_scores,
    )

    corpus, hist, cursor, model_dir = setup
    _refresh(corpus, model_dir, hist, cursor)
    assert artifact_exists("file://" + model_dir)

    art = ModelArtifact("file://" + model_dir)
    assert art.exists()

    # maintained scores against a file://-prefixed table path: the
    # fingerprint sidecar round-trips (full -> noop, not crash/full)
    scores = MergeTable(spark, "file://" + str(tmp_path / "scores"))
    s_cursor = VersionCursor(spark, str(tmp_path / "scursor"))

    def tick():
        return refresh_quality_scores(
            corpus, model_dir, scores, s_cursor,
            _logreg_feature_frame, _LOGREG_FEATURE_COLS,
        )

    assert tick()["mode"] == "full"
    assert tick() == {"changed": 0, "mode": "noop"}

    art.invalidate()
    assert not art.exists() and not artifact_exists(model_dir)
