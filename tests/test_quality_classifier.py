"""Model-based quality tier: logistic regression distilling the
Gopher gate (extensions/classifier.py + the three
documents_quality_classifier_* rows).

The cross-engine hash parity of the full 32-step training trajectory
is covered by tests/test_parity_oracle.py (the oracles unroll every
gradient step); here we pin what an oracle can't see:

- the classifier actually LEARNS (train accuracy beats the majority
  class by a margin) — a divergent lr or a broken gradient would
  still hash-match a replay of the same mistake;
- determinism across repeated trainings (no RNG, no partition-order
  leakage into the rounded updates);
- the scale shape: scoring is broadcast-join + map-side projection
  (no shuffle, no Python row eval), and the trainer's only driver
  traffic is the bounded weight vector per step.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.classifier import (
    LOGREG_ITERS,
    score_logistic,
    train_logistic,
)
from urban_mobility_data_pipeline_spark.plans.llm_ops import (
    _LOGREG_FEATURE_COLS,
    _logreg_feature_frame,
)
from urban_mobility_data_pipeline_spark.plans._helpers import table


def _feats(spark, sf_dir):
    return _logreg_feature_frame(table(spark, sf_dir, "documents"))


def test_classifier_beats_majority(spark, sf_dir):
    feats = _feats(spark, sf_dir)
    w = train_logistic(feats, _LOGREG_FEATURE_COLS)
    scored = score_logistic(feats, w, _LOGREG_FEATURE_COLS)
    row = scored.agg(
        F.avg((F.col("predicted") == F.col("label")).cast("double")).alias(
            "acc"
        ),
        F.avg("label").alias("pos"),
    ).collect()[0]
    majority = max(row["pos"], 1.0 - row["pos"])
    # offline sweep: ~0.93 vs ~0.75 majority on all three test SFs;
    # 0.05 margin keeps the gate meaningful without pinning the exact
    # corpus composition
    assert row["acc"] >= majority + 0.05, (row["acc"], majority)


def test_training_is_deterministic(spark, sf_dir):
    feats = _feats(spark, sf_dir)
    w1 = train_logistic(feats, _LOGREG_FEATURE_COLS).collect()[0]
    # second run on a re-derived frame (fresh lineage, fresh persist)
    w2 = train_logistic(
        _feats(spark, sf_dir), _LOGREG_FEATURE_COLS
    ).collect()[0]
    assert w1.asDict() == w2.asDict()


def test_model_is_one_row_and_nonzero(spark, sf_dir):
    w = train_logistic(_feats(spark, sf_dir), _LOGREG_FEATURE_COLS)
    rows = w.collect()
    assert len(rows) == 1
    vals = list(rows[0].asDict().values())
    assert any(abs(v) > 0.1 for v in vals), vals
    assert LOGREG_ITERS >= 16  # the converged regime the sweep picked


def test_scoring_plan_is_broadcast_and_python_free(spark, sf_dir):
    # disable the size-gated small-table spread (test_spread_scan.py
    # owns its invariants) so the no-shuffle assertion below sees the
    # scoring pipeline's OWN shape
    spark.conf.set("spark.umdp.spread.maxBytes", "0")
    try:
        feats = _feats(spark, sf_dir)
    finally:
        spark.conf.unset("spark.umdp.spread.maxBytes")
    w = train_logistic(feats, _LOGREG_FEATURE_COLS)
    scored = score_logistic(feats, w, _LOGREG_FEATURE_COLS)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # scoring itself must not shuffle: the only exchange is the 1-row
    # weight broadcast
    assert "Exchange hashpartitioning" not in plan, plan


def test_generalizes_to_held_out_fold(spark, sf_dir):
    # train on the fingerprint 'train' fold only, score the unseen
    # 'test' fold: accuracy must still beat the test fold's majority
    # class — pins that the model learned the signal, not the rows
    # (and that the trainer behaves on a FILTERED frame, where ids are
    # sparse and partition counts differ)
    from urban_mobility_data_pipeline_spark.extensions.sampling import (
        train_test_split,
    )

    feats = train_test_split(_feats(spark, sf_dir), key="doc_id")
    train = feats.filter(F.col("split") == "train")
    test = feats.filter(F.col("split") == "test")
    w = train_logistic(train, _LOGREG_FEATURE_COLS)
    scored = score_logistic(test, w, _LOGREG_FEATURE_COLS)
    row = scored.agg(
        F.avg((F.col("predicted") == F.col("label")).cast("double")).alias(
            "acc"
        ),
        F.avg("label").alias("pos"),
    ).collect()[0]
    majority = max(row["pos"], 1.0 - row["pos"])
    assert row["acc"] >= majority + 0.05, (row["acc"], majority)


def test_gradient_step_changes_weights(spark, sf_dir):
    # one step from zero must move every weight with a nonzero
    # feature-residual correlation (a silently-null gradient would
    # converge to the majority predictor and still be deterministic)
    feats = _feats(spark, sf_dir)
    w1 = train_logistic(feats, _LOGREG_FEATURE_COLS, iters=1).collect()[0]
    assert w1["w0"] != 0.0
    assert w1["w1"] != 0.0
