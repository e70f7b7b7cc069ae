"""Distributed linear (logistic-regression) quality classifier —
pure Catalyst, no Spark ML, no RNG, no driver-side weight loop.

The model-based tier of a pre-training quality stack (CCNet
Wenzek et al. 2019; fastText quality filters à la Brown et al. 2020
Appendix A; DataComp-LM 2024): heuristic rules produce cheap weak
labels, a linear classifier is trained on corpus-wide features to
DISTILL the gate into a smooth score, and the score then drives
ranking/sampling decisions the binary gate cannot (soft thresholds,
quality-weighted mixing, curriculum buckets). Here the weak labels
come from the Gopher rule bundle (``documents_gopher_gate``) and the
features are the same published quality signals, so the classifier,
its gradient trajectory, and its scores are all deterministic and
replayable in any SQL engine.

Training is FULL-BATCH gradient descent with every iteration expressed
as one aggregation over the persisted feature frame (map-side partial
sums → one k-column row collected as the next step's literals):

    w_{i+1,j} = round(w_{i,j} - lr/n * Σ_docs (p_i - y) x_j, 6)
    p_i       = round(sigmoid(round(Σ_j w_{i,j} x_j, 6)), 6)

Determinism discipline (the cross-engine replay contract shared with
the k-means/PSI/NB families): features arrive pre-rounded, the logit
and the sigmoid are rounded to 6dp per doc, and the weight update is
rounded to 6dp per iteration, so engine-level differences in float
summation order (~1e-12 relative on these magnitudes) cannot survive
into the next iteration's inputs.

Scale shape: one scan of the persisted feature frame per iteration
(iters+1 total with the scoring pass), each a map-side projection
feeding a partial-agg SUM — no shuffle wider than the k-column
gradient row; the only driver traffic is the k+1-double weight vector
per step (bounded model-class, the same audited category as the BPE
argmax), broadcast back as literals. At 100 TB this is exactly the
published recipe — iters linear passes, embarrassingly parallel,
skew-free (no keyed shuffle at all) — and the weight vector is
parameter-server state, not a distributed dataset.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: gradient-descent defaults — swept offline on all three test scale
#: factors: lr=5/32 iters lands train accuracy 0.93 vs majority 0.74-
#: 0.76 (lr=0.5/8 never escapes the majority predictor; lr=10 gains
#: <1% more). Both are interpolated into the DuckDB oracles, never
#: hardcoded there (advisor r9 on silently-divergeable constants).
LOGREG_LR = 5.0
LOGREG_ITERS = 32
#: feature clips/scales (fixed, data-independent, so the oracle needs
#: no statistics pass): raw word counts are clipped then scaled into
#: the ~[0, 2] range the ratio features live in, keeping one global
#: learning rate sane for all coordinates
N_WORDS_CLIP = 200
N_WORDS_SCALE = 100.0
STOP_HITS_CLIP = 20
STOP_HITS_SCALE = 10.0
#: below this row count the trainer spreads the persisted feature
#: frame across the session's parallelism before the gradient scans
#: (a one-file small corpus is ONE partition -> every gradient job a
#: single task on a single core); above it the input's own layout is
#: trusted — a web-scale feature frame is already wide and collapsing
#: it to defaultParallelism would be the opposite mistake
REPARTITION_MAX_ROWS = 10_000_000


#: Gopher rule-bundle thresholds (Rae et al. 2021 Table A1, scaled to
#: this corpus) — the WEAK LABEL the classifier distills. They live
#: here with the feature builder so every consumer (the catalog rows,
#: their oracles via llm_ops' re-export, the ingest gate, the CLI
#: maintenance jobs) shares one definition.
GOPHER_MIN_WORDS = 20       # published: 50   (scaled to this corpus)
GOPHER_MAX_WORDS = 100_000  # published: 100k
GOPHER_MIN_AVG_WLEN = 3.0   # published: 3
GOPHER_MAX_AVG_WLEN = 10.0  # published: 10
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOP_HITS = 2    # published: >=2 stopwords present
GOPHER_MAX_DUP_BIGRAM = 0.4  # stand-in for the duplicate-line rules

#: the classifier's feature columns, in model order
QUALITY_FEATURE_COLS = ("x1", "x2", "x3", "x4", "x5")


def gopher_feature_frame(
    docs: DataFrame, keep: Sequence[str] = ("doc_id", "source")
) -> DataFrame:
    """Gopher signals -> clipped/scaled features + the weak label.
    Shares every expression (and its rounding) with the
    ``documents_gopher_gate`` row, so the label here IS that row's
    ``verdict = 'pass'`` and the oracles replay both identically.
    ``keep`` lists the input columns carried through beside the
    features — the catalog rows keep (doc_id, source); the ingest
    gate keeps the full curated row so the score is a map-side column,
    never a re-join."""
    from urban_mobility_data_pipeline_spark.functions import text as T

    carry = [c for c in keep]
    staged_cols = list(dict.fromkeys([*carry, "text"]))
    staged = docs.select(*staged_cols, T.words("text").alias("__w"))
    q = T.quality_features("text", words_col=F.col("__w"))
    r = T.repetition_features(F.col("__w"))
    stop_hits = F.size(
        F.filter("__w", lambda x: x.isin(*T.LANG_MARKERS["en"]))
    )
    # internal signal columns carry a __ prefix so a ``keep`` column of
    # the same name (the ingest path's curated frame has its own
    # n_words) can never collide
    raw = staged.select(
        *carry,
        q["n_words"].alias("__g_n_words"),
        q["avg_word_len"].alias("__g_avg_word_len"),
        q["punct_ratio"].alias("__g_symbol_ratio"),
        stop_hits.cast("int").alias("__g_stop_hits"),
        r["dup_bigram_frac"].alias("__g_dup_bigram_frac"),
    )
    passes = (
        (F.col("__g_n_words") >= GOPHER_MIN_WORDS)
        & (F.col("__g_n_words") <= GOPHER_MAX_WORDS)
        & (F.col("__g_avg_word_len") >= GOPHER_MIN_AVG_WLEN)
        & (F.col("__g_avg_word_len") <= GOPHER_MAX_AVG_WLEN)
        & (F.col("__g_symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("__g_stop_hits") >= GOPHER_MIN_STOP_HITS)
        & (F.col("__g_dup_bigram_frac") <= GOPHER_MAX_DUP_BIGRAM)
    )
    return raw.select(
        *carry,
        F.round(
            F.least(F.col("__g_n_words"), F.lit(N_WORDS_CLIP))
            / F.lit(N_WORDS_SCALE),
            6,
        ).alias("x1"),
        F.round(F.col("__g_avg_word_len") / F.lit(10.0), 6).alias("x2"),
        F.col("__g_symbol_ratio").alias("x3"),
        F.round(
            F.least(F.col("__g_stop_hits"), F.lit(STOP_HITS_CLIP))
            / F.lit(STOP_HITS_SCALE),
            6,
        ).alias("x4"),
        F.col("__g_dup_bigram_frac").alias("x5"),
        passes.cast("int").alias("label"),
    )


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def artifact_exists(materialize_dir: str) -> bool:
    """True when a committed model artifact is readable at the dir
    (same local-FS contract as MergeTable's manifest paths; any
    file:// scheme is stripped like MergeTable._local_path does)."""
    import os

    return os.path.isfile(
        os.path.join(
            materialize_dir.removeprefix("file://"), "_SUCCESS"
        )
    )


def train_logistic(
    feats: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    lr: float = LOGREG_LR,
    iters: int = LOGREG_ITERS,
    materialize_dir: str | None = None,
) -> DataFrame:
    """Train logistic-regression weights over ``feats`` and return a
    ONE-ROW frame ``(w0, w1, ..., wk)`` — ``w0`` the bias, ``wj`` the
    weight of ``feature_cols[j-1]``.

    Weights initialize at zero (deterministic — no seed to replay).
    Each iteration is ONE aggregation job over the persisted feature
    frame; the k+1 updated weights — a bounded model-class collect,
    the same audited category as the BPE per-round argmax and the
    nprobe cell ids — come back to the driver and feed the next step
    as literals. The k-means family can afford to stay fully lazy at
    3 unrolled iterations; at 32 GD steps a lazy weight plan nests 32
    copies of the feature lineage and Catalyst analysis time, not the
    scans, becomes the cost — the per-step model collect is also the
    published shape (a weight vector is driver/parameter-server
    state, not a distributed dataset).

    Every update is rounded INSIDE the engine (``F.round``,
    half-up — Python's ``round`` is banker's and would diverge from
    the DuckDB replay), so the collected doubles are exactly the
    values the oracle's unrolled CTEs produce.

    ``materialize_dir``: the TRAIN-ONCE artifact path (the quantizer's
    ``materialize_dir`` contract applied to the classifier). When set
    and an artifact already exists there, training is SKIPPED and the
    stored weights are read back — so a family of consumers (scoring,
    eval, calibration, weighted draw, streaming gate) pays the
    iters-scan training bill exactly once instead of per query. When
    set and absent, the trained ``(w0..wk, n_docs)`` row is written
    as parquet first and read back. 6dp-rounded doubles round-trip
    parquet exactly, so artifact-backed and inline weights are
    bit-identical (pinned by test); the artifact is keyed by its path
    — retraining against a CHANGED corpus needs a new dir or the
    drift-triggered refresh in :func:`refresh_quality_classifier`.
    """
    from pyspark import StorageLevel

    spark = feats.sparkSession
    k = len(feature_cols)
    names = [f"w{j}" for j in range(k + 1)]
    if materialize_dir is not None and artifact_exists(materialize_dir):
        return spark.read.parquet(materialize_dir).select(*names)
    feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
    n = feats.count()  # materializes the persist for the scan loop
    spread = None
    if n <= REPARTITION_MAX_ROWS:
        # a small corpus read from one file is ONE partition, so every
        # gradient job would run a single task on a single core (32
        # sequential single-task jobs measured ~19s on 5k docs).
        # Shuffling the already-computed narrow feature rows across the
        # session's parallelism makes each scan job parallel; guarded
        # by row count because a 100-TB feature frame is already
        # thousands of partitions and collapsing it here would be the
        # opposite mistake.
        spread = feats.repartition(
            spark.sparkContext.defaultParallelism
        ).persist(StorageLevel.MEMORY_AND_DISK)
        spread.count()
        # feats' cache existed to price the count and seed the shuffle;
        # only the repartitioned copy is read by the gradient loop
        feats.unpersist()
    loop_frame = spread if spread is not None else feats
    xs = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
    try:
        w = [0.0] * (k + 1)
        for _ in range(iters):
            z = F.round(
                sum(F.lit(wj) * x for wj, x in zip(w, xs)), 6
            )
            p = F.round(_sigmoid(z), 6)
            r = p - F.col(label_col)
            row = loop_frame.agg(
                *[
                    F.round(
                        F.lit(wj) - (lr / n) * F.sum(r * x), 6
                    ).alias(nm)
                    for nm, wj, x in zip(names, w, xs)
                ]
            ).collect()[0]
            w = [float(row[nm]) for nm in names]
    finally:
        feats.unpersist()
        if spread is not None:
            spread.unpersist()
    trained = spark.range(1).select(
        *[F.lit(wj).alias(nm) for nm, wj in zip(names, w)],
        F.lit(n).cast("long").alias("n_docs"),
    )
    if materialize_dir is not None:
        # k+2 doubles/longs in one row — a metadata-class write
        trained.coalesce(1).write.mode("overwrite").parquet(
            materialize_dir
        )
        return spark.read.parquet(materialize_dir).select(*names)
    return trained.select(*names)


def read_model_artifact(spark, materialize_dir: str) -> DataFrame:
    """The full stored artifact row ``(w0..wk, n_docs)`` — what the
    model-emitting catalog row returns without re-counting the corpus
    (the n is the one training already computed)."""
    return spark.read.parquet(materialize_dir)


def score_logistic(
    feats: DataFrame,
    weights: DataFrame,
    feature_cols: Sequence[str],
) -> DataFrame:
    """Score every row of ``feats`` with a trained weight row: appends
    ``quality_prob`` (6dp sigmoid) and ``predicted`` (prob ≥ 0.5).
    One broadcast join — the weights are a single row — then a
    map-side projection; no shuffle at any corpus size."""
    names = [f"w{j}" for j in range(len(feature_cols) + 1)]
    xs = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
    z = F.round(sum(F.col(nm) * x for nm, x in zip(names, xs)), 6)
    return (
        feats.crossJoin(F.broadcast(weights))
        .withColumn("quality_prob", F.round(_sigmoid(z), 6))
        .withColumn(
            "predicted",
            (F.col("quality_prob") >= F.lit(0.5)).cast("int"),
        )
        .drop(*names)
    )
