"""DSIR — Data Selection via Importance Resampling (arXiv:2302.03169).

The published recipe for steering a raw crawl toward a target domain
without training a model: featurize every document into HASHED n-gram
buckets, fit two bag-of-buckets unigram models (target domain vs raw
corpus, add-1 smoothed), score each raw document by its log importance
weight log p_target(doc) - log p_raw(doc), and resample with Gumbel
top-k on the weights.

Spark-first shape, sized for 100 TB:

* ONE explode pass builds per-(doc, bucket) counts; only (doc_id,
  source, bucket int, count) rows ever shuffle — never text.
* Both bucket-count models are <= ``buckets`` rows: broadcast joins.
* Corpus totals are 1-row aggregates broadcast into the scoring plan.
* The resample is a TakeOrderedAndProject on the ROUNDED priority with
  a doc_id tiebreak — each partition forwards at most k rows.

Everything is engine-portable (md5 bucket hash, integer counts, ln of
ratios of integers, deterministic md5-derived Gumbel noise), so the
whole pipeline replays as SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DSIR_BUCKETS = 256
DSIR_NGRAM_MAX = 2  # unigrams + bigrams, per the paper


def hashed_feature_buckets(toks_col: Column, buckets: int = DSIR_BUCKETS) -> Column:
    """Array of hashed-n-gram bucket ids (unigrams + bigrams) for a
    token-array column. md5 -> first 16 bits -> mod buckets, the same
    engine-portable fingerprint recipe as extensions.sampling."""
    bigrams = F.zip_with(
        F.slice(toks_col, 1, F.size(toks_col) - 1),
        F.slice(toks_col, 2, F.size(toks_col) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    feats = F.concat(
        toks_col,
        F.when(F.size(toks_col) >= 2, bigrams).otherwise(
            F.array().cast("array<string>")
        ),
    )
    return F.transform(
        feats,
        lambda s: (
            F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("long")
            % F.lit(int(buckets))
        ).cast("int"),
    )


def doc_bucket_counts(
    docs: DataFrame,
    toks_col: Column,
    *,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, source, bucket, c): per-document hashed-feature counts.
    The explode collapses map-side to count partials before the
    (doc_id, bucket) shuffle."""
    return (
        docs.select(
            "doc_id",
            "source",
            F.explode(hashed_feature_buckets(toks_col, buckets)).alias(
                "bucket"
            ),
        )
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_weights(
    fb: DataFrame,
    target_sources: tuple[str, ...],
    *,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, source, n_feats, log_weight): add-1-smoothed
    log p_target - log p_raw per document, from per-doc bucket counts.

    The raw model counts EVERY doc (the target slice is part of the
    raw distribution, as in the paper's continued-pretraining setting);
    the target model counts only ``target_sources`` docs. Both models
    and both totals broadcast; the per-doc reduce is one groupBy."""
    raw = fb.groupBy("bucket").agg(F.sum("c").alias("r"))
    tgt = (
        fb.where(F.col("source").isin(*target_sources))
        .groupBy("bucket")
        .agg(F.sum("c").alias("t"))
    )
    totals = raw.agg(F.sum("r").alias("cr")).join(
        tgt.agg(F.sum("t").alias("ct"))
    )
    b = F.lit(float(buckets))
    term = F.col("c") * (
        F.log(
            (F.coalesce(F.col("t"), F.lit(0)) + F.lit(1.0))
            / (F.col("ct") + b)
        )
        - F.log((F.col("r") + F.lit(1.0)) / (F.col("cr") + b))
    )
    return (
        fb.join(F.broadcast(raw), "bucket")
        .join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(totals))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.round(F.sum(term), 6).alias("log_weight"),
        )
    )


def gumbel_key(id_col: str = "doc_id") -> Column:
    """Deterministic Gumbel(0,1) noise from the id: u = md5-uniform in
    (0,1), g = -ln(-ln u). Same doubles in any md5+ln engine."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("g|"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    return -F.log(-F.log(u))


def dsir_resample(weights: DataFrame, k: int) -> DataFrame:
    """Gumbel top-k over log weights: priority = log_weight + Gumbel
    noise; keep the k highest. Equivalent to sampling k docs without
    replacement with probability proportional to the importance weight
    — but deterministic, reproducible across engines and partition
    layouts. TakeOrderedAndProject on the rounded priority."""
    return (
        weights.withColumn(
            "priority", F.round(F.col("log_weight") + gumbel_key(), 6)
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(k)
    )


def dsir_bucket_log_ratios(
    fb: DataFrame,
    target_sources: tuple[str, ...],
    *,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(bucket, lr): the per-bucket log importance ratio
    ln p_target(b) - ln p_raw(b), ROUNDED to 9 decimals — the broadcast
    'model' a stateless streaming gate scores against. Rounding here
    (before any per-doc summation) makes the per-feature contributions
    bit-identical across engines, so a map-side array fold in Spark
    and a bucket-count join in SQL agree after the final round."""
    raw = fb.groupBy("bucket").agg(F.sum("c").alias("r"))
    tgt = (
        fb.where(F.col("source").isin(*target_sources))
        .groupBy("bucket")
        .agg(F.sum("c").alias("t"))
    )
    totals = raw.agg(F.sum("r").alias("cr")).join(
        tgt.agg(F.sum("t").alias("ct"))
    )
    b = F.lit(float(buckets))
    return (
        raw.join(tgt, "bucket", "left")
        .join(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("t"), F.lit(0)) + F.lit(1.0))
                    / (F.col("ct") + b)
                )
                - F.log((F.col("r") + F.lit(1.0)) / (F.col("cr") + b)),
                9,
            ).alias("lr"),
        )
    )


def log_ratios_from_counts(
    counts: DataFrame, *, buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """(bucket, lr) from a (bucket, r, t) counts frame — the shared
    tail of model training: totals broadcast, add-1 smoothing, ratio
    rounded to 9 decimals. Identical doubles whether the counts came
    from a one-pass corpus rollup (``dsir_model.dsir_contributions``),
    the per-doc fb table (:func:`dsir_bucket_log_ratios`), or the
    incrementally maintained model table."""
    live = counts.filter(F.col("r") > 0)
    totals = live.agg(F.sum("r").alias("cr"), F.sum("t").alias("ct"))
    b = F.lit(float(buckets))
    return live.join(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log((F.col("t") + F.lit(1.0)) / (F.col("ct") + b))
            - F.log((F.col("r") + F.lit(1.0)) / (F.col("cr") + b)),
            9,
        ).alias("lr"),
    )
