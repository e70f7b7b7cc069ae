"""Incrementally maintained DSIR bucket model (delta view maintenance).

The DSIR gate (plans/streaming_q.py:streaming_dsir_gate) and resample
(plans/llm_ops.py:corpus_dsir_sample) score against two hashed-n-gram
bucket distributions — target domain vs raw corpus. Re-deriving them is
a full corpus re-featurization per refresh; at 100 TB that's the same
bill the vocabulary table already refuses to pay. This module applies
extensions/vocab.py's delta-maintenance recipe to the DSIR model:

1. a ``dsir_model`` MergeTable holds (bucket, r, t) — raw and
   target-slice feature counts, <= ``buckets`` rows;
2. each refresh reads ONLY the docs committed since the cursor (after
   image via the change feed, before image via time travel), rolls
   both slices up to per-bucket counts, and MERGEs the difference;
3. re-emitted-but-unchanged docs cancel to a zero delta; updates
   subtract old features and add new ones; GDPR erasures subtract
   cleanly (same correctness argument as refresh_vocabulary);
4. :func:`current_log_ratios` turns the live counts into the rounded
   (bucket, lr) frame — IDENTICAL doubles to the batch
   ``dsir_bucket_log_ratios`` on the current corpus, so a deployed
   gate can swap between batch-trained and incrementally-maintained
   models without a hash change.

The target slice is defined by a caller-supplied boolean Column over
the corpus row (e.g. ``F.col("lang") == "en"`` or
``F.col("source").isin(...)``) so the same machinery serves any
domain-steering predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.dsir import (
    DSIR_BUCKETS,
    hashed_feature_buckets,
)
from urban_mobility_data_pipeline_spark.functions import text as T
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor

DSIR_MODEL_JOB = "dsir_model"


def dsir_contributions(
    docs: DataFrame,
    target_pred: Column,
    *,
    buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, r, t) rollup of a document slice: r counts every
    feature occurrence, t only those from target-predicate docs. One
    explode with map-side partial aggregation; full recompute and
    incremental delta share this single definition."""
    feats = docs.select(
        target_pred.alias("__tgt"),
        F.explode(
            hashed_feature_buckets(T.words(text_col), buckets)
        ).alias("bucket"),
    )
    return feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("r"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0))
        .cast("long")
        .alias("t"),
    )


def refresh_dsir_model(
    corpus: MergeTable,
    model: MergeTable,
    cursor: VersionCursor,
    target_pred: Column,
    *,
    job: str = DSIR_MODEL_JOB,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> int:
    """Fold all corpus commits since the cursor into ``model``; returns
    the number of changed docs processed (0 = already current).

    Refresh cost is O(changed docs) + a <= ``buckets``-row MERGE —
    never a corpus scan after bootstrap. Same CDC contract as
    refresh_vocabulary: vacuum retention must exceed refresh cadence
    so the before image is still readable."""
    head_hist = corpus.history()
    head = head_hist[0]["version"] if head_hist else 0
    cur = cursor.read_version(job)
    if cur > 0 and not corpus.snapshot_readable(cur):
        # a physical vacuum (e.g. a GDPR erase's purge) outran this
        # cursor: time travel / the change feed back to `cur` would
        # read deleted files — fall back to the full rebuild branch
        cur = 0
    if not model.exists() or cur == 0:
        full = dsir_contributions(
            corpus.read(), target_pred, buckets=buckets, text_col=text_col
        )
        if model.exists():
            model.replace(full)
        else:
            model.create(full)
        n = corpus.read().count()
        cursor.upsert(job, head, "OK")
        return n
    if head <= cur:
        cursor.upsert(job, None, "OK")
        return 0
    try:
        changed_ids = (
            corpus.read_changes(cur)
            .select(id_col)
            .unionByName(corpus.read_removed(cur).select(id_col))
            .distinct()
        )
        after = corpus.read().join(changed_ids, id_col)
        before = corpus.read(version=cur).join(changed_ids, id_col)
        a = dsir_contributions(
            after, target_pred, buckets=buckets, text_col=text_col
        ).select("bucket", F.col("r").alias("r_a"), F.col("t").alias("t_a"))
        b = dsir_contributions(
            before, target_pred, buckets=buckets, text_col=text_col
        ).select("bucket", F.col("r").alias("r_b"), F.col("t").alias("t_b"))
        delta = (
            a.join(b, "bucket", "full_outer")
            .select(
                "bucket",
                (
                    F.coalesce("r_a", F.lit(0)) - F.coalesce("r_b", F.lit(0))
                ).alias("r"),
                (
                    F.coalesce("t_a", F.lit(0)) - F.coalesce("t_b", F.lit(0))
                ).alias("t"),
            )
            .filter((F.col("r") != 0) | (F.col("t") != 0))
        )
        model.merge(
            delta,
            keys=["bucket"],
            update_set={
                "r": F.col("t.r") + F.col("s.r"),
                "t": F.col("t.t") + F.col("s.t"),
            },
            insert=True,
        )
        n = changed_ids.count()
        cursor.upsert(job, head, "OK")
        return n
    except Exception as exc:
        cursor.upsert(job, None, f"FAIL: {exc}")
        raise


def current_log_ratios(
    model: MergeTable, *, buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """(bucket, lr): the live model as rounded log importance ratios —
    the same formula, rounding, and therefore the same doubles as the
    batch ``dsir_bucket_log_ratios`` over the current corpus. Buckets
    whose raw count has dropped to zero (all containing docs since
    erased) are filtered like zero-df vocab tokens."""
    from urban_mobility_data_pipeline_spark.extensions.dsir import (
        log_ratios_from_counts,
    )

    return log_ratios_from_counts(model.read(), buckets=buckets)
