"""Incrementally maintained drift histogram (delta view maintenance).

``corpus_source_drift_psi`` (plans/llm_ops.py) re-bins the whole corpus
per run — at 100 TB that is a full scan per monitoring tick for a
report whose input state is a tiny (group, octave) -> count table. This
module keeps that histogram CURRENT as ingest cycles land, paying only
for the documents that changed, with exactly the machinery the
maintained vocabulary uses (extensions/vocab.py): the corpus txn log
names the versions, a :class:`VersionCursor` records the last one
folded in, and each refresh MERGEs the (after − before) count delta of
the changed slice. Change-feed re-emission cancels for the same reason
it does for the vocab: an untouched doc contributes the same (group,
octave) cell to both images.

The PSI report itself is one shared tail — :func:`psi_from_counts` —
consumed by BOTH the batch query (counts straight off the corpus) and
the maintained path (counts off the histogram table), so "maintained ==
batch" is an equality of inputs, not a re-implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor

DRIFT_JOB = "corpus_drift_hist"

#: PSI alert thresholds scaled by the 8-decimal integer term encoding
PSI_SCALE = 100_000_000
PSI_WATCH = 10_000_000  # 0.1
PSI_SHIFT = 25_000_000  # 0.25


def octave(col) -> F.Column:  # noqa: ANN001 - Column | str
    """Power-of-two histogram bin: length(bin(greatest(x, 1))) — integer
    exact in every engine (same binning as the batch PSI query and the
    quantile sketch)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.bin(F.greatest(c, F.lit(1))))


def hist_contributions(
    docs: DataFrame, group_col: str = "source", size_col: str = "n_chars"
) -> DataFrame:
    """(group, e, c) octave-histogram rollup of a document slice — the
    shared definition for full recompute and incremental delta."""
    return (
        docs.select(F.col(group_col).alias("grp"), octave(size_col).alias("e"))
        .groupBy("grp", "e")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def current_histogram(hist: MergeTable) -> DataFrame:
    """Live cells only (delta folding keeps zero rows, like the vocab)."""
    return hist.read().filter(F.col("c") > 0)


def refresh_drift_hist(
    corpus: MergeTable,
    hist: MergeTable,
    cursor: VersionCursor,
    job: str = DRIFT_JOB,
    id_col: str = "doc_id",
    group_col: str = "source",
    size_col: str = "n_chars",
) -> int:
    """Fold all corpus commits since the cursor into ``hist``; returns
    the number of changed docs processed (0 = already current).

    Incremental runs read ONLY the changed docs — after image via the
    change feed, before image via time travel semi-joined to the
    changed ids — so a monitoring tick is O(changed), not O(corpus).
    Same CDC contract as the vocab: vacuum retention must outlive the
    refresh cadence."""
    head_hist = corpus.history()
    head = head_hist[0]["version"] if head_hist else 0
    cur = cursor.read_version(job)
    if cur > 0 and not corpus.snapshot_readable(cur):
        # a physical vacuum (e.g. a GDPR erase's purge) outran this
        # cursor: time travel / the change feed back to `cur` would
        # read deleted files — fall back to the full rebuild branch
        cur = 0
    if not hist.exists() or cur == 0:
        full = hist_contributions(corpus.read(), group_col, size_col)
        if hist.exists():
            hist.replace(full)
        else:
            hist.create(full)
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
        a = hist_contributions(after, group_col, size_col).select(
            "grp", "e", F.col("c").alias("c_a")
        )
        b = hist_contributions(before, group_col, size_col).select(
            "grp", "e", F.col("c").alias("c_b")
        )
        delta = (
            a.join(b, ["grp", "e"], "full_outer")
            .select(
                "grp",
                "e",
                (
                    F.coalesce("c_a", F.lit(0)) - F.coalesce("c_b", F.lit(0))
                ).alias("c"),
            )
            .filter(F.col("c") != 0)
        )
        hist.merge(
            delta,
            keys=["grp", "e"],
            update_set={"c": F.col("t.c") + F.col("s.c")},
            insert=True,
        )
        n = changed_ids.count()
        cursor.upsert(job, head, "OK")
        return n
    except Exception as exc:
        cursor.upsert(job, None, f"FAIL: {exc}")
        raise


def psi_from_counts(sb: DataFrame) -> DataFrame:
    """Per-group PSI report from a (grp, e, c) count frame — the one
    tail shared by the batch query and the maintained histogram.
    Laplace-smoothed, each term rounded to 8dp and summed as an INTEGER
    (order-independent), thresholds 0.1 / 0.25."""
    btot = sb.groupBy("e").agg(F.sum("c").alias("cb"))
    stot = sb.groupBy("grp").agg(F.sum("c").alias("ns"))
    gtot = sb.agg(F.sum("c").alias("n"), F.countDistinct("e").alias("nbins"))
    grid = (
        stot.select("grp", "ns")
        .crossJoin(F.broadcast(btot))
        .crossJoin(F.broadcast(gtot))
        .join(sb, ["grp", "e"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    p = (F.col("c") + 1) / (F.col("ns") + F.col("nbins")).cast("double")
    q = (F.col("cb") - F.col("c") + 1) / (
        F.col("n") - F.col("ns") + F.col("nbins")
    ).cast("double")
    t8 = F.round((p - q) * F.log(p / q) * PSI_SCALE).cast("long")
    agg = grid.select("grp", "ns", t8.alias("t8")).groupBy("grp").agg(
        F.min("ns").alias("n_docs"), F.sum("t8").alias("s8")
    )
    return agg.select(
        F.col("grp").alias("source"),
        "n_docs",
        F.round(F.col("s8") / float(PSI_SCALE), 4).alias("psi"),
        F.when(F.col("s8") >= PSI_SHIFT, F.lit("shifted"))
        .when(F.col("s8") >= PSI_WATCH, F.lit("watch"))
        .otherwise(F.lit("stable"))
        .alias("drift_tier"),
    )
