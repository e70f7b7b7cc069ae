"""Incrementally maintained near-dup (MinHash-LSH) index.

``near_dup_pairs`` (extensions/dedup.py) re-signatures the whole corpus
per run — at 100 TB that is a full re-tokenization to ask "does this
morning's crawl duplicate anything we already have?". This module keeps
the LSH BAND TABLE as a :class:`MergeTable` maintained from the corpus
txn log (the same delta-maintenance contract as
``extensions/vocab.py``), so dedup-at-ingest pays

- O(new batch) to signature the incoming docs, plus
- one co-partitioned join of (|new| x B) band rows against the
  persisted index — bucket-sized work, never O(corpus).

Index layout: one row per (doc_id, band_id) with that band's key —
a FIXED key set per doc (B rows), so maintenance is a plain MERGE on
(doc_id, band_id): changed text updates band_key in place, erased docs
delete their B rows. Signature/band definitions are imported from
extensions/dedup.py, so the incremental path can never drift from the
batch pipeline (same constants, same md5 slicing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.dedup import (
    LSH_BANDS,
    jaccard,
    lsh_band_keys,
    minhash_signatures,
    shingles_df,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor

DEDUP_INDEX_JOB = "corpus_dedup_index"


def band_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band_id, band_key) for a document slice — the index's
    row format, via the SAME signature pipeline as the batch dedup.
    ``shingles`` accepts a pre-staged shingle frame (the ingest probes
    need the batch's shingles AGAIN for the Jaccard verify — staging
    them once saves a second tokenize pass per batch)."""
    return lsh_band_keys(
        minhash_signatures(docs, id_col, text_col, shingles=shingles),
        id_col,
    )


def bucket_size_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(band_id, band_key, n) bucket-membership counts for a document
    slice — the delta unit the maintained sizes table folds in."""
    return band_rows(docs, id_col, text_col).groupBy(
        "band_id", "band_key"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def _fold_bucket_sizes(
    sizes: MergeTable, adds: DataFrame, removes: DataFrame,
    id_col: str, text_col: str,
    adds_bands: DataFrame | None = None,
) -> None:
    """Aggregate-upsert the (adds − removes) bucket-count delta into
    the sizes table: one MERGE keyed (band_id, band_key), additive
    update. O(changed buckets), never a corpus or index rescan —
    the same delta-maintenance contract as the index itself.
    ``adds_bands`` accepts the staged :func:`band_rows` frame the
    refresh just appended to the index, so the adds side is a groupBy
    of the cached bands instead of a second signature pass."""
    add_side = (
        adds_bands.groupBy("band_id", "band_key").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        if adds_bands is not None
        else bucket_size_rows(adds, id_col, text_col)
    )
    delta = (
        add_side
        .unionByName(
            bucket_size_rows(removes, id_col, text_col).select(
                "band_id", "band_key", (-F.col("n")).alias("n")
            )
        )
        .groupBy("band_id", "band_key")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") != 0)
    )
    sizes.merge(
        delta,
        keys=["band_id", "band_key"],
        update_set={"n": F.col("t.n") + F.col("s.n")},
        insert=True,
    )


def refresh_dedup_index(
    corpus: MergeTable,
    index: MergeTable,
    cursor: VersionCursor,
    job: str = DEDUP_INDEX_JOB,
    id_col: str = "doc_id",
    text_col: str = "text",
    dv_purge_rows: int = 100_000,
    sizes: MergeTable | None = None,
) -> int:
    """Fold corpus commits since the cursor into the band index;
    returns changed-doc count (0 = already current).

    Bootstrap signatures the full corpus once; every later refresh
    reads ONLY the txn log's delta files and pays O(changed), never
    O(index) or O(corpus):

    1. ``delete_keys_in(id_col, changed_ids, mode="mor")`` drops any
       stale band rows through the bloom sidecar INTO A DELETION
       VECTOR: bloom-negative files are never read, and bloom
       false-positive files (which compound across a multi-thousand
       key set — P[file positive] ≈ 1-(1-fpp)^|keys|) are scanned for
       positions but never rewritten. A refresh whose batch is all
       brand-new ids writes NOTHING. Pending DV rows are purged once
       they exceed ``dv_purge_rows`` so probe reads stay bounded.
    2. ``append(band_rows(adds))`` re-signatures the changed docs'
       AFTER-images straight from the change feed — ``read_changes``
       returns the rows of files added since the cursor, and every
       HEAD file is live, so for a keyed corpus the adds feed IS the
       current state of every changed id; the corpus snapshot is never
       scanned (the pre-r8 ``read().join(changed_ids)`` cost one
       corpus-sized scan per refresh).
    3. ``build_blooms(id_col)`` tops up the sidecar for exactly the
       files appended in (2), keeping step (1) pruned next refresh.

    ``sizes`` (optional): a (band_id, band_key, n) MergeTable of
    bucket-membership counts, maintained by the SAME delta (adds minus
    removes, one additive MERGE) — the metadata the saturation-aware
    ingest probe (:func:`incremental_near_dups_with_report`) reads to
    skip pathological buckets without ever windowing the index. The
    VERDICT-r9 cap machinery bounded the batch pipelines; this is its
    ingest-time counterpart.
    """
    head_hist = corpus.history()
    head = head_hist[0]["version"] if head_hist else 0
    cur = cursor.read_version(job)
    if cur > 0 and not corpus.snapshot_readable(cur):
        # a physical vacuum (e.g. a GDPR erase's purge) outran this
        # cursor: the change feed back to `cur` references deleted
        # files, so the delta fold would crash mid-plan — rebuild
        cur = 0
    if not index.exists() or cur == 0:
        full = band_rows(corpus.read(), id_col, text_col)
        if index.exists():
            index.replace(full)
        else:
            index.create(full)
        index.build_blooms(id_col)
        if sizes is not None:
            # the index's rows ARE the band rows — counting buckets
            # from the just-written table is a narrow 3-column parquet
            # scan, where recomputing bucket_size_rows(corpus) was a
            # SECOND full tokenize->minhash->banding pass
            full_sizes = index.read().groupBy(
                "band_id", "band_key"
            ).agg(F.count(F.lit(1)).cast("long").alias("n"))
            if sizes.exists():
                sizes.replace(full_sizes)
            else:
                sizes.create(full_sizes)
        # changed-doc count without a third corpus scan: every doc
        # emits exactly LSH_BANDS index rows, and the index write just
        # counted them via its commit observation
        n = index.last_write_rows() // LSH_BANDS
        cursor.upsert(job, head, "OK")
        return n
    if head <= cur:
        cursor.upsert(job, None, "OK")
        return 0
    from urban_mobility_data_pipeline_spark.cache import scratch_persist

    try:
        adds = scratch_persist(corpus.read_changes(cur))
        removes = scratch_persist(corpus.read_removed(cur))
        changed_ids = scratch_persist(
            adds.select(id_col)
            .unionByName(removes.select(id_col))
            .distinct()
        )
        n_changed = changed_ids.count()
        if n_changed == 0:
            cursor.upsert(job, head, "OK")
            return 0
        index.delete_keys_in(id_col, changed_ids, mode="mor")
        # one signature pass over the adds feed, staged: the append
        # and the sizes fold both consume it
        adds_bands = scratch_persist(band_rows(adds, id_col, text_col))
        if adds.limit(1).count():
            index.append(adds_bands)
            index.build_blooms(id_col)
        if index.maybe_purge_deletes(max_dv_rows=dv_purge_rows)["purged"]:
            index.build_blooms(id_col)
        if sizes is not None:
            _fold_bucket_sizes(
                sizes, adds, removes, id_col, text_col,
                adds_bands=adds_bands,
            )
        cursor.upsert(job, head, "OK")
        return n_changed
    except Exception:
        cursor.upsert(job, None, "FAIL")
        raise


def incremental_near_dups(
    new_docs: DataFrame,
    corpus: MergeTable,
    index: MergeTable,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs between an INCOMING batch and the indexed corpus
    — the dedup-at-ingest probe. Returns (new_id, corpus_id, jaccard)
    with jaccard >= threshold.

    Shape: band rows for the batch (|new| x B, small) join the
    persisted index on (band_id, band_key) — candidates are
    bucket-matches only, the corpus is never re-signatured. Jaccard
    verification shingles the batch plus ONLY the candidate corpus
    docs (a broadcast-semi-joined slice). Pairs WITHIN the new batch
    are out of scope by contract — run ``near_dup_pairs`` on the batch
    itself (|new|² bounded) and union if needed. Run the probe BEFORE
    merging the batch into the corpus, or every doc matches itself."""
    from urban_mobility_data_pipeline_spark.cache import scratch_persist

    # one tokenize/shingle pass over the batch: the band keys AND the
    # Jaccard verify both consume the staged shingles
    sh = scratch_persist(shingles_df(new_docs, id_col, text_col))
    new_bands = scratch_persist(
        band_rows(new_docs, id_col, text_col, shingles=sh)
    )
    idx = index.read()
    cands = (
        new_bands.alias("n")
        .join(
            idx.alias("i"),
            (F.col("n.band_id") == F.col("i.band_id"))
            & (F.col("n.band_key") == F.col("i.band_key"))
            & (F.col(f"n.{id_col}") != F.col(f"i.{id_col}")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"i.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )
    sh_new = sh.select(
        F.col(id_col).alias("new_id"), F.col("shingles").alias("sh_n")
    )
    corpus_cand = corpus.read().join(
        F.broadcast(cands.select(F.col("corpus_id").alias(id_col)).distinct()),
        id_col,
    )
    sh_old = shingles_df(corpus_cand, id_col, text_col).select(
        F.col(id_col).alias("corpus_id"), F.col("shingles").alias("sh_o")
    )
    return (
        F.broadcast(cands)
        .join(sh_new, "new_id")
        .join(sh_old, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.round(jaccard(F.col("sh_n"), F.col("sh_o")), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def incremental_near_dups_with_report(
    new_docs: DataFrame,
    corpus: MergeTable,
    index: MergeTable,
    sizes: MergeTable,
    bucket_cap: int,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Saturation-aware dedup-at-ingest probe (VERDICT r9 item 2: the
    cap machinery threaded through the ingest path).

    The plain probe's hazard is a pathological index bucket — a
    boilerplate band key shared by millions of corpus docs makes the
    candidate join O(|new| x max_bucket) with no warning. Capping at
    probe time by windowing the index would cost O(index) per batch;
    instead the MAINTAINED sizes table (see :func:`refresh_dedup_index`
    ``sizes=``) is consulted: the batch's band rows join the
    (band_id, band_key, n) counts — O(|new| x B) rows against a
    bucket-count table — and bands whose bucket exceeds ``bucket_cap``
    are SKIPPED, bounding candidates at O(|new| x B x cap). Probing a
    saturated bucket is mostly useless anyway (boilerplate collisions,
    not near-dups), but the skip is never silent: the second returned
    frame reports every (new_id, band_id, band_key, bucket_size)
    skipped, so an ingest job gates on it — a doc whose EVERY band
    saturated got no dedup check at all and must be re-routed (raise
    the cap, exact-hash fallback, quarantine).

    Returns ``(pairs, skipped)``: pairs as
    :func:`incremental_near_dups`, restricted to unsaturated buckets.
    """
    from urban_mobility_data_pipeline_spark.cache import scratch_persist

    # one tokenize/shingle pass over the batch: the band keys AND the
    # Jaccard verify both consume the staged shingles
    sh = scratch_persist(shingles_df(new_docs, id_col, text_col))
    new_bands = band_rows(new_docs, id_col, text_col, shingles=sh)
    gauged = scratch_persist(
        new_bands.join(
            sizes.read().withColumnRenamed("n", "bucket_size"),
            ["band_id", "band_key"],
            "left",
        ).withColumn(
            "bucket_size", F.coalesce("bucket_size", F.lit(0))
        )
    )
    skipped = gauged.filter(F.col("bucket_size") > bucket_cap).select(
        F.col(id_col).alias("new_id"), "band_id", "band_key", "bucket_size"
    )
    ok_bands = scratch_persist(
        gauged.filter(F.col("bucket_size") <= bucket_cap).select(
            id_col, "band_id", "band_key"
        )
    )
    idx = index.read()
    cands = (
        ok_bands.alias("n")
        .join(
            idx.alias("i"),
            (F.col("n.band_id") == F.col("i.band_id"))
            & (F.col("n.band_key") == F.col("i.band_key"))
            & (F.col(f"n.{id_col}") != F.col(f"i.{id_col}")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"i.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )
    sh_new = sh.select(
        F.col(id_col).alias("new_id"), F.col("shingles").alias("sh_n")
    )
    corpus_cand = corpus.read().join(
        F.broadcast(cands.select(F.col("corpus_id").alias(id_col)).distinct()),
        id_col,
    )
    sh_old = shingles_df(corpus_cand, id_col, text_col).select(
        F.col(id_col).alias("corpus_id"), F.col("shingles").alias("sh_o")
    )
    pairs = (
        F.broadcast(cands)
        .join(sh_new, "new_id")
        .join(sh_old, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.round(jaccard(F.col("sh_n"), F.col("sh_o")), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs, skipped
