"""Materialized BM25 lexical index (inverted postings as a MergeTable).

``doc_bm25_topk`` (plans/llm_ops.py) recomputes corpus statistics and
the per-term document frequencies from the raw text on every query —
at 100 TB that is a full corpus re-tokenization per search. This module
is ``ivf_topk_indexed`` applied to lexical retrieval (VERDICT r6 item
6): tokenize ONCE into a persisted postings table, then a query reads
only the query terms' postings.

Layout decisions, each load-bearing at scale:

- **Postings** ``(token, doc_id, tf, dl)`` with the document length
  DENORMALIZED into every posting — a probe never joins a corpus-wide
  doc-length table; everything BM25 needs about a (term, doc) pair is
  in the row. Construct the table with ``bucket_keys=["token"]`` so
  appends cluster a term's postings into few files, and blooms on
  ``token`` let :meth:`MergeTable.read_by_keys` skip every file that
  cannot contain a query term (the lexical analogue of reading nprobe
  IVF cells). Blooms on ``doc_id`` serve the erasure path.
- **df is derived from the probed postings themselves** (rows per
  token = documents containing the term), so probe-time statistics are
  exact-by-construction and cannot drift from the batch definition.
- **Stats** ``(n_docs, total_dl)`` — one row, maintained by DELTA
  (adds minus before-images) like ``vocab.refresh_vocabulary``, so a
  refresh never rescans the corpus to recount it. ``avgdl`` is
  ``total_dl / n_docs`` at probe time.

Reference scope note: the reference has no retrieval surface at all;
this is engine capability for the LLM-corpus extension (SURVEY §2
extensions table), sharing its oracle with ``doc_bm25_topk``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.functions import text as T
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor

BM25_INDEX_JOB = "corpus_bm25_index"


def _tokenized(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, toks) for a document slice — the single tokenizer pass
    both the postings and the stats derive from. Stage this
    (``scratch_persist``) only for SMALL change-feed slices (the
    refresh path); for full-corpus builds :func:`build_bm25_index`
    deliberately shares the lazy plan WITHOUT persisting — an r13
    isolated A/B measured the staged full build ~2x slower (caching
    token arrays cost a 22s stage to save a <1s tokenizer pass)."""
    return docs.select(F.col(id_col), T.words(text_col).alias("toks"))


def bm25_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """(token, doc_id, tf, dl) for a document slice — the index's row
    format, via the SAME tokenizer as the batch BM25 query.
    ``tokenized`` accepts a pre-staged :func:`_tokenized` frame."""
    base = (
        tokenized
        if tokenized is not None
        else _tokenized(docs, id_col, text_col)
    )
    toks = base.select(
        id_col,
        F.size("toks").cast("double").alias("dl"),
        F.explode("toks").alias("token"),
    )
    return toks.groupBy("token", id_col, "dl").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )


def bm25_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """One-row (n_docs, total_dl) rollup of a document slice.
    Zero-token docs COUNT toward n_docs (they hold no postings but are
    part of the corpus), which is why stats can never be derived from
    the postings table. ``tokenized`` accepts a pre-staged
    :func:`_tokenized` frame."""
    base = (
        tokenized
        if tokenized is not None
        else _tokenized(docs, id_col, text_col)
    )
    return base.select(
        F.col(id_col), F.size("toks").cast("double").alias("dl")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )


def build_bm25_index(
    docs: DataFrame,
    postings: MergeTable,
    stats: MergeTable,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the inverted index: postings (+ blooms on token for
    probe skipping and on id for erasure) and the one-row stats.

    The two consumers share the lazy :func:`_tokenized` plan but the
    tokenizer is deliberately NOT persisted here: an r13 isolated A/B
    (sf0.1 local[32], alternated passes vs r12 code) measured the
    staged build ~2x SLOWER — materializing the token-array cache cost
    a 22s-runtime stage for 3s of CPU (MEMORY_AND_DISK serialization of
    arrays) to save one tokenizer pass that runs in <1s, and every
    downstream stage then read 32 cached partitions instead of the
    scan's natural handful. Two cheap passes beat one expensive stage.
    The incremental refresh path DOES stage its (small) adds feed,
    where the re-pass it saves is over freshly-shuffled change rows.

    Snapshot assumption: without the persist, the postings write and
    the stats rollup are two separate actions over the unpinned
    ``docs`` plan — consistent under this repo's single-writer
    harness. If concurrent corpus writers ever become possible, pin a
    snapshot version in the rebuild branch of ``refresh_bm25_index``
    (read a fixed MergeTable version for both actions) before relying
    on (n_docs, total_dl) matching the written postings."""
    toks = _tokenized(docs, id_col, text_col)
    rows = bm25_postings(docs, id_col, text_col, tokenized=toks)
    if postings.exists():
        postings.replace(rows)
    else:
        postings.create(rows)
    postings.build_blooms(["token", id_col])  # one scan, both sidecars
    st = bm25_stats(docs, id_col, text_col, tokenized=toks)
    if stats.exists():
        stats.replace(st)
    else:
        stats.create(st)


def bm25_topk_indexed(
    postings: MergeTable,
    stats: MergeTable,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k through the materialized index: the scan touches only
    files whose token bloom admits a query term (``read_by_keys``), the
    one-row stats broadcast into the scoring expression, df folds out
    of the probed rows, and the final rank is a TakeOrderedAndProject.
    Identical semantics (and oracle) to the from-scratch
    ``doc_bm25_topk`` — rounded-score ordering with an id tiebreak, so
    1-ulp ``ln`` noise can't flip the rank."""
    rows = postings.read_by_keys(["token"], list(terms))
    st = stats.read().select(
        F.col("n_docs").cast("double").alias("n_docs"),
        (F.col("total_dl") / F.col("n_docs")).alias("avgdl"),
    )
    df_ = rows.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    k1c, bc = F.lit(float(k1)), F.lit(float(b))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = idf * F.col("tf") * (k1c + F.lit(1.0)) / (
        F.col("tf")
        + k1c * (F.lit(1.0) - bc + bc * F.col("dl") / F.col("avgdl"))
    )
    return (
        rows.join(F.broadcast(df_), "token")
        .join(F.broadcast(st))
        .groupBy(id_col)
        .agg(
            F.sum(contrib).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
        )
        .select(
            id_col,
            F.round("score", 6).alias("bm25_score"),
            "n_terms_matched",
        )
        .orderBy(F.desc("bm25_score"), F.asc(id_col))
        .limit(int(k))
    )


def refresh_bm25_index(
    corpus: MergeTable,
    postings: MergeTable,
    stats: MergeTable,
    cursor: VersionCursor,
    job: str = BM25_INDEX_JOB,
    id_col: str = "doc_id",
    text_col: str = "text",
    dv_purge_rows: int = 100_000,
) -> int:
    """Fold corpus commits since the cursor into the index, O(changed)
    — the same delete+append+bloom-top-up contract as
    ``dedup_index.refresh_dedup_index``, plus a DELTA update of the
    one-row stats.

    The refresh reads ONLY the txn log's delta files — never a corpus
    snapshot (the round-7 drift: three snapshot scans per refresh made
    the cost track the corpus, +23% over a 10× growth soak, while the
    batch stayed constant):

    - **after-image = the adds feed.** ``read_changes(cur)`` returns
      the rows of files added since the cursor, and every file in HEAD
      is live — so for a keyed corpus (one live row per id, the
      contract of every MergeTable-maintained doc table) the adds feed
      IS the current state of every changed id. No ``read().join``.
    - **stats delta = stats(adds) − stats(removes).** The (n_docs,
      total_dl) rollup is LINEAR in rows, so the after-minus-before
      telescopes into the two feeds directly; rows a rewrite re-emits
      unchanged appear identically in both feeds and cancel to zero,
      and the corpus is never recounted. No time-travel snapshot scan.
    - **stale-posting delete is merge-on-read.** Postings are bucketed
      on ``token`` but deleted by ``doc_id``, so a changed doc's rows
      graze every bucket and bloom false positives compound across the
      key set — the CoW point-delete was rewriting the WHOLE postings
      table per refresh (the dominant r7 drift term). ``mode="mor"``
      records positions in a deletion vector instead (an all-new-ids
      ingest batch matches nothing and writes nothing); once pending
      DV rows exceed ``dv_purge_rows`` the refresh runs
      ``purge_deletes`` so probe reads never degrade unboundedly.
    """
    head_hist = corpus.history()
    head = head_hist[0]["version"] if head_hist else 0
    cur = cursor.read_version(job)
    if cur > 0 and not corpus.snapshot_readable(cur):
        # a physical vacuum (e.g. a GDPR erase's purge) outran this
        # cursor: time travel / the change feed back to `cur` would
        # read deleted files — fall back to the full rebuild branch
        cur = 0
    if not postings.exists() or cur == 0:
        build_bm25_index(corpus.read(), postings, stats, id_col, text_col)
        # changed-doc count without another corpus scan: the one-row
        # stats table just counted every doc during the build
        n = int(stats.read().first()["n_docs"])
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
        postings.delete_keys_in(id_col, changed_ids, mode="mor")
        # one tokenizer pass over the adds feed for both the postings
        # append and the stats delta (same staging as the build)
        toks_a = scratch_persist(_tokenized(adds, id_col, text_col))
        if adds.limit(1).count():
            postings.append(
                bm25_postings(adds, id_col, text_col, tokenized=toks_a)
            )
            postings.build_blooms(["token", id_col])
        if postings.maybe_purge_deletes(max_dv_rows=dv_purge_rows)["purged"]:
            postings.build_blooms(["token", id_col])
        a = bm25_stats(adds, id_col, text_col, tokenized=toks_a)
        r = bm25_stats(removes, id_col, text_col)
        delta = a.join(
            r.select(
                F.col("n_docs").alias("n_r"),
                F.col("total_dl").alias("dl_r"),
            )
        ).select(
            (F.col("n_docs") - F.col("n_r")).alias("d_docs"),
            (
                F.coalesce("total_dl", F.lit(0.0))
                - F.coalesce("dl_r", F.lit(0.0))
            ).alias("d_dl"),
        )
        cur_stats = stats.read().join(delta).select(
            (F.col("n_docs") + F.col("d_docs")).alias("n_docs"),
            (F.coalesce("total_dl", F.lit(0.0)) + F.col("d_dl")).alias(
                "total_dl"
            ),
        )
        stats.replace(cur_stats)
        cursor.upsert(job, head, "OK")
        return n_changed
    except Exception:
        cursor.upsert(job, None, "FAIL")
        raise
