"""GDPR erasure across the LLM-corpus extension derivatives.

The reference's invariant is "a redaction hits every layer"
(``gdpr/gdpr_propagate_erasure.py:725+``): one subject request fans out
to every table holding a trace of that subject, with an audit row per
action. The LLM extension surface — the ``documents`` corpus and its
derived tables (MinHash signatures, LSH band keys, near-dup pairs,
dup-cluster labels, the dedup'd corpus) — sits outside the mobility
entity tables that :mod:`operators.gdpr` reaches, so erasure-by-doc_id
is its own propagation:

- **DELETE**, not anonymize: a training corpus must not retain the
  document row at all, nor any derivative keyed by it (a MinHash
  signature or SimHash fingerprint of erased text is still derived
  personal data).
- **Pair tables match on either endpoint** (``doc_a``/``doc_b``) — an
  edge touching the erased doc leaks its existence.
- **VACUUM after DELETE**: the copy-on-write log keeps prior versions
  readable (time travel); erasure is only physical once dereferenced
  files are vacuumed (same reasoning as ``run_gdpr`` on the mobility
  tables, SURVEY §2.1 build note).
- **Audit** every table touched with salted fingerprints, never raw
  ids (reference ``gdpr:177-209``).

Scale shape: the id set of an erasure batch is request-driven small
(thousands), so the DELETE predicate is an ``isin`` literal that pushes
into parquet row-group pruning; each table rewrite is file-pruned by
the MergeTable log. No corpus-wide shuffle occurs.

Representative semantics: erasure removes exactly the subject's rows.
If the erased doc was a dup-cluster *representative*, the cluster is
left unrepresented in ``dedup_corpus`` until the dedup pipeline next
recomputes (derivative tables are rebuildable artifacts, and the
surviving near-duplicates belong to other subjects — electing one
in-place here would silently resurrect content the pipeline chose to
drop, without its signatures/bands, breaking the derivation invariant).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.gdpr import AuditLog
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

#: Canonical derivative-table id columns: table name -> columns that
#: carry a doc_id (pair tables carry two).
CORPUS_ID_COLS: dict[str, tuple[str, ...]] = {
    "documents": ("doc_id",),
    "minhash_signatures": ("doc_id",),
    "lsh_band_keys": ("doc_id",),
    "near_dup_pairs": ("doc_a", "doc_b"),
    "dup_clusters": ("doc_id",),
    "dedup_corpus": ("doc_id",),
    # the incrementally maintained LSH band index (dedup-at-ingest):
    # its refresh would drop erased ids on the NEXT cycle via the
    # removed-side change feed, but a GDPR erasure must not wait for
    # a maintenance cadence — delete the B band rows now
    "dedup_index": ("doc_id",),
    # the vector side (doc ids and vec ids share the key space — the
    # cross_modal_dedup_agreement contract): a subject's embedding is
    # derived personal data like their text, and the maintained IVF
    # index holds a copy of the vector, so both delete now rather than
    # waiting for the next refresh's removed-side fold (r12, with the
    # embedding_ingest door)
    "embeddings": ("vec_id",),
    "emb_index": ("vec_id",),
}


class ModelArtifact:
    """A corpus-DERIVED model artifact outside the row-keyed tables:
    trained quantizer centroids, classifier weights + their histogram
    snapshot, a BM25 stats row — parquet dirs whose CONTENT is a
    function of (possibly erased) documents, so erasure must reach
    them even though no row carries a doc_id (VERDICT r10 item 9).

    ``paths`` lists every directory making up the artifact (e.g. the
    weights parquet AND its ``_train_hist`` snapshot). ``retrain``,
    when given, re-derives the artifact from the POST-erasure corpus
    (e.g. a closure over ``train_logistic(materialize_dir=...)`` or
    ``train_adaptive_quantizer(materialize_dir=...)``); without it the
    artifact is INVALIDATED — deleted so the next consumer retrains —
    never left silently stale. Mirrors the result cache's
    version-keyed discipline, applied to artifacts that have no
    version key of their own."""

    def __init__(
        self, *paths: str, retrain=None  # Callable[[], None] | None
    ) -> None:
        if not paths:
            raise ValueError("ModelArtifact needs at least one path")
        self.paths = tuple(paths)
        self.retrain = retrain

    def exists(self) -> bool:
        import os

        return any(
            os.path.isfile(
                os.path.join(p.removeprefix("file://"), "_SUCCESS")
            )
            or os.path.isdir(p.removeprefix("file://"))
            for p in self.paths
        )

    def invalidate(self) -> None:
        import shutil

        for p in self.paths:
            shutil.rmtree(p.removeprefix("file://"), ignore_errors=True)

    def propagate_erasure(self) -> str:
        """Refresh (retrain against the current corpus) or invalidate;
        returns the action taken for the erasure report."""
        if not self.exists():
            return "absent"
        if self.retrain is not None:
            # drop the stale bytes first so a retrain crash cannot
            # leave the pre-erasure model readable
            self.invalidate()
            self.retrain()
            return "refreshed"
        self.invalidate()
        return "invalidated"


def propagate_to_artifacts(
    artifacts: Mapping[str, ModelArtifact],
    audit: AuditLog | None = None,
    subjects=None,  # DataFrame | None
) -> dict[str, str]:
    """Erasure propagation for the model-artifact tier: every
    registered artifact is refreshed or invalidated, with an audit row
    per artifact (action recorded, fingerprinted subjects). Called by
    :func:`erase_document_ids` / :func:`erase_document_ids_df` when
    ``artifacts`` is passed; usable standalone for artifact-only
    sweeps."""
    actions: dict[str, str] = {}
    for name, art in artifacts.items():
        actions[name] = art.propagate_erasure()
        # an absent artifact is not audited — nothing happened to it
        # (same principle as deleted=0 derivative tables)
        if (
            actions[name] != "absent"
            and audit is not None
            and subjects is not None
        ):
            audit.record(
                "corpus",
                f"artifact:{name}",
                subjects,
                [f"model:{actions[name]}"],
            )
    return actions


def erase_document_ids(
    spark: SparkSession,
    doc_ids: Sequence[int],
    tables: Mapping[str, MergeTable],
    id_cols: Mapping[str, Sequence[str]] | None = None,
    audit: AuditLog | None = None,
    vacuum: bool = True,
    mode: str = "cow",
    artifacts: Mapping[str, ModelArtifact] | None = None,
) -> dict[str, int]:
    """Erase ``doc_ids`` from every corpus table: DELETE rows whose id
    column (any of them, for pair tables) matches, audit each table,
    and physically vacuum dereferenced files. Returns per-table deleted
    row counts.

    ``tables`` maps a name from :data:`CORPUS_ID_COLS` (or any name
    present in ``id_cols``) to its :class:`MergeTable`.

    ``mode="mor"`` records the deletions as DELETION VECTORS instead of
    rewriting files (``MergeTable.delete_keys_mor``): the rows vanish
    from every read IMMEDIATELY (the legal "stop processing" clock
    stops) while the physical rewrite is deferred to a scheduled
    :func:`finalize_erasure` — at 100 TB an erasure request then costs
    O(matching files scanned), not O(matching files rewritten), and
    the purge batches many requests into one rewrite pass. ``vacuum``
    is ignored under MOR (nothing is dereferenced until the purge)."""
    ids = sorted(set(int(i) for i in doc_ids))
    if not ids:
        return {}
    col_map = dict(CORPUS_ID_COLS)
    if id_cols:
        col_map.update({k: tuple(v) for k, v in id_cols.items()})
    deleted: dict[str, int] = {}
    subjects = None
    if audit is not None:
        subjects = spark.createDataFrame(
            [(i,) for i in ids], "subject_id long"
        )
    for name, table in tables.items():
        if name not in col_map:
            raise KeyError(
                f"no id columns registered for corpus table {name!r}; "
                "pass id_cols={name: [...]}"
            )
        if not table.exists():
            deleted[name] = 0
            continue
        cols = list(col_map[name])
        cond = None
        for c in cols:
            term = F.col(c).isin(ids)
            cond = term if cond is None else (cond | term)
        if mode == "mor":
            before = table.delete_keys_mor(cols, ids)["deleted_rows"]
            deleted[name] = before
            if audit is not None and subjects is not None:
                audit.record(
                    "corpus",
                    name,
                    subjects,
                    [f"{c}:row-deleted" for c in col_map[name]],
                )
            continue
        if table.has_blooms(cols):
            # bloom fast path: count over only the candidate files and
            # rewrite only those — a handful of ids against a large
            # corpus touches a handful of files, not every partition
            before = table.read_by_keys(cols, ids).count()
            if before:
                table.delete_by_keys(cols, ids)
        else:
            before = table.read().filter(cond).count()
            if before:
                table.delete(cond)
        if before and vacuum:
            table.vacuum(0.0)
        deleted[name] = before
        if audit is not None and subjects is not None:
            audit.record(
                "corpus",
                name,
                subjects,
                [f"{c}:row-deleted" for c in col_map[name]],
            )
    if artifacts:
        # after the row deletes: a retraining artifact must see the
        # post-erasure corpus
        propagate_to_artifacts(artifacts, audit=audit, subjects=subjects)
    return deleted


def finalize_erasure(
    tables: Mapping[str, MergeTable], vacuum: bool = True
) -> dict[str, dict]:
    """Make MOR erasures physical: for every table, materialize pending
    deletion vectors (``purge_deletes`` rewrites ONLY the files
    carrying DV'd rows) and vacuum the dereferenced bytes + sidecars.
    Run on a compliance schedule (e.g. daily) — one purge pass absorbs
    every ``mode="mor"`` erasure since the last run, so N requests cost
    one rewrite of the union of their touched files instead of N
    rewrites."""
    stats: dict[str, dict] = {}
    for name, table in tables.items():
        if not table.exists():
            stats[name] = {"rewritten_files": 0, "kept_files": 0}
            continue
        stats[name] = table.purge_deletes()
        if vacuum:
            table.vacuum(0.0)
    return stats


def erase_document_ids_df(
    spark: SparkSession,
    doc_ids: "DataFrame",
    tables: Mapping[str, MergeTable],
    id_cols: Mapping[str, Sequence[str]] | None = None,
    audit: AuditLog | None = None,
    vacuum: bool = True,
    artifacts: Mapping[str, ModelArtifact] | None = None,
) -> dict[str, dict]:
    """Mass-erasure twin of :func:`erase_document_ids`: the subject set
    is a **DataFrame** (a takedown manifest read straight from parquet
    — possibly millions of ids) and is never collected to the driver.
    Each table routes through :meth:`MergeTable.delete_keys_in`: a
    request-sized set collapses to the pruned point-delete (blooms /
    partition pruning), a mass set anti-joins the table against the id
    frame — the physical plan carries a join, never a literal IN-list
    (VERDICT r6 item 3). Returns per-table rewrite stats
    (``rewritten_files`` / ``kept_files``; -1 = the partition-pruned
    legacy path, which doesn't report file counts).

    Pair tables (several id columns) erase with ANY semantics, same as
    the list variant. VACUUM runs per touched table so the erasure is
    physical, and the audit rows carry salted fingerprints computed
    FROM THE FRAME — raw ids never leave the cluster.
    """
    key_col = doc_ids.columns[0]
    keys = doc_ids.select(F.col(key_col).alias("doc_id")).distinct()
    col_map = dict(CORPUS_ID_COLS)
    if id_cols:
        col_map.update({k: tuple(v) for k, v in id_cols.items()})
    stats: dict[str, dict] = {}
    for name, table in tables.items():
        if name not in col_map:
            raise KeyError(
                f"no id columns registered for corpus table {name!r}; "
                "pass id_cols={name: [...]}"
            )
        if not table.exists():
            stats[name] = {"rewritten_files": 0, "kept_files": 0}
            continue
        cols = list(col_map[name])
        stats[name] = table.delete_keys_in(cols, keys)
        if vacuum:
            table.vacuum(0.0)
        if audit is not None:
            audit.record(
                "corpus",
                name,
                keys.select(F.col("doc_id").alias("subject_id")),
                [f"{c}:row-deleted" for c in cols],
            )
    if artifacts:
        propagate_to_artifacts(
            artifacts,
            audit=audit,
            subjects=keys.select(F.col("doc_id").alias("subject_id")),
        )
    return stats
