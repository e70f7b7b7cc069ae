"""Incremental table replication over the change feed (DR / cross-
region mirroring for MergeTables).

``MergeTable.clone`` copies a snapshot; this module keeps a REPLICA
current as the source keeps committing, paying only for the rows that
changed — the lakehouse disaster-recovery / read-replica story:

1. a :class:`VersionCursor` records the last source version applied;
2. each cycle reads the keys touched since (ADDED files ∪ REMOVED
   files — without the removed side a source DELETE would never
   propagate);
3. the touched keys' LIVE rows upsert into the replica (one MERGE);
   touched keys with no live row anymore are deleted through the
   DataFrame-native ``delete_keys_in`` path (no driver IN-lists);
4. re-emitted-but-unchanged rows are upserts that rewrite their own
   values — idempotent, so file rewrites/compactions on the source
   replicate as no-ops in content terms.

The invariant — ``replica.read() == source.read()`` after every
refresh — is what the tests pin, across inserts, updates, deletes,
and compaction-induced re-emission. Same CDC contract as every feed
consumer here: source vacuum retention must exceed the replication
cadence.

Scale shape: refresh cost is O(changed keys) on both sides — the
change-feed reads prune to files added/removed since the cursor, the
MERGE prunes to the replica's touched buckets/partitions when the
replica is bucketed on the replication key, and the delete routes
through the bloom/bucket-pruned keyed-delete machinery.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor

REPLICATE_JOB = "replicate"


def replicate_table(
    src: MergeTable,
    dst: MergeTable,
    cursor: VersionCursor,
    key: str,
    *,
    job: str = REPLICATE_JOB,
) -> dict:
    """Fold all source commits since the cursor into the replica.

    Returns ``{"mode": "bootstrap"|"noop"|"delta", "upserted": n,
    "deleted": n}``. Single-column replication key (the corpus/doc
    tables' shape); composite-key tables would extend the delete leg
    the same way ``delete_keys_in`` documents.
    """
    head_hist = src.history()
    head = head_hist[0]["version"] if head_hist else 0
    cur = cursor.read_version(job)
    if cur > 0 and not src.snapshot_readable(cur):
        # a physical vacuum (e.g. a GDPR erase's purge) outran this
        # cursor: time travel / the change feed back to `cur` would
        # read deleted files — fall back to the full rebuild branch
        cur = 0
    if not dst.exists() or cur == 0:
        full = src.read()
        if dst.exists():
            dst.replace(full)
        else:
            dst.create(full)
        n = dst.read().count()
        cursor.upsert(job, head, "OK")
        return {"mode": "bootstrap", "upserted": n, "deleted": 0}
    if head <= cur:
        cursor.upsert(job, None, "OK")
        return {"mode": "noop", "upserted": 0, "deleted": 0}
    try:
        # file-level CDC over-approximates: a compaction or a pruned
        # MERGE rewrite re-emits untouched rows. Reduce to the TRUE
        # row delta before shipping: after-image rows minus identical
        # before-image rows (a rewrite's re-emissions cancel exactly)
        # name the changed KEYS, and each changed key ships its one
        # CURRENT row from the snapshot — immune to duplicate after
        # images when several commits landed between refreshes, and
        # the wire carries O(genuinely-changed rows) no matter how the
        # source's file layout churns.
        after = src.read_changes(cur)
        before = src.read_removed(cur)
        common = [c for c in after.columns if c in before.columns]
        extra = [c for c in after.columns if c not in before.columns]
        if extra:
            # source schema evolved this window: the cross-schema row
            # diff can't see a change confined to the new column, so
            # ship every touched key's current row once
            changed_keys = (
                after.select(key)
                .unionByName(before.select(key))
                .distinct()
            )
        else:
            changed_keys = (
                after.select(common)
                .exceptAll(before.select(common))
                .select(key)
                .distinct()
            )
        changed = src.read().join(changed_keys, key, "left_semi")
        non_key = [c for c in after.columns if c != key]
        # evolve_schema: a column added on the source appends to the
        # replica on the next cycle (NULL for rows not yet re-shipped)
        dst.merge(
            changed,
            keys=[key],
            update_set={c: F.col(f"s.{c}") for c in non_key},
            insert=True,
            evolve_schema=True,
        )
        upserted = changed.count()
        # keys present in the before image but gone from the source
        gone = (
            before.select(key)
            .distinct()
            .join(src.read().select(key), key, "left_anti")
        )
        deleted = 0
        if gone.limit(1).count() > 0:
            dst.delete_keys_in(key, gone)
            deleted = gone.count()
        cursor.upsert(job, head, "OK")
        return {"mode": "delta", "upserted": upserted, "deleted": deleted}
    except Exception as exc:
        cursor.upsert(job, None, f"FAIL: {exc}")
        raise


def replica_lag(src: MergeTable, cursor: VersionCursor, job: str = REPLICATE_JOB) -> int:
    """How many source commits the replica is behind (0 = current) —
    the monitoring number a DR runbook alerts on."""
    head_hist = src.history()
    head = head_hist[0]["version"] if head_hist else 0
    return max(0, head - cursor.read_version(job))
