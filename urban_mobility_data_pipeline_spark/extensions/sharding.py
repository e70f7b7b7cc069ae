"""Incremental resharding of a rendezvous-sharded MergeTable.

``functions.hashing.rendezvous_shard`` promises the property that makes
HRW sharding worth using at 100 TB: growing the ring by one moves only
the ~1/(n+1) of keys the new shard wins. This module cashes that
promise in at the STORAGE layer: a shard-partitioned MergeTable is
resharded by touching exactly the movers —

1. movers = rows whose ``rendezvous_shard(key, new_n)`` differs from
   the stored shard (when growing n -> n+1 they all land on the new
   shard, so the filter is one map-side comparison);
2. one ``delete`` (partition-pruned to the movers' OLD shards) plus one
   ``append`` into the new shard's partition.

Untouched shard partitions keep their data files byte-identical —
pinned by tests/test_sharding_cms.py — where a ``pmod(hash, n)``
reshard rewrites essentially the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.functions.hashing import (
    rendezvous_shard,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

SHARD_COL = "shard"


def create_sharded(
    table: MergeTable, df: DataFrame, key_col: str, n_shards: int
) -> None:
    """Materialize ``df`` shard-partitioned under rendezvous hashing."""
    table.create(
        df.withColumn(SHARD_COL, rendezvous_shard(key_col, n_shards)),
        partition_by=[SHARD_COL],
    )


def reshard(table: MergeTable, key_col: str, new_n: int) -> dict[str, int]:
    """Grow/shrink the shard ring to ``new_n``, moving only the keys
    whose rendezvous argmax changed. Returns {'moved': k, 'total': n}.

    The movers scan is one pass with a map-side shard recomputation —
    no shuffle, no join; the delete prunes to the movers' current
    partitions and the re-insert appends into their new ones.
    """
    snapshot = table.read()
    moved = (
        snapshot.withColumn("__new", rendezvous_shard(key_col, new_n))
        .where(F.col("__new") != F.col(SHARD_COL))
        .persist()
    )
    try:
        n_moved = moved.count()
        if n_moved:
            # DataFrame-native keyed delete (no driver IN-list): small
            # mover sets go through the pruned point-delete machinery,
            # large ones anti-join — a million-key reshard never
            # serializes ids through the driver
            table.delete_keys_in(key_col, moved.select(key_col))
            table.append(
                moved.select(
                    *[c for c in snapshot.columns if c != SHARD_COL],
                    F.col("__new").alias(SHARD_COL),
                )
            )
        total = table.read().count()
    finally:
        moved.unpersist()
    return {"moved": n_moved, "total": total}
