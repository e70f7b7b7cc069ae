"""Deterministic sampling / train-test splitting for training-data
pipelines.

``df.sample()`` / ``sampleBy()`` are seed- AND partition-layout-
dependent: the same row can land in different splits after a
repartition, a scale-up, or an engine change — poison for dataset
reproducibility. The fingerprint split below hashes a stable business
key (md5 → first 16 bits → bucket 0..buckets-1), so membership is a
pure function of the key: stable across runs, partitionings, engines
(any SQL engine with md5 reproduces it), and incremental appends (new
rows join their split without reshuffling old ones).

md5 here is a uniformity fingerprint, not security. The 16-bit
truncation bounds bucket-count granularity at 65536, plenty for
percentage splits; widen the substring for finer grains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fingerprint_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket 0..buckets-1 from a key column.

    Engine-portable recipe: ``conv(substr(md5(cast(key as string)), 1,
    4), 16, 10) % buckets`` — DuckDB equivalent:
    ``CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 4)) AS INT)
    % buckets``.
    """
    c = F.col(key) if isinstance(key, str) else key
    hex16 = F.substring(F.md5(c.cast("string")), 1, 4)
    return F.conv(hex16, 16, 10).cast("long") % F.lit(int(buckets))


def train_test_split(
    df: DataFrame,
    *,
    key: str,
    test_pct: int = 20,
    split_col: str = "split",
) -> DataFrame:
    """Tag rows 'train'/'test' by key fingerprint. All rows sharing a
    key land in the same split (group-aware when ``key`` is the
    grouping entity, e.g. author id — no train/test leakage within an
    entity)."""
    b = fingerprint_bucket(key)
    return df.withColumn(
        split_col,
        F.when(b < F.lit(int(test_pct)), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def deterministic_sample(df: DataFrame, *, key: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, chosen by key fingerprint (stable across
    runs/partitionings, unlike ``df.sample``)."""
    return df.where(fingerprint_bucket(key) < F.lit(int(pct)))


def stratified_sample(
    df: DataFrame,
    *,
    key: str,
    strata_col: str,
    fractions: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~pct% of each stratum,
    chosen by key fingerprint. The corpus-balancing primitive (e.g.
    downsample an over-represented language) with the same stability
    contract as :func:`deterministic_sample` — membership is a pure
    function of (key, stratum percentages), so re-runs, appends, and
    engine swaps reproduce the exact sample. Unlike ``df.sampleBy``,
    no seed and no partition-layout sensitivity."""
    threshold = None
    for stratum, pct in fractions.items():
        cond = F.col(strata_col) == F.lit(stratum)
        threshold = (
            F.when(cond, F.lit(int(pct)))
            if threshold is None
            else threshold.when(cond, F.lit(int(pct)))
        )
    threshold = (
        threshold.otherwise(F.lit(int(default_pct)))
        if threshold is not None
        else F.lit(int(default_pct))
    )
    return df.where(fingerprint_bucket(key) < threshold)
