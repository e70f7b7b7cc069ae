"""SparkSession factory.

Reference pattern: every job builds its own session with dev-tuned shuffle
settings (reference ``src/silver/trips_bronze_to_silver.py:98-111`` pins
``spark.sql.shuffle.partitions=4`` for WSL). The rebuild instead enables AQE
and lets runtime coalescing pick partition counts, which is what survives a
1000-executor / 100 TB deployment; the explicit count here is only the
*initial* value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Session defaults applied by :func:`get_spark` and (best-effort, for the
#: runtime-settable subset) by :func:`configure_session` on foreign sessions.
DEFAULT_CONF: dict[str, str] = {
    # AQE: runtime shuffle-partition coalescing, skew-join splitting, and
    # dynamic broadcast decisions — the scale story at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE size the partitions of CACHED plans too (default false).
    # Every persisted staging frame (LSH band keys, shingle tables,
    # staged graph edges) otherwise materializes at the session's
    # shuffle-partition CONSTANT and every downstream stage pays one
    # task wave per cache partition — the exact "constant tuned for
    # one deployment" the optimization guide warns about. With this on,
    # cached intermediates land at AQE's byte-sized partition targets:
    # a handful of partitions for a staged band table locally, advisory-
    # sized partitions for the same frame at cluster scale (r13: the
    # capped fuzzy-dedup row dropped 620→62 tasks / 34.5→7.8 s executor
    # CPU, PageRank 525→35 tasks / 52.6→4.5 s, identical results).
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # Deterministic timestamp rendering regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas interchange (extensions use pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Reasonable local default; AQE coalesces down, big clusters raise it.
    "spark.sql.shuffle.partitions": "32",
    # Write timestamps as INT64 TIMESTAMP(MICROS), not deprecated INT96:
    # INT96 columns carry NO min/max statistics, which kills both parquet
    # predicate pushdown on timestamps and the MergeTable zone maps
    # (analyze/read_between/delete_older_than read footer stats).
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # InferFiltersFromGenerate synthesizes size(e)>0 filters from explode()
    # and predicate pushdown then re-inlines the full generator expression
    # into a per-row Filter below the staging projections — for expensive
    # array builders (shingling, tokenization) that doubles-to-quadruples
    # the work. The filter only skips empty arrays, which explode drops
    # anyway.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


#: Confs that change RESULTS, not just speed. Re-pinned on EVERY
#: :func:`configure_session` call (the memoized fast path included):
#: the driver contract actively poisons the session between queries
#: (the hostile-TZ probe), and a stale value silently shifts every
#: epoch/date derivation (timeZone) or strips min/max stats from
#: every timestamp a mid-query MergeTable write produces
#: (outputTimestampType → INT96 kills the zone-map/retention reads).
#: The perf-only flags (AQE, cached-plan partitioning, excluded
#: rules) stay memoized — a poisoned perf flag costs speed, not
#: correctness.
_SEMANTIC_KEYS = (
    "spark.sql.session.timeZone",
    "spark.sql.parquet.outputTimestampType",
)


def _pin_semantics(spark: SparkSession) -> None:
    """Re-apply the semantics-bearing confs, loudly.

    Unlike the perf flags, a failed set here may NOT be swallowed
    (ADVICE r13): a session silently keeping a poisoned timezone
    drifts every derived epoch with zero signal. A build where the
    key is immutable is tolerated only when the immutable value
    already equals the default — otherwise raise."""
    for key in _SEMANTIC_KEYS:
        want = DEFAULT_CONF[key]
        try:
            spark.conf.set(key, want)
        except Exception:
            if spark.conf.get(key, None) != want:
                raise


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an existing session.

    The verification driver hands us its own ``SparkSession``; session
    timezone and AQE flags are runtime-configurable, so we normalize them
    here instead of requiring our own builder.

    Idempotent per session instance: ``_helpers.table`` calls this on
    every table load (hundreds of times across a catalog run), so the
    perf-flag round-trips are paid once and memoized on the session
    object — while every SEMANTICS-bearing conf (:data:`_SEMANTIC_KEYS`)
    is re-pinned on every call, because the driver contract actively
    poisons the session between queries and a stale semantic conf
    silently changes results; ~1 py4j round trip per key buys that
    correctness back.
    """
    if getattr(spark, "_umdp_configured", False):
        _pin_semantics(spark)
        return spark
    for key in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "spark.sql.optimizer.excludedRules",
    ):
        try:
            spark.conf.set(key, DEFAULT_CONF[key])
        except Exception:
            pass  # immutable on some builds — a perf flag, harmless
    _pin_semantics(spark)
    try:
        spark._umdp_configured = True
    except Exception:
        pass  # a session proxy that rejects attributes just re-runs
    return spark


def get_spark(
    app_name: str = "umdp-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return configure_session(builder.getOrCreate())
