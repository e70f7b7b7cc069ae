"""JDBC sources (SURVEY.md §2.1 S1-S2).

Reference: full-table JDBC scans with a post-hoc watermark filter
(``src/bronze/trips_oltp_to_bronze.py:119-127`` — Catalyst pushes the
``updated_at > ts`` predicate into the JDBC WHERE clause) and an explicit
pushdown subquery for the GDPR request feed
(``gdpr/gdpr_propagate_erasure.py:288-326``).

Tested end-to-end against embedded Derby (bundled with the Spark
distribution) in ``tests/test_jdbc_smoke.py``: scan, watermark predicate
pushdown, subquery-as-dbtable, and partitioned range reads. At scale,
prefer ``partition_column``/``num_partitions`` so the read parallelizes
across executors instead of funneling through one connection.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S1: JDBC table scan. Watermark filters applied by the caller reach
    the database as WHERE clauses (predicate pushdown is free — keep the
    filter on the returned DataFrame, reference bronze/trips:127)."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions or 8)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1_000_000)
        )
    return reader.load()


def erasure_requests_query(watermark: dt.datetime, schema: str = "mobility") -> str:
    """S2: the explicit pushdown subquery for processed erasure requests
    past the control watermark (reference ``gdpr:288-326``). Passed as
    ``dbtable`` so the database evaluates it — the slice never leaves
    the OLTP store unfiltered."""
    return (
        "(SELECT request_id, passenger_id, subject_type, subject_id, "
        "request_type, status, requested_at, processed_at "
        f"FROM {schema}.gdpr_requests "
        "WHERE request_type = 'erasure' AND status = 'processed' "
        f"AND processed_at > TIMESTAMP '{watermark:%Y-%m-%d %H:%M:%S}'"
        ") AS erasure_requests"
    )


def read_pushdown(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S2: subquery-as-dbtable scan."""
    return read_table(spark, url, query, properties)


#: JDBC URL prefixes whose Spark dialect CLAIMS limit-pushdown support
#: but whose SQL dialect does not execute the emitted clause — Spark
#: drops its own TakeOrdered, the database returns the full result,
#: and the query silently yields extra rows. Derby is the pinned case
#: (test_jdbc_limit_pushdown_hazard_on_derby); the registry exists so
#: the NEXT dialect found to lie lands here as one line plus a test,
#: not a rewrite. Prefixes are matched with str.startswith on the URL.
LIMIT_PUSHDOWN_UNSAFE_PREFIXES: tuple[str, ...] = ("jdbc:derby",)


def limit_pushdown_safe(url: str) -> bool:
    """The AUTO policy for ``register_jdbc_catalog(push_limit=None)``:
    True unless the URL matches a dialect in
    :data:`LIMIT_PUSHDOWN_UNSAFE_PREFIXES`. Only Derby is verified
    LIVE in this environment (the only embedded driver shipped with
    Spark; no H2/SQLite jar is installable here) — Postgres/MySQL/H2
    return True on the strength of their upstream dialect tests, a
    documented single-live-dialect limitation."""
    return not url.startswith(LIMIT_PUSHDOWN_UNSAFE_PREFIXES)


def register_jdbc_catalog(
    spark: SparkSession,
    name: str,
    url: str,
    driver: str,
    push_aggregates: bool = True,
    push_limit: bool | None = None,
) -> None:
    """Register a DSv2 JDBC catalog so ``spark.table(f"{name}.T")``
    scans push MORE than WHERE clauses into the database: global
    aggregates (MIN/MAX/COUNT/SUM — the watermark-discovery shape:
    ``SELECT max(updated_at)`` over a 1B-row OLTP table returns ONE
    row instead of streaming the table out) and, where the dialect
    supports it, ORDER BY+LIMIT top-N. Grouped aggregates are
    attempted and FALL BACK to a plain scan when the dialect can't
    bind Spark's generated SQL (embedded Derby can't; Postgres/MySQL
    can) — correctness never depends on aggregate pushdown, which is
    why it needs no per-dialect guard: it either binds or falls back
    (pinned by test_jdbc_v2_grouped_pushdown_falls_back_correct).

    ``push_limit`` defaults to AUTO via :func:`limit_pushdown_safe`:
    disabled for dialects in :data:`LIMIT_PUSHDOWN_UNSAFE_PREFIXES`
    because those claim limit support they don't deliver — the scan
    drops the Spark-side TakeOrdered but the database executes
    without the LIMIT, silently returning extra rows (wrong results,
    pinned by test_jdbc_limit_pushdown_hazard_on_derby)."""
    if push_limit is None:
        push_limit = limit_pushdown_safe(url)
    base = f"spark.sql.catalog.{name}"
    spark.conf.set(
        base,
        "org.apache.spark.sql.execution.datasources.v2.jdbc."
        "JDBCTableCatalog",
    )
    spark.conf.set(f"{base}.url", url)
    spark.conf.set(f"{base}.driver", driver)
    spark.conf.set(f"{base}.pushDownAggregate", str(push_aggregates).lower())
    spark.conf.set(f"{base}.pushDownLimit", str(push_limit).lower())


def probe_dialect(
    spark: SparkSession,
    url: str,
    driver: str,
    table: str,
    order_col: str,
    properties: dict[str, str] | None = None,
    catalog_prefix: str = "umdp_probe",
) -> dict:
    """FIRST-CONTACT dialect verification — the executable form of the
    checklist a user must run before trusting a NEW database behind
    this engine's JDBC surface (only embedded Derby is verifiable live
    in this build environment; Postgres/MySQL/H2 inherit their
    upstream dialect tests until this probe has run against them).

    Run it once against any small table (read access only; nothing is
    written) and act on the result:

    1. ``where_pushdown`` — a filtered scan must show ``PushedFilters``
       in the physical plan. False means every predicate streams the
       full table out of the database: check the driver jar version.
    2. ``limit_pushdown_honest`` — an ORDER BY + LIMIT k through a
       DSv2 catalog with ``pushDownLimit=true`` must return exactly
       the same rows as the pushdown-off plan. False is the Derby
       lie (the dialect claims limit support, Spark drops its own
       TakeOrdered, the database ignores the clause): add the URL
       prefix to :data:`LIMIT_PUSHDOWN_UNSAFE_PREFIXES` — one line
       plus a pin test, see test_jdbc_limit_pushdown_hazard_on_derby.
    3. ``aggregate_pushdown_consistent`` — COUNT/MIN/MAX through a
       ``pushDownAggregate=true`` catalog must equal the pushdown-off
       answers (binds-or-falls-back, never wrong).

    Returns the three booleans plus ``recommended_unsafe_prefix``
    (non-None exactly when the dialect failed the limit honesty probe
    and its prefix is not yet registered)."""
    props = dict(properties or {})
    props.setdefault("driver", driver)

    flt = read_table(spark, url, table, properties=props).filter(
        F.col(order_col).isNotNull()
    )
    plan = flt._jdf.queryExecution().executedPlan().toString()
    where_ok = "PushedFilters" in plan and "IsNotNull" in plan

    def _catalog_rows(name: str, push_limit: bool, push_aggs: bool):
        register_jdbc_catalog(
            spark, name, url, driver,
            push_aggregates=push_aggs, push_limit=push_limit,
        )
        return spark.table(f"{name}.{table}")

    on = _catalog_rows(f"{catalog_prefix}_on", True, True)
    off = _catalog_rows(f"{catalog_prefix}_off", False, False)
    k = max(1, off.count() // 2)
    # Compare only the ORDER BY column's value multiset: with duplicate
    # order_col values at the k boundary, pushdown-on and pushdown-off
    # may legitimately return different TIED rows, and a full-row
    # comparison would brand an honest dialect a liar. The order_col
    # top-k multiset is identical for every tie-break, yet still
    # catches the real lie (a dialect that drops the clause returns k
    # arbitrary rows whose order_col values differ from the true top-k).
    top_on = [
        r[0]
        for r in on.select(order_col)
        .orderBy(F.desc(order_col))
        .limit(k)
        .collect()
    ]
    top_off = [
        r[0]
        for r in off.select(order_col)
        .orderBy(F.desc(order_col))
        .limit(k)
        .collect()
    ]
    limit_ok = sorted(map(str, top_on)) == sorted(map(str, top_off))

    agg_on = on.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(order_col).alias("lo"),
        F.max(order_col).alias("hi"),
    ).first()
    agg_off = off.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(order_col).alias("lo"),
        F.max(order_col).alias("hi"),
    ).first()
    agg_ok = tuple(agg_on) == tuple(agg_off)

    recommend = None
    if not limit_ok:
        scheme = ":".join(url.split(":", 3)[:2])
        if not url.startswith(LIMIT_PUSHDOWN_UNSAFE_PREFIXES):
            recommend = scheme
    return {
        "where_pushdown": where_ok,
        "limit_pushdown_honest": limit_ok,
        "aggregate_pushdown_consistent": agg_ok,
        "recommended_unsafe_prefix": recommend,
    }
