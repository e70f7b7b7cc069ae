"""General OLAP capability queries (beyond the reference's §2 surface —
the engine-completeness layer: multi-join stars, anti-joins, grouping
sets, percentiles, pivots, analytic windows, set operations).

The reference never needs these (SURVEY.md §2.7-2.8 record their
absence); a user switching engines will. Every query ships with a DuckDB
oracle like the parity set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.plans._helpers import (
    date_str,
    event_time,
    table,
)

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# multi-join star (TPC-H Q5 shape)
# ---------------------------------------------------------------------------
@register(
    "revenue_by_region",
    oracle="""
    SELECT r.r_name AS region,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems,
           count(DISTINCT c.c_custkey) AS n_customers
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact → dim-chain star join. Dims (customer/nation/region) are
    broadcast so the only shuffle is lineitem⋈orders on the orderkey and
    the final agg; at 100 TB that's one co-partitionable join + one
    reduced agg."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = F.broadcast(
        table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    )
    region = F.broadcast(table(spark, sf_dir, "region"))
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    return joined.groupBy(F.col("r_name").alias("region")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
        F.countDistinct("c_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# anti-join
# ---------------------------------------------------------------------------
@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join — the explicit Catalyst form of the reference's
    when(isNull)-after-LEFT-join pattern (SURVEY §2.3 note)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# ROLLUP grouping sets
# ---------------------------------------------------------------------------
@register(
    "order_rollup_totals",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER)
                                            AS grouping_level,
           count(*)                         AS n_orders,
           round(sum(o_totalprice), 2)      AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def order_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status×priority → grand total)
    with grouping_id disambiguation — one pass, Spark expands to
    grouping sets in the same hash aggregate."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("grouping_level"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "grouping_level",
            "n_orders",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# exact percentiles
# ---------------------------------------------------------------------------
@register(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderstatus AS status,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). The approx path for 100 TB is
    ``approx_percentile`` — see approx_distinct_users for the sketch
    variant policy."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


# ---------------------------------------------------------------------------
# pivot
# ---------------------------------------------------------------------------
_STATUSES = ["F", "O", "P"]


@register(
    "priority_status_pivot",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           {", ".join(
               "CAST(sum(CASE WHEN o_orderstatus = '" + s + "' THEN 1 ELSE 0 END)"
               " AS BIGINT) AS status_" + s for s in _STATUSES)}
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: status values become columns. Pinned pivot values keep the
    plan single-pass (unpinned pivot triggers a distinct-value pre-scan)."""
    orders = table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "priority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"status_{s}")
            for s in _STATUSES
        ],
    )


# ---------------------------------------------------------------------------
# analytic windows: running sum, rank, ntile, lag delta
# ---------------------------------------------------------------------------
@register(
    "customer_order_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend,
           CAST(rank() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
               AS INTEGER) AS spend_rank,
           CAST(ntile(4) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
               AS INTEGER) AS spend_quartile,
           round(o_totalprice - lag(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
               AS delta_vs_prev
    FROM orders
    """,
)
def customer_order_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame windows (running aggregate, rank, ntile, lag) —
    absent from the reference (SURVEY §2.6 'that's the whole window
    surface'); one shuffle on the partition key serves all four."""
    orders = table(spark, sf_dir, "orders")
    by_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_spend = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                by_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_spend"),
        F.rank().over(by_spend).cast("int").alias("spend_rank"),
        F.ntile(4).over(by_spend).cast("int").alias("spend_quartile"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(by_time), 2
        ).alias("delta_vs_prev"),
    )


# ---------------------------------------------------------------------------
# set operations: INTERSECT / EXCEPT
# ---------------------------------------------------------------------------
@register(
    "nation_customer_supplier_overlap",
    oracle="""
    SELECT n_nationkey FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    INTERSECT
    SELECT n_nationkey FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def nation_customer_supplier_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (absent from the reference, SURVEY §2.8) — nations with
    both customers and suppliers."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    a = cust.join(nation, cust["c_nationkey"] == nation["n_nationkey"]).select(
        "n_nationkey"
    )
    b = supp.join(nation, supp["s_nationkey"] == nation["n_nationkey"]).select(
        "n_nationkey"
    )
    return a.intersect(b)


@register(
    "customer_only_nations",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference) — nations with customers but no suppliers."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.distinct().subtract(supp.distinct())


# ---------------------------------------------------------------------------
# sliding windows (batch twin of streaming.sliding_agg)
# ---------------------------------------------------------------------------
@register(
    "sliding_event_windows",
    oracle="""
    WITH placed AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
               value
        FROM events
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM placed
    GROUP BY 1
    """,
)
def sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h window / 30m slide): every event lands in two
    windows. Batch twin of streaming.windows.sliding_agg."""
    from urban_mobility_data_pipeline_spark.plans._helpers import event_time

    ev = table(spark, sf_dir, "events")
    win = F.window(event_time(), "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            date_str(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# approximate distinct (sketch) — rows-only: HLL internals differ by engine
# ---------------------------------------------------------------------------
@register("approx_distinct_users", oracle=None)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the 100 TB path for distinct cardinalities (SURVEY §2.5 notes the
    reference is exact-only). No SQL oracle: sketch estimates are
    engine-specific by construction; the driver's rows-only check plus
    the relative-error assertion in tests/test_analytics.py cover it."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


# ---------------------------------------------------------------------------
# parts catalog: LIKE patterns + in-list pruning (TPC-H Q16 vibes)
# ---------------------------------------------------------------------------
@register(
    "parts_by_brand_type",
    oracle="""
    SELECT p_brand,
           CAST(sum(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_brass,
           CAST(sum(CASE WHEN p_size IN (1, 5, 9, 14, 23) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_select_sizes,
           round(avg(p_retailprice), 4) AS avg_price,
           count(*) AS n_parts
    FROM part
    WHERE p_name NOT LIKE 'forest%'
    GROUP BY p_brand
    """,
)
def parts_by_brand_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE / IN-list predicates over the parts catalog —
    pattern predicates push down as StringContains/StartsWith filters."""
    p = table(spark, sf_dir, "part")
    return (
        p.filter(~F.col("p_name").like("forest%"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0))
            .cast("long")
            .alias("n_brass"),
            F.sum(F.when(F.col("p_size").isin(1, 5, 9, 14, 23), 1).otherwise(0))
            .cast("long")
            .alias("n_select_sizes"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )


# ---------------------------------------------------------------------------
# supplier rollup joined through nation (completes table coverage)
# ---------------------------------------------------------------------------
@register(
    "supplier_nation_summary",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_suppliers,
           round(sum(s.s_acctbal), 2) AS total_acctbal,
           round(max(s.s_acctbal), 2) AS max_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def supplier_nation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier→nation broadcast join + rollup."""
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
            F.round(F.max("s_acctbal"), 2).alias("max_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# as-of join (operators/temporal.py) — Spark has no built-in; DuckDB's
# ASOF JOIN semantics expressed as a rank-1 window for the oracle
# ---------------------------------------------------------------------------
@register(
    "events_asof_prior_purchase",
    oracle="""
    WITH l AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        FROM events WHERE event_type = 'error'
    ),
    r0 AS (
        SELECT user_id, epoch_us(ts) AS ts_us, value,
               row_number() OVER (
                   PARTITION BY user_id, epoch_us(ts)
                   ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ),
    r AS (SELECT user_id, ts_us, value FROM r0 WHERE rn = 1),
    m AS (
        SELECT l.event_id, l.user_id, l.ts_us, l.value,
               r.ts_us AS purchase_ts_us, r.value AS purchase_value,
               row_number() OVER (
                   PARTITION BY l.event_id ORDER BY r.ts_us DESC) AS rn
        FROM l LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts_us <= l.ts_us
    )
    SELECT event_id, user_id, ts_us, value, purchase_ts_us, purchase_value
    FROM m WHERE rn = 1
    """,
)
def events_asof_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event, the same user's most recent prior purchase
    (backward as-of, exact match allowed). One shuffle on user_id via
    union-sort-carry — no join amplification."""
    from urban_mobility_data_pipeline_spark.operators.temporal import asof_join

    ev = table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us", "value"
    )
    dedup = Window.partitionBy("user_id", "ts_us").orderBy(
        F.col("event_id").desc()
    )
    pur = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", "ts_us", "value", "event_id")
        .withColumn("rn", F.row_number().over(dedup))
        .where(F.col("rn") == 1)
        .select("user_id", "ts_us", "value")
    )
    return asof_join(
        err,
        pur,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        payload={"ts_us": "purchase_ts_us", "value": "purchase_value"},
    )


# ---------------------------------------------------------------------------
# bucketed range join (operators/temporal.py) — inequality-only join
# without the BroadcastNestedLoopJoin cross product
# ---------------------------------------------------------------------------
@register(
    "events_range_join_error_counts",
    oracle="""
    WITH l AS (
        SELECT event_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'signup'
    ),
    r AS (
        SELECT epoch_us(ts) AS err_ts_us
        FROM events WHERE event_type = 'error'
    )
    SELECT l.event_id, l.ts_us,
           CAST(count(r.err_ts_us) AS BIGINT) AS n_errors
    FROM l LEFT JOIN r
      ON r.err_ts_us >= l.ts_us AND r.err_ts_us < l.ts_us + 3600000000
    GROUP BY l.event_id, l.ts_us
    """,
)
def events_range_join_error_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors (any user) within 1h after each signup: bucketed range
    join (hash join on the time bucket) + count, zero-count signups kept
    via a left join back onto the signup set."""
    from urban_mobility_data_pipeline_spark.operators.temporal import range_join

    hour_us = 3600 * 1_000_000
    ev = table(spark, sf_dir, "events")
    sign = ev.where(F.col("event_type") == "signup").select("event_id", "ts_us")
    err = ev.where(F.col("event_type") == "error").select(
        F.col("ts_us").alias("err_ts_us")
    )
    pairs = range_join(
        sign, err, left_ts="ts_us", right_ts="err_ts_us", window=hour_us
    )
    counts = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_err"))
    return sign.join(counts, "event_id", "left").select(
        "event_id",
        "ts_us",
        F.coalesce(F.col("n_err"), F.lit(0).cast("long")).alias("n_errors"),
    )


# ---------------------------------------------------------------------------
# rollup cascade (operators/rollup.py) — daily derived from hourly
# partials; oracle aggregates daily directly from raw (must agree)
# ---------------------------------------------------------------------------
@register(
    "daily_event_rollup_from_hourly",
    oracle="""
    SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS bucket,
           event_type,
           CAST(count(value) AS BIGINT) AS n_value,
           round(sum(value), 2) AS total_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           round(round(sum(value), 2) / count(value), 2) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def daily_event_rollup_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade: raw -> hourly partial states ->
    daily (re-aggregating partials, no raw rescan) -> finalize. The
    oracle computes daily straight from raw; equality proves the
    algebraic decomposition."""
    from urban_mobility_data_pipeline_spark.operators.rollup import (
        cascade,
        finalize,
        partial_rollup,
    )

    hour_us = 3600 * 1_000_000
    day_us = 24 * hour_us
    ev = table(spark, sf_dir, "events")
    hourly = partial_rollup(
        ev, ts="ts_us", grain=hour_us, keys=["event_type"], measures=["value"]
    )
    daily = cascade(
        hourly, grain=day_us, keys=["event_type"], measures=["value"]
    )
    return finalize(daily, keys=["event_type"], measures=["value"])


# ---------------------------------------------------------------------------
# deterministic train/test split (extensions/sampling.py) — md5
# fingerprint, reproducible in any engine
# ---------------------------------------------------------------------------
@register(
    "documents_train_test_split",
    oracle="""
    WITH tagged AS (
        SELECT lang, n_chars,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                          AS INT) % 100 < 20
                    THEN 'test' ELSE 'train' END AS split
        FROM documents
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM tagged
    GROUP BY split, lang
    """,
)
def documents_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents 80/20 by doc_id fingerprint and profile the
    splits. Membership is a pure function of doc_id — stable across
    runs, partitionings, and engines (the oracle reproduces the same
    split in DuckDB)."""
    from urban_mobility_data_pipeline_spark.extensions.sampling import (
        train_test_split,
    )

    docs = table(spark, sf_dir, "documents")
    return (
        train_test_split(docs, key="doc_id", test_pct=20)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# interval join batch twin (streaming/joins.py) — same function drives
# the stream-stream join; the oracle pins its semantics
# ---------------------------------------------------------------------------
@register(
    "events_interval_join_purchases",
    oracle="""
    WITH l AS (
        SELECT event_id AS signup_id, user_id, epoch_us(ts) AS signup_us
        FROM events WHERE event_type = 'signup'
    ),
    r AS (
        SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT l.signup_id, l.user_id, l.signup_us, r.purchase_id, r.purchase_us
    FROM l JOIN r
      ON l.user_id = r.user_id
     AND r.purchase_us >= l.signup_us
     AND r.purchase_us <= l.signup_us + 7200000000
    """,
)
def events_interval_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 2h of a signup by the same user — the batch twin
    of streaming/joins.py interval_join (identical code path; watermarks
    are no-ops in batch)."""
    from urban_mobility_data_pipeline_spark.streaming.joins import interval_join

    ev = table(spark, sf_dir, "events")
    sign = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.timestamp_micros(F.col("ts_us")).alias("signup_ts"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.timestamp_micros(F.col("ts_us")).alias("purchase_ts"),
    )
    return interval_join(
        sign,
        pur,
        on=["user_id"],
        left_ts="signup_ts",
        right_ts="purchase_ts",
        lower="0 seconds",
        upper="2 hours",
    ).select(
        "signup_id",
        "user_id",
        F.unix_micros(F.col("signup_ts")).alias("signup_us"),
        "purchase_id",
        F.unix_micros(F.col("purchase_ts")).alias("purchase_us"),
    )


@register("daily_distinct_users_sketch")  # no oracle: Datasketches HLL
def daily_distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users by unioning hourly HLL sketch states
    (operators/rollup.py sketch cascade) — count-distinct made
    cascade-safe; accuracy pinned by test_rollup_sampling.py against
    the exact count (<5% rel err)."""
    from urban_mobility_data_pipeline_spark.operators.rollup import (
        sketch_cascade,
        sketch_estimate,
        sketch_rollup,
    )

    hour_us = 3600 * 1_000_000
    ev = table(spark, sf_dir, "events")
    hourly = sketch_rollup(
        ev, ts="ts_us", grain=hour_us, keys=[], distinct_cols=["user_id"]
    )
    daily = sketch_cascade(
        hourly, grain=24 * hour_us, keys=[], distinct_cols=["user_id"]
    )
    return sketch_estimate(daily, distinct_cols=["user_id"])


# ---------------------------------------------------------------------------
# stratified (corpus-balancing) sample — per-stratum deterministic pct
# ---------------------------------------------------------------------------
@register(
    "documents_stratified_sample",
    oracle="""
    WITH kept AS (
        SELECT lang, n_chars
        FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                   AS INT) % 100
              < CASE lang WHEN 'en' THEN 25 ELSE 75 END
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM kept
    GROUP BY lang
    """,
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus balancing: downsample over-represented English to 25%,
    keep other languages at 75%, membership decided per doc_id
    fingerprint — deterministic across runs/partitionings/engines
    (unlike ``sampleBy``), append-stable, and leakage-free when the key
    is the grouping entity."""
    from urban_mobility_data_pipeline_spark.extensions.sampling import (
        stratified_sample,
    )

    docs = table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs,
        key="doc_id",
        strata_col="lang",
        fractions={"en": 25},
        default_pct=75,
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# CUBE: every grouping combination in one pass
# ---------------------------------------------------------------------------
@register(
    "order_priority_status_cube",
    oracle="""
    SELECT coalesce(o_orderpriority, '(all)') AS priority,
           coalesce(o_orderstatus, '(all)')   AS status,
           CAST(count(*) AS BIGINT)           AS n_orders,
           round(sum(o_totalprice), 2)        AS total_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def order_priority_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all four grouping combinations —
    detail, two marginals, grand total — in ONE shuffle via Spark's
    Expand node (`df.cube`), where naive SQL unions four scans. The
    NULL grouping markers are folded to '(all)' so both engines label
    subtotal rows identically."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias(
                "priority"
            ),
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias(
                "status"
            ),
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# RANGE window frame: rolling time window without a self-join
# ---------------------------------------------------------------------------
@register(
    "events_rolling_hour_counts",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events)
    SELECT user_id, ts_us,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour
    FROM ev
    """,
)
def events_rolling_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour event count via a RANGE window frame on
    epoch-micros — one shuffle on user_id and a single sorted pass,
    where the equivalent self-join (e ⋈ e ON ts BETWEEN ...) pays
    O(rows × window_width) pairs. The frame bound is in the column's
    own units (microseconds), so both engines share exact semantics."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id", "ts_us", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


# ---------------------------------------------------------------------------
# shipping priority (TPC-H Q3 shape: selective join + top-k by measure)
# ---------------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate  > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (the reference's analytics layer has no top-k
    revenue query; this is the classic missing one): selective segment
    and date predicates — all pushed to the scans — a customer
    semi-join-able filter, the lineitem⋈orders key join, and a global
    top-10 that plans as TakeOrderedAndProject (per-partition heaps +
    driver merge), never a full sort. Deterministic ordering via the
    orderkey tiebreak."""
    cust = F.broadcast(
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = li.join(
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"]),
        li["l_orderkey"] == orders["o_orderkey"],
    )
    return (
        joined.groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("string").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# local supplier volume (TPC-H Q5 shape: cyclic 6-way join)
# ---------------------------------------------------------------------------
@register(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the CYCLIC join — supplier must match the
    lineitem's suppkey AND sit in the customer's nation, closing a loop
    through four tables. The loop edge (c_nationkey = s_nationkey) rides
    the broadcast supplier join as a second equi-condition, so the big
    side still shuffles only once, on the orderkey chain."""
    cust = F.broadcast(
        table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    supp = F.broadcast(
        table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(nation, supp["s_nationkey"] == nation["n_nationkey"])
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# retention cohorts (first-seen day x weeks-since)
# ---------------------------------------------------------------------------
@register(
    "user_retention_cohorts",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    cohort AS (SELECT user_id, min(d) AS c FROM days GROUP BY user_id)
    SELECT strftime(cohort.c, '%Y-%m-%d') AS cohort_date,
           CAST((days.d - cohort.c) // 7 AS INTEGER) AS week_offset,
           count(DISTINCT days.user_id) AS n_users
    FROM days JOIN cohort ON days.user_id = cohort.user_id
    GROUP BY 1, 2
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day, counted
    per week-offset of later activity — the activation/retention table
    behind every growth dashboard. (user, day) pairs are distinct'd
    first (the corpus-scale reduction: raw events collapse map-side to
    at most users × days rows); the per-user cohort min re-keys that
    small frame to user_id, and the join back broadcasts when the
    cohort table fits (AQE) or sort-merges on the shared user_id key
    otherwise — either way only reduced frames move, never raw
    events."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(event_time()).alias("d")
    ).distinct()
    cohort = days.groupBy("user_id").agg(F.min("d").alias("c"))
    joined = days.join(cohort, "user_id")
    return joined.groupBy(
        date_str(F.col("c"), "yyyy-MM-dd").alias("cohort_date"),
        F.floor(F.datediff(F.col("d"), F.col("c")) / 7)
        .cast("int")
        .alias("week_offset"),
    ).agg(F.countDistinct("user_id").alias("n_users"))


# ---------------------------------------------------------------------------
# ordered conversion funnel (signup → view → purchase)
# ---------------------------------------------------------------------------
@register(
    "events_conversion_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t1
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'view' AND epoch_us(e.ts) > s.t0
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.t1
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s) AS n_signed_up,
           (SELECT count(*) FROM v) AS n_viewed_after,
           (SELECT count(*) FROM p) AS n_purchased_after,
           round((SELECT count(*) FROM v)
                 / CAST(greatest((SELECT count(*) FROM s), 1) AS DOUBLE), 6)
               AS view_rate,
           round((SELECT count(*) FROM p)
                 / CAST(greatest((SELECT count(*) FROM v), 1) AS DOUBLE), 6)
               AS purchase_rate
    """,
)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: first signup, first view
    AFTER that signup, first purchase AFTER that view — the exact
    (not min-time-approximate) funnel, as three user-keyed min-aggs
    chained by co-partitioned joins. Every stage shrinks the frame
    (events → users), so the expensive table is touched once per step
    with the event_type filter pushed into each scan."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts_us") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    counts = (
        s.agg(F.count(F.lit(1)).alias("n_signed_up"))
        .join(v.agg(F.count(F.lit(1)).alias("n_viewed_after")))
        .join(p.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )
    return counts.select(
        "n_signed_up",
        "n_viewed_after",
        "n_purchased_after",
        F.round(
            F.col("n_viewed_after")
            / F.greatest(F.col("n_signed_up"), F.lit(1)).cast("double"),
            6,
        ).alias("view_rate"),
        F.round(
            F.col("n_purchased_after")
            / F.greatest(F.col("n_viewed_after"), F.lit(1)).cast("double"),
            6,
        ).alias("purchase_rate"),
    )


# ---------------------------------------------------------------------------
# event-type transition matrix (per-user sequence bigrams)
# ---------------------------------------------------------------------------
@register(
    "event_type_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
               ) AS next_type
        FROM events
    )
    SELECT event_type AS from_type,
           next_type AS to_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence transition matrix (behavioral bigrams):
    one user-partitioned lead() window pass — a single hash shuffle on
    user_id, per-partition sort, no self-join — then a tiny
    (|types|²)-group rollup that partial-aggs map-side. The event_id
    tiebreak makes simultaneous events deterministic in both engines."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    return seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# market-basket part affinity (within-order co-occurrence pairs)
# ---------------------------------------------------------------------------
BASKET_MIN_ORDERS = 2


@register(
    "part_basket_affinity",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a,
           b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {BASKET_MIN_ORDERS}
    """,
)
def part_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought together in >=
    {m} orders. The self-join key is the orderkey, so pair generation
    is O(Σ basket²) per order — baskets are bounded (TPC-H ~4 lines),
    never a corpus cross product — and the (order, part) frame is
    distinct'd first so multi-line quantities don't inflate counts.
    The same shape at 100 TB co-partitions both sides on l_orderkey:
    one shuffle, local pair expansion, map-side-combined rollup."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = a.join(b, "ok").filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= BASKET_MIN_ORDERS)
    )


part_basket_affinity.__doc__ = part_basket_affinity.__doc__.format(
    m=BASKET_MIN_ORDERS
)


# ---------------------------------------------------------------------------
# error-burst detection (windowed error-rate threshold)
# ---------------------------------------------------------------------------
@register(
    "events_error_bursts",
    oracle="""
    WITH buckets AS (
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               count(*) AS n_events,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors
        FROM events GROUP BY 1
    )
    SELECT window_start, n_events, n_errors,
           round(n_errors / CAST(n_events AS DOUBLE), 6) AS error_rate
    FROM buckets
    WHERE n_errors / CAST(n_events AS DOUBLE) > 0.25
    """,
)
def events_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational burst detection: hourly buckets whose error fraction
    exceeds 25% — the alerting query an on-call pages on. One
    bucket-keyed aggregation with conditional counts (partial agg
    map-side); the rate filter runs post-agg on the tiny bucket
    frame."""
    ev = table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        date_str(
            F.date_trunc("hour", event_time()), "yyyy-MM-dd HH:mm:ss"
        ).alias("window_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_errors"),
    )
    return buckets.select(
        "window_start",
        "n_events",
        "n_errors",
        F.round(
            F.col("n_errors") / F.col("n_events").cast("double"), 6
        ).alias("error_rate"),
    ).filter(F.col("n_errors") / F.col("n_events").cast("double") > 0.25)


# ---------------------------------------------------------------------------
# forecasting revenue change (TPC-H Q6 shape: pure predicate aggregation)
# ---------------------------------------------------------------------------
@register(
    "discount_revenue_effect",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS potential_revenue,
           count(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01'
      AND l_shipdate <  DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def discount_revenue_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate — every predicate
    (date range, discount band, quantity cap) pushes into the parquet
    scan so row groups outside the year are never read, and the global
    sum is a two-stage partial aggregate. The simplest query there is,
    and the one where pushdown matters most: at 100 TB the scan IS the
    query."""
    li = table(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("potential_revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# late-ship order counts (TPC-H Q4 shape: EXISTS semi-join per priority)
# ---------------------------------------------------------------------------
@register(
    "late_ship_priority_counts",
    oracle="""
    SELECT o.o_orderpriority AS orderpriority,
           count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY 1
    """,
)
def late_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority counts of orders with at least one
    lineitem shipped >30 days after the order date — a correlated
    EXISTS expressed as a leftsemi join, so each order contributes once
    no matter how many late lines it has (an inner join + distinct
    would shuffle the duplicates first; leftsemi short-circuits at the
    first match). The date condition rides the join, keyed on
    l_orderkey."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.date_add(orders["o_orderdate"], 30)),
        "leftsemi",
    )
    return late.groupBy(
        F.col("o_orderpriority").alias("orderpriority")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


# ---------------------------------------------------------------------------
# large-volume orders (TPC-H Q18 shape: aggregate-HAVING, join back)
# ---------------------------------------------------------------------------
LARGE_ORDER_QTY = 250


@register(
    "large_volume_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {LARGE_ORDER_QTY}
    )
    SELECT c.c_custkey AS custkey,
           c.c_name AS custname,
           o.o_orderkey AS orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           round(big.sum_qty, 2) AS sum_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: find whale orders by aggregate threshold
    (sum quantity > {qty}), then join back for customer context. The
    HAVING filter runs on the aggregated frame — a tiny fraction of
    orders survives, so the joins move only the whales: orders joins on
    the shared orderkey partitioning and the customer dim is broadcast."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > LARGE_ORDER_QTY)
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = F.broadcast(
        table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("custname"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("string").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


large_volume_orders.__doc__ = large_volume_orders.__doc__.format(
    qty=LARGE_ORDER_QTY
)


# ---------------------------------------------------------------------------
# customer order-count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------
@register(
    "customer_order_count_distribution",
    oracle="""
    WITH per AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1
    )
    SELECT n_orders, count(*) AS n_customers
    FROM per GROUP BY 1
    """,
)
def customer_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer including the
    zero bucket. Orders pre-aggregate to (custkey, count) BEFORE the
    customer join — the join then moves one row per customer instead of
    one per order, and the left join materializes count=0 for
    order-less customers (an inner join would silently drop them). The
    second groupBy collapses to at most max(n_orders) rows, trivially
    map-side combined."""
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    dist = (
        cust.join(per_cust, cust["c_custkey"] == per_cust["o_custkey"], "left")
        .select(F.coalesce("cnt", F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return dist


# ---------------------------------------------------------------------------
# small-quantity part revenue (TPC-H Q17 shape: correlated avg per group)
# ---------------------------------------------------------------------------
@register(
    "small_quantity_part_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice) / 7.0, 2) AS avg_weekly_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa   ON pa.l_partkey  = l.l_partkey
    WHERE p.p_brand = 'Brand#12' AND l.l_quantity < pa.half_avg_qty
    """,
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — lines
    whose quantity is below half the part's own average. The correlated
    scalar subquery (avg per part) is decorrelated by hand into a
    (partkey, half_avg) aggregate joined back on the partkey, so both
    sides shuffle on l_partkey once; the brand predicate rides the
    broadcast part dim and prunes before the per-part join. avg() over
    integral quantities is exact in doubles, so the strict < threshold
    is fold-order stable."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    per_part = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(per_part.withColumnRenamed("l_partkey", "pk"),
              F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias(
            "avg_weekly_revenue"
        ),
    )


# ---------------------------------------------------------------------------
# top supplier by revenue (TPC-H Q15 shape: argmax vs scalar subquery)
# ---------------------------------------------------------------------------
Q15_SHIP_LO, Q15_SHIP_HI = "1997-01-01", "1997-07-01"


@register(
    "top_revenue_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q15_SHIP_LO}'
          AND l_shipdate <  TIMESTAMP '{Q15_SHIP_HI}'
        GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS suppname, r.total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose half-year revenue equals
    the maximum — argmax via a scalar subquery, kept as a window max
    over the aggregated frame (|suppliers| rows, one partition is fine
    AFTER aggregation; the raw lineitem never sees the window). Ties
    all surface, as in Q15. Revenue is rounded before the equality so
    both engines compare the same 2-dp value."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_SHIP_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_SHIP_HI).cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("total_rev")
    )
    w = Window.partitionBy()
    top = rev.withColumn("mx", F.max("total_rev").over(w)).filter(
        F.col("total_rev") == F.col("mx")
    )
    supp = F.broadcast(
        table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return top.join(supp, top["l_suppkey"] == supp["s_suppkey"]).select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("suppname"),
        "total_rev",
    )


# ---------------------------------------------------------------------------
# idle rich customers (TPC-H Q22 shape: anti-join + global scalar threshold)
# ---------------------------------------------------------------------------
Q22_DORMANT_SINCE = "2000-07-01"


@register(
    "idle_rich_customers_by_nation",
    oracle=f"""
    WITH avg_pos AS (
        SELECT avg(c_acctbal) AS thresh FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c, avg_pos
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > avg_pos.thresh
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '{Q22_DORMANT_SINCE}'
      )
    GROUP BY 1
    """,
)
def idle_rich_customers_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with NO recent
    order (dormant since a cutoff), rolled up by nation. The global
    threshold is a 1-row broadcast scalar (never a single-partition
    window over the fact); the NOT EXISTS is a left_anti join against
    the distinct RECENT order custkeys — the date predicate pushes into
    the orders scan before the distinct, so the anti build side is the
    small recent slice. The nation dim is broadcast. Three shuffles
    total — the scalar agg, the distinct, and the anti join — each
    carrying only keys."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thresh = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0.0).agg(
            F.avg("c_acctbal").alias("thresh")
        )
    )
    order_keys = (
        table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit(Q22_DORMANT_SINCE).cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
    )
    idle = (
        cust.join(thresh)
        .filter(F.col("c_acctbal") > F.col("thresh"))
        .join(order_keys, cust["c_custkey"] == order_keys["o_custkey"],
              "left_anti")
    )
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        idle.join(nation, idle["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# promo revenue share (TPC-H Q14 shape: conditional-sum ratio scalar)
# ---------------------------------------------------------------------------
Q14_SHIP_LO, Q14_SHIP_HI = "1997-09-01", "1997-10-01"


@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount)
                       ELSE 0.0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 3)
               AS promo_share_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q14_SHIP_LO}'
      AND l.l_shipdate <  TIMESTAMP '{Q14_SHIP_HI}'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of one month's revenue from PROMO-type
    parts — a conditional-sum / total-sum ratio collapsing to a single
    row. The month filter prunes the lineitem scan (PushedFilters on
    l_shipdate); the part dim is broadcast so the only wide exchange is
    the final 1-row agg, which is computed map-side partial per
    partition first."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q14_SHIP_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_SHIP_HI).cast("timestamp"))
    )
    part = F.broadcast(
        table(spark, sf_dir, "part").select("p_partkey", "p_type")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 3).alias(
                "promo_share_pct"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# disjunctive brand/quantity bands (TPC-H Q19 shape)
# ---------------------------------------------------------------------------
@register(
    "brand_quantity_band_revenue",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)
def brand_quantity_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate mixing columns from both
    join sides. Catalyst's CNF conversion derives the common
    single-side conjuncts — p_brand IN (...) AND p_size <= 15 pushes
    into the part scan, l_quantity BETWEEN 1 AND 30 into the lineitem
    scan — so both inputs shrink BEFORE the broadcast join and the full
    disjunction only re-checks the survivors."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = F.broadcast(
        table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bands = (
        ((br == "Brand#12") & q.between(1, 11) & sz.between(1, 5))
        | ((br == "Brand#23") & q.between(10, 20) & sz.between(1, 10))
        | ((br == "Brand#34") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(bands)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# sole late supplier per multi-supplier order (TPC-H Q21 shape)
# ---------------------------------------------------------------------------
@register(
    "sole_late_supplier_orders",
    oracle="""
    WITH ls AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    ),
    all_s AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_name AS suppname, count(*) AS n_orders
    FROM ls
    JOIN supplier s ON s.s_suppkey = ls.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM all_s a
        WHERE a.l_orderkey = ls.l_orderkey AND a.l_suppkey <> ls.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM ls l2
        WHERE l2.l_orderkey = ls.l_orderkey AND l2.l_suppkey <> ls.l_suppkey
    )
    GROUP BY 1
    """,
)
def sole_late_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    multi-supplier order — a chained EXISTS (another supplier
    participated) + NOT EXISTS (no other supplier was late), expressed
    as leftsemi + leftanti self-joins on the orderkey with a suppkey
    inequality riding each join. Both sides are first collapsed to
    DISTINCT (orderkey, suppkey) pairs, so the self-joins move
    participation facts, not lineitems; all three joins share the
    orderkey partitioning and AQE plans the small late side as
    broadcast."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    late_lines = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ls = (
        late_lines.join(
            orders,
            (late_lines["l_orderkey"] == orders["o_orderkey"])
            & (late_lines["l_shipdate"]
               > F.date_add(orders["o_orderdate"], 60)),
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_s = li.distinct()
    other_participant = all_s.select(
        F.col("l_orderkey").alias("a_orderkey"),
        F.col("l_suppkey").alias("a_suppkey"),
    )
    other_late = ls.select(
        F.col("l_orderkey").alias("b_orderkey"),
        F.col("l_suppkey").alias("b_suppkey"),
    )
    sole = (
        ls.join(
            other_participant,
            (F.col("l_orderkey") == F.col("a_orderkey"))
            & (F.col("l_suppkey") != F.col("a_suppkey")),
            "leftsemi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("b_orderkey"))
            & (F.col("l_suppkey") != F.col("b_suppkey")),
            "leftanti",
        )
    )
    supp = F.broadcast(
        table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        sole.join(supp, sole["l_suppkey"] == supp["s_suppkey"])
        .groupBy(F.col("s_name").alias("suppname"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# part revenue concentration (TPC-H Q11 shape: HAVING vs global scalar)
# ---------------------------------------------------------------------------
@register(
    "part_revenue_concentration",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem GROUP BY 1
    ),
    t AS (SELECT avg(rev) AS avg_rev FROM pr)
    SELECT pr.l_partkey AS partkey, round(pr.rev, 2) AS revenue
    FROM pr, t
    WHERE pr.rev > 1.25 * t.avg_rev
    """,
)
def part_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose lifetime revenue exceeds 1.25× the
    mean per-part revenue — a groupBy HAVING compared against a global
    scalar derived from the SAME aggregate. The per-part rollup is
    computed once and reused for both the scalar (1-row broadcast) and
    the filter, so lineitem is scanned and shuffled exactly once; the
    threshold is scale-free (relative to the mean), so the query
    returns a stable fraction of parts at any SF."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev"
        )
    )
    avg_rev = F.broadcast(pr.agg(F.avg("rev").alias("avg_rev")))
    return (
        pr.join(avg_rev)
        .filter(F.col("rev") > 1.25 * F.col("avg_rev"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("rev", 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# nation-pair trade volume (TPC-H Q7 shape: one dim, two roles)
# ---------------------------------------------------------------------------
@register(
    "nation_pair_trade_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 10000) AS BIGINT)) AS BIGINT) AS volume_e4,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey  = o.o_custkey
    JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
    JOIN supplier s  ON s.s_suppkey  = l.l_suppkey
    JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    WHERE ns.n_name <> nc.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border shipping volume by
    (supplier-nation, customer-nation, year). The nation dim plays TWO
    roles — joined once through the supplier and once through the
    customer under different aliases — which is the classic self-
    referencing-dim pitfall; both copies are broadcast, as are supplier
    and (via AQE) the filtered customer projection, so the only big
    exchange is lineitem⋈orders on the orderkey. The two-year shipdate
    band prunes the lineitem scan; the inequality filter runs after
    both nations are attached. Volume is summed in exact fixed-point
    (integer ten-thousandths — price and discount are 2-dp decimals, so
    each term is integral at 1e-4): the many-group many-term double sum
    sits on round-half boundaries at sf0.01 otherwise, and integer sums
    are fold-order-proof on ANY engine."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = F.broadcast(
        table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    n_cust = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("nc_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    n_supp = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("ns_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(n_cust, cust["c_nationkey"] == F.col("nc_key"))
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(n_supp, supp["s_nationkey"] == F.col("ns_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    vol_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(
        F.sum(vol_e4).alias("volume_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# statistical aggregates (corr / stddev / median)
# ---------------------------------------------------------------------------
@register(
    "lineitem_price_statistics",
    oracle="""
    SELECT l_returnflag AS returnflag,
           count(*) AS n_lines,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(stddev_samp(l_extendedprice), 2) AS price_stddev,
           round(median(l_quantity), 1) AS median_qty,
           round(avg(l_discount), 4) AS avg_discount
    FROM lineitem
    GROUP BY 1
    """,
)
def lineitem_price_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate surface per return flag: Pearson
    correlation of quantity vs price, sample stddev, interpolated
    median, mean discount. corr/stddev are single-pass partial-
    aggregable (sum, sum-of-squares, cross-moments combine map-side);
    median needs the per-group sorted middle, which Spark computes with
    a per-group percentile sketch-free exact pass — bounded here by the
    3-flag cardinality. Both engines interpolate the even-count median
    identically (percentile_cont 0.5 semantics)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_corr"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.median("l_quantity"), 1).alias("median_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_discount"),
    )


# ---------------------------------------------------------------------------
# ordered string aggregation (listagg shape)
# ---------------------------------------------------------------------------
@register(
    "nation_mktsegment_profile",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_customers,
           count(DISTINCT c.c_mktsegment) AS n_segments,
           string_agg(DISTINCT c.c_mktsegment, ','
                      ORDER BY c.c_mktsegment) AS segments
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1
    """,
)
def nation_mktsegment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg shape): per
    nation, the sorted distinct market segments as one CSV cell.
    collect_set gathers the (bounded, low-cardinality) distinct
    segments; array_sort pins the deterministic order BEFORE
    array_join, because collect_set's arrival order is
    partition-schedule-dependent — the unsorted variant would be
    flaky under parallelism and across engines."""
    cust = table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    )
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        cust.join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
        )
    )


# ---------------------------------------------------------------------------
# returned-item revenue (TPC-H Q10 shape)
# ---------------------------------------------------------------------------
Q10_ORDER_LO, Q10_ORDER_HI = "1998-10-01", "1999-01-01"
Q10_TOP_N = 20


@register(
    "returned_item_revenue",
    oracle=f"""
    SELECT c.c_custkey AS custkey,
           c.c_name AS custname,
           n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS lost_revenue,
           count(*) AS n_lines
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q10_ORDER_LO}'
      AND o.o_orderdate <  TIMESTAMP '{Q10_ORDER_HI}'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY lost_revenue DESC, custkey
    LIMIT {Q10_TOP_N}
    """,
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the quarter's top-{n} customers by revenue on
    RETURNED items — the churn-risk report. Both selective predicates
    push into their scans (the quarter into orders, the return flag
    into lineitem) BEFORE the orderkey join, the customer/nation dims
    broadcast onto the shrunken fact, and the final top-{n} is a
    TakeOrderedAndProject over the aggregated frame with a custkey
    tiebreaker (revenue ties would otherwise make the cut
    nondeterministic)."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_ORDER_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_ORDER_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    cust = F.broadcast(
        table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_nationkey"
        )
    )
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("custname"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("lost_revenue"), F.asc("custkey"))
        .limit(Q10_TOP_N)
    )


returned_item_revenue.__doc__ = returned_item_revenue.__doc__.format(
    n=Q10_TOP_N
)


# ---------------------------------------------------------------------------
# per-group market share (TPC-H Q8 shape)
# ---------------------------------------------------------------------------
Q8_SUPP_NATION = "NATION_3"


@register(
    "nation_market_share",
    oracle=f"""
    SELECT year(l.l_shipdate) AS ship_year,
           r.r_name AS region,
           round(CAST(sum(CASE WHEN ns.n_name = '{Q8_SUPP_NATION}'
                    THEN CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                    * 10000) AS BIGINT) ELSE 0 END) AS DOUBLE)
                 / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 10000) AS BIGINT)), 6) AS mkt_share,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey  = o.o_custkey
    JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
    JOIN region r    ON r.r_regionkey  = nc.n_regionkey
    JOIN supplier s  ON s.s_suppkey  = l.l_suppkey
    JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of each (year,
    customer-region) market — a conditional-sum / total-sum RATIO PER
    GROUP (Q14's scalar ratio, grouped). Numerator and denominator are
    computed in the same aggregation pass in exact fixed-point (2-dp
    price x 2-dp discount is integral at 1e-4), so the share is a
    ratio of fold-order-proof integers and hashes identically across
    engines. Six dims hang off the lineitem⋈orders spine; all
    broadcast."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = F.broadcast(
        table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    nation = table(spark, sf_dir, "nation")
    n_cust = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("nc_key"),
            F.col("n_regionkey").alias("nc_region"),
        )
    )
    region = F.broadcast(
        table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    )
    supp = F.broadcast(
        table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    n_supp = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("ns_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    vol_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(n_cust, cust["c_nationkey"] == F.col("nc_key"))
        .join(region, F.col("nc_region") == region["r_regionkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(n_supp, supp["s_nationkey"] == F.col("ns_key"))
    )
    target = F.when(
        F.col("supp_nation") == Q8_SUPP_NATION, vol_e4
    ).otherwise(F.lit(0).cast("long"))
    return joined.groupBy(
        F.year("l_shipdate").alias("ship_year"),
        F.col("r_name").alias("region"),
    ).agg(
        F.round(
            F.sum(target).cast("double") / F.sum(vol_e4), 6
        ).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# pure-SQL interface (spark.sql over registered views)
# ---------------------------------------------------------------------------
_Q_SQL_INTERFACE = """
    SELECT o.o_orderpriority AS orderpriority,
           count(*) AS n_orders,
           round(avg(o.o_totalprice), 2) AS avg_price,
           CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_finished
    FROM {orders} o
    GROUP BY o.o_orderpriority
"""


@register(
    "sql_interface_order_priorities",
    oracle=_Q_SQL_INTERFACE.format(orders="orders"),
)
def sql_interface_order_priorities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The engine's SQL façade: the SAME SQL text the DuckDB oracle
    runs is executed by ``spark.sql`` over a registered temp view —
    proving a user can drive this engine with ANSI SQL strings, not
    just the DataFrame API, and land on the identical Catalyst plan
    (both frontends resolve to one logical plan; pushdown/pruning are
    frontend-independent). The view name is session-scoped and
    sf-suffixed so concurrent harness runs can't collide."""
    import re as _re

    view = "umdp_orders_" + _re.sub(r"[^0-9a-zA-Z]", "_", sf_dir).strip("_")
    table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(_Q_SQL_INTERFACE.format(orders=view))


# ---------------------------------------------------------------------------
# ranking-function showcase (§2.6 breadth)
# ---------------------------------------------------------------------------
@register(
    "segment_customer_rankings",
    oracle="""
    WITH ranked AS (
        SELECT c_mktsegment AS segment,
               c_custkey AS custkey,
               round(c_acctbal, 2) AS acctbal,
               dense_rank()   OVER w AS drank,
               round(percent_rank() OVER w, 6) AS prank,
               round(cume_dist()    OVER w, 6) AS cdist,
               round(first_value(c_acctbal) OVER w, 2) AS top_bal,
               round(nth_value(c_acctbal, 3) OVER
                     (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING), 2) AS third_bal
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
    )
    SELECT * FROM ranked WHERE drank <= 5
    """,
)
def segment_customer_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function surface in one query: dense_rank /
    percent_rank / cume_dist over the default running frame plus
    first_value and an explicit-full-frame nth_value, per market
    segment. Every window shares ONE (segment, acctbal desc, custkey)
    sort — Catalyst plans a single Window operator over a single
    exchange — and the custkey tiebreaker makes position-dependent
    functions (percent_rank, cume_dist, nth_value) deterministic under
    any partitioning; without it ties would hash-mismatch across
    engines."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cust = table(spark, sf_dir, "customer")
    ranked = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_custkey").alias("custkey"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(F.first_value("c_acctbal").over(w), 2).alias("top_bal"),
        F.round(F.nth_value("c_acctbal", 3).over(w_full), 2).alias(
            "third_bal"
        ),
    )
    return ranked.filter(F.col("drank") <= 5)


# ---------------------------------------------------------------------------
# unpivot / melt (§2.8 breadth — the pivot's inverse)
# ---------------------------------------------------------------------------
@register(
    "priority_status_unpivot",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority AS priority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                    AS BIGINT) AS status_p
        FROM orders GROUP BY 1
    )
    SELECT priority, 'status_f' AS status, status_f AS n_orders FROM wide
    UNION ALL
    SELECT priority, 'status_o', status_o FROM wide
    UNION ALL
    SELECT priority, 'status_p', status_p FROM wide
    """,
)
def priority_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-status count columns fold back to
    (priority, status, n) long form via ``DataFrame.unpivot`` — the
    §2.8 pivot's inverse, used to re-normalize a metrics-wide table
    for a generic consumer. The wide frame is the |priorities|-row
    AGGREGATED result, so the unpivot's 3x row expansion is on 5 rows,
    not the fact table; Catalyst plans it as a single Expand over the
    aggregate."""
    orders = table(spark, sf_dir, "orders")
    wide = orders.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("status_f"),
        F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("status_o"),
        F.sum((F.col("o_orderstatus") == "P").cast("long")).alias("status_p"),
    )
    return wide.unpivot(
        ids=["priority"],
        values=["status_f", "status_o", "status_p"],
        variableColumnName="status",
        valueColumnName="n_orders",
    )


# ---------------------------------------------------------------------------
# Pareto / cumulative revenue concentration
# ---------------------------------------------------------------------------
@register(
    "part_revenue_pareto",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT) AS rev_e4
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT l_partkey, rev_e4,
               row_number() OVER (ORDER BY rev_e4 DESC, l_partkey) AS rnk,
               CAST(sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_e4,
               CAST(sum(rev_e4) OVER () AS BIGINT) AS total_e4,
               count(*) OVER () AS n_parts
        FROM pr
    )
    SELECT ntile AS decile,
           max(round(cum_e4 / CAST(total_e4 AS DOUBLE), 6)) AS cum_share
    FROM (SELECT *, ntile(10) OVER (ORDER BY rnk) AS ntile FROM ranked)
    GROUP BY 1
    """,
)
def part_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto curve of revenue concentration: rank parts by revenue,
    take the running share of total, report the cumulative share at
    each rank decile — the 80/20 chart behind assortment decisions.
    Revenue is summed in exact fixed-point, so running sums are
    fold-order-proof integers and the shares hash identically. The
    windows run over the AGGREGATED |parts| frame (never lineitem);
    the single-partition ordered window is fine at that cardinality —
    at 100 TB you'd approximate the curve from quantile boundaries
    instead of a total order."""
    li = table(spark, sf_dir, "lineitem")
    rev_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    pr = li.groupBy("l_partkey").agg(F.sum(rev_e4).alias("rev_e4"))
    w_order = Window.orderBy(F.desc("rev_e4"), F.asc("l_partkey"))
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = pr.select(
        "l_partkey",
        "rev_e4",
        F.row_number().over(w_order).alias("rnk"),
        F.sum("rev_e4").over(w_cum).alias("cum_e4"),
        F.sum("rev_e4").over(w_all).alias("total_e4"),
    ).withColumn("decile", F.ntile(10).over(Window.orderBy("rnk")))
    return ranked.groupBy("decile").agg(
        F.max(
            F.round(F.col("cum_e4") / F.col("total_e4").cast("double"), 6)
        ).alias("cum_share")
    )


# ---------------------------------------------------------------------------
# daily event-count anomalies (z-score)
# ---------------------------------------------------------------------------
@register(
    "event_daily_anomalies",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               avg(n) AS mu,
               stddev_samp(n) AS sigma
        FROM daily GROUP BY 1
    )
    SELECT d.event_type, d.day, d.n,
           round((d.n - s.mu) / s.sigma, 4) AS zscore
    FROM daily d JOIN stats s ON s.event_type = d.event_type
    WHERE s.sigma > 0 AND abs((d.n - s.mu) / s.sigma) >= 2.0
    """,
)
def event_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: days whose event count sits ≥2σ from
    the type's mean — the monitoring query behind ingest alerting.
    Two-stage: the daily rollup collapses events map-side to
    (type, day) grain, the per-type moments aggregate the tiny daily
    frame, and the join back is broadcast (|types| rows). Everything
    after the first rollup is metadata-sized."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", date_str(event_time(), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.abs(z) >= 2.0))
        .select(
            "event_type", "day", "n", F.round(z, 4).alias("zscore")
        )
    )


# ---------------------------------------------------------------------------
# min-cost supplier per part (TPC-H Q2 shape: correlated-MIN decorrelated)
# ---------------------------------------------------------------------------
@register(
    "min_cost_part_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    best AS (SELECT partkey, min(unit_cost) AS min_cost
             FROM cost GROUP BY 1)
    SELECT round(s.s_acctbal, 2) AS acctbal,
           s.s_name              AS supplier,
           n.n_name              AS nation,
           p.p_partkey           AS partkey,
           p.p_name              AS part_name,
           round(c.unit_cost, 4) AS unit_cost
    FROM cost c
    JOIN best b     ON c.partkey = b.partkey AND c.unit_cost = b.min_cost
    JOIN part p     ON p.p_partkey = c.partkey AND p.p_type = 'ECONOMY'
    JOIN supplier s ON s.s_suppkey = c.suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
                   AND r.r_name = 'EUROPE'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey, c.suppkey
    LIMIT 100
    """,
)
def min_cost_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table in this schema, so
    supply cost is the observed min unit price per (part, supplier)
    from lineitem): for each ECONOMY part, the European supplier(s)
    offering the corpus-minimum unit cost, richest account first.

    The correlated scalar subquery TPC-H writes (``cost = (SELECT
    min...)``"') is decorrelated the way Catalyst would want it
    anyway: one (part, supplier) rollup, one per-part MIN rollup, an
    equality join back on (partkey, min_cost). min() returns an exact
    element of the double domain, so the equality join is
    deterministic cross-engine (identical IEEE division feeding an
    order-independent MIN). Part/supplier/nation/region trims are
    broadcast; the only wide exchange is the lineitem rollup keyed
    (partkey, suppkey), and the final top-100 is a
    TakeOrderedAndProject with a (partkey, suppkey) total-order
    tiebreak."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
    )
    cost = li.groupBy("partkey", "suppkey").agg(
        F.min("unit").alias("unit_cost")
    )
    # derive the per-part minimum under RENAMED keys — best is derived
    # from cost, so joining them back is a self-join and the shared
    # column lineage would be ambiguous otherwise
    best = cost.groupBy(F.col("partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_name")
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    euro_supp = (
        supp.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey", "n_name")
            ),
            supp["s_nationkey"] == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return (
        cost.join(
            best,
            (F.col("partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .drop("b_partkey")
        .join(F.broadcast(part), cost["partkey"] == part["p_partkey"])
        .join(F.broadcast(euro_supp), cost["suppkey"] == F.col("s_suppkey"))
        .orderBy(
            F.desc("s_acctbal"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
            F.asc("suppkey"),
        )
        .limit(100)
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.round("unit_cost", 4).alias("unit_cost"),
        )
    )


# ---------------------------------------------------------------------------
# product-line profit by nation and year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------
@register(
    "nation_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                              - 0.5 * p.p_retailprice * l.l_quantity
                              AS DECIMAL(18, 4))), 2) AS DOUBLE)
               AS profit,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
                   AND p.p_name LIKE '%gear%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
)
def nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: with no partsupp.ps_supplycost the
    cost side is a fixed 50% of retail price): profit on '%gear%'
    parts by supplier nation and order year.

    The part-name LIKE trim lands on the broadcast part dim BEFORE
    the fact join, so only matching lineitems survive the first probe;
    supplier→nation is a second broadcast; the one wide exchange is
    lineitem⋈orders on the orderkey, then a low-cardinality
    (nation, year) rollup with map-side partials."""
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem")
    # the revenue-minus-cost sum is summed in DECIMAL, not double:
    # double partial-agg order differs between engines, and a sum that
    # lands on a half-cent boundary (observed at sf0.01) flips the
    # final round(). Per-row double→decimal(18,4) conversion is
    # identical in both engines; the decimal sum is exact and
    # order-independent.
    profit = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(nation),
            supp["s_nationkey"] == nation["n_nationkey"],
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(F.sum(profit), 2).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# late shipments by line status × priority class (TPC-H Q12 shape)
# ---------------------------------------------------------------------------
@register(
    "linestatus_priority_late_counts",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS high_priority_lines,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT)
               AS low_priority_lines
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
    GROUP BY 1
    """,
)
def linestatus_priority_late_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 shape (adapted: this schema has no l_shipmode /
    l_receiptdate, so the mode dimension is l_linestatus and
    "late" is shipped >45 days after ordering): per line status, how
    many severely-late lines belonged to high- vs low-priority orders
    — the conditional CASE-sum pivot Q12 is famous for.

    The lateness predicate rides the orderkey join (no second pass),
    and the priority CASE collapses map-side into two partial sums per
    status — the shuffle after the fact join carries 2-long rows for a
    2-value grouping key."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li["l_orderkey"] == orders["o_orderkey"])
            & (li["l_shipdate"] > F.date_add(orders["o_orderdate"], 45)),
        )
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias(
                "high_priority_lines"
            ),
            F.sum(F.when(high, 0).otherwise(1)).alias(
                "low_priority_lines"
            ),
        )
    )


# ---------------------------------------------------------------------------
# supplier diversity per part attributes (TPC-H Q16 shape)
# ---------------------------------------------------------------------------
@register(
    "supplier_count_by_part_attrs",
    oracle="""
    SELECT p.p_brand AS brand,
           p.p_type  AS type,
           p.p_size  AS size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def supplier_count_by_part_attrs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape (adapted: the part↔supplier relationship comes
    from lineitem instead of partsupp, and the "customer complaints"
    exclusion is suppliers in arrears, s_acctbal < 0): how many
    distinct eligible suppliers ship each (brand, type, size)
    combination outside Brand#1 in the size in-list.

    The NOT IN becomes a broadcast left_anti join (the exclusion list
    is tiny); brand/size trims ride the broadcast part dim into the
    fact probe; countDistinct shuffles (brand, type, size, suppkey)
    once — map-side dedup of repeats first."""
    part = (
        table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            li["l_suppkey"] == bad_supp["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# dominant-share suppliers (TPC-H Q20 shape: per-key share vs threshold)
# ---------------------------------------------------------------------------
@register(
    "dominant_part_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l_suppkey AS suppkey, l_partkey AS partkey,
               sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ),
    ptot AS (SELECT partkey, sum(qty) AS total_qty FROM sp GROUP BY 1)
    SELECT DISTINCT s.s_name AS supplier, n.n_name AS nation
    FROM sp
    JOIN ptot       ON ptot.partkey = sp.partkey
    JOIN supplier s ON s.s_suppkey = sp.suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE sp.qty > 0.5 * ptot.total_qty
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: "excess availability" becomes market
    dominance — with no partsupp.ps_availqty the threshold compares a
    supplier's shipped quantity against half the part's total): the
    suppliers who shipped more than 50% of some part's 1996 volume,
    with their nations.

    Decorrelated like Q2: one (suppkey, partkey) rollup under the
    pushed date range, one per-part total derived FROM that rollup
    (no second fact scan), an equality join back on partkey, then a
    distinct over the small survivor set. l_quantity is integral, so
    the double sums are exact and the > comparison is deterministic
    cross-engine. Supplier/nation resolve via broadcast."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    sp = li.groupBy(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_partkey").alias("partkey"),
    ).agg(F.sum("l_quantity").alias("qty"))
    ptot = sp.groupBy("partkey").agg(F.sum("qty").alias("total_qty"))
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        sp.join(ptot, "partkey")
        .where(F.col("qty") > F.lit(0.5) * F.col("total_qty"))
        .join(F.broadcast(supp), sp["suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(nation),
            supp["s_nationkey"] == nation["n_nationkey"],
        )
        .select(
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# single-pass data profiling (operators/profiling.py)
# ---------------------------------------------------------------------------
ORDERS_PROFILE_COLS: dict[str, str] = {
    "o_orderkey": "numeric",
    "o_custkey": "numeric",
    "o_orderstatus": "string",
    "o_totalprice": "numeric",
    "o_orderdate": "timestamp",
    "o_orderpriority": "string",
}


def _profile_col_sql(c: str, kind: str) -> str:
    if kind == "numeric":
        mins = (
            f"CAST(min({c}) AS DOUBLE) AS min_num, "
            f"CAST(max({c}) AS DOUBLE) AS max_num, "
            "CAST(NULL AS VARCHAR) AS min_str, "
            "CAST(NULL AS VARCHAR) AS max_str"
        )
    elif kind == "timestamp":
        mins = (
            "CAST(NULL AS DOUBLE) AS min_num, "
            "CAST(NULL AS DOUBLE) AS max_num, "
            f"strftime(min({c}), '%Y-%m-%d %H:%M:%S') AS min_str, "
            f"strftime(max({c}), '%Y-%m-%d %H:%M:%S') AS max_str"
        )
    else:
        mins = (
            "CAST(NULL AS DOUBLE) AS min_num, "
            "CAST(NULL AS DOUBLE) AS max_num, "
            f"CAST(min({c}) AS VARCHAR) AS min_str, "
            f"CAST(max({c}) AS VARCHAR) AS max_str"
        )
    return f"""
    SELECT '{c}' AS col_name,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           {mins}
    FROM orders"""


@register(
    "orders_data_profile",
    oracle="\n    UNION ALL".join(
        _profile_col_sql(c, k) for c, k in ORDERS_PROFILE_COLS.items()
    ),
)
def orders_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders feed: per-column null
    counts, exact distinct cardinalities, and min/max ranges — the
    screen run on every new extract before it is admitted downstream
    (a silent schema drift or null storm shows up here, not in a 2am
    page).

    Base stats are one aggregate pass; each exact distinct count runs
    as its own column-pruned aggregation subtree cross-joined onto it
    (operators/profiling.py — this avoids the multi-distinct Expand
    that would duplicate every row once per column; measured 3-4x
    faster cold), and the one-row result is pivoted row-per-column by
    exploding pre-built structs. The oracle is a UNION ALL of
    per-column aggregates generated from the SAME column-spec
    constant, so the two can't drift; profile(exact_distinct=False)
    swaps in HLL partials for the 100 TB path — the catalog pins the
    exact variant because the oracle needs exact numbers."""
    from urban_mobility_data_pipeline_spark.operators.profiling import (
        profile,
    )

    return profile(
        table(spark, sf_dir, "orders"), ORDERS_PROFILE_COLS
    )


# ---------------------------------------------------------------------------
# PageRank over the customer↔supplier trade graph (extensions/graph.py)
# ---------------------------------------------------------------------------
def _pagerank_oracle() -> str:
    """Unrolled power iteration: one CTE per superstep, generated from
    the SAME constants the Spark loop uses, with identical per-round
    round(, quantize) quantization — so the two engines cannot drift."""
    from urban_mobility_data_pipeline_spark.extensions.graph import (
        PAGERANK_DAMPING as D,
        PAGERANK_ITERS as ITERS,
        PAGERANK_QUANTIZE as Q,
    )

    teleport = repr(1.0 - D)
    iters_sql = ""
    for k in range(1, ITERS + 1):
        iters_sql += f""",
    r{k} AS (
        SELECT e.dst AS node,
               round({teleport} / (SELECT n FROM nn)
                     + {D} * sum(r.rank / d.outdeg), {Q}) AS rank
        FROM edges e
        JOIN r{k - 1} r ON r.node = e.src
        JOIN deg d      ON d.src = e.src
        GROUP BY e.dst
    )"""
    return f"""
    WITH pairs AS (
        SELECT DISTINCT 'C' || CAST(o.o_custkey AS VARCHAR) AS c,
                        'S' || CAST(l.l_suppkey AS VARCHAR) AS s
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    ),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS rank
           FROM deg){iters_sql}
    SELECT node, round(rank, 8) AS rank
    FROM r{ITERS}
    """


@register("trade_network_pagerank", oracle=_pagerank_oracle())
def trade_network_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the 1996 customer↔supplier trade
    network: an undirected bipartite graph with an edge wherever a
    customer ordered a lineitem from a supplier that year (distinct
    pairs, both directions; the year trim is pushed into the orders
    scan). High-rank suppliers are systemic — the ones whose failure
    touches the most purchasing relationships; the analytics twin of
    the dedup module's connected components.

    The edge list is ONE distinct rollup of the lineitem⋈orders join
    (deduped on the long key pair before node labels are built), then
    staged with its degrees folded in; each power-iteration superstep
    is a single join(staged_edges, ranks) → groupBy(dst)
    (extensions/graph.py documents the quantized-rank determinism
    contract and the periodic-materialization policy for long runs;
    the oracle is the same iteration unrolled into one CTE per round
    from the same constants)."""
    from urban_mobility_data_pipeline_spark.extensions.graph import (
        pagerank,
    )

    orders = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # distinct on the LONG key pair first, stringify after: the dedup
    # shuffle carries two 8-byte keys instead of formatted node labels
    pairs = (
        li.join(
            F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"]
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias(
                "c"
            ),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias(
                "s"
            ),
        )
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges)
    return ranks.select("node", F.round("rank", 8).alias("rank"))


# ---------------------------------------------------------------------------
# equi-width histogram with data-driven bounds
# ---------------------------------------------------------------------------
HIST_BINS = 20


@register(
    "order_value_histogram",
    oracle=f"""
    WITH bounds AS (
        SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM orders
    ),
    binned AS (
        SELECT CAST(least(floor((o_totalprice - b.lo)
                                / ((b.hi - b.lo) / {HIST_BINS})),
                          {HIST_BINS - 1}) AS INTEGER) AS bin,
               o_totalprice,
               b.lo, b.hi
        FROM orders CROSS JOIN bounds b
    )
    SELECT bin,
           round(min(lo) + bin * ((min(hi) - min(lo)) / {HIST_BINS}), 4)
               AS bin_lo,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_value
    FROM binned
    GROUP BY bin
    """,
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order values with DATA-DRIVEN bounds —
    the distribution half of profiling (orders_data_profile gives the
    range; this shows the shape, the skew a partitioner or a pricing
    analyst cares about). The global min/max is a 1-row aggregate
    broadcast into a map-side bin computation ({bins} bins, top edge
    clamped into the last bin); the only shuffle is the {bins}-row
    rollup. Bin boundaries are the identical IEEE expression in both
    engines, so bin membership is deterministic cross-engine."""
    orders = table(spark, sf_dir, "orders").select("o_totalprice")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(HIST_BINS)
    bin_ = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / width),
        F.lit(HIST_BINS - 1),
    ).cast("int")
    return (
        orders.join(F.broadcast(bounds))
        .select(bin_.alias("bin"), "o_totalprice", "lo", "hi")
        .groupBy("bin")
        .agg(
            F.round(
                F.min("lo")
                + F.col("bin")
                * ((F.min("hi") - F.min("lo")) / F.lit(HIST_BINS)),
                4,
            ).alias("bin_lo"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


order_value_histogram.__doc__ = order_value_histogram.__doc__.format(
    bins=HIST_BINS
)


# ---------------------------------------------------------------------------
# order inter-arrival gaps (lag window → segment rollup)
# ---------------------------------------------------------------------------
@register(
    "segment_order_interarrival",
    oracle="""
    WITH gaps AS (
        SELECT o.o_custkey,
               date_diff('day',
                         CAST(lag(o.o_orderdate) OVER (
                             PARTITION BY o.o_custkey
                             ORDER BY o.o_orderdate, o.o_orderkey
                         ) AS DATE),
                         CAST(o.o_orderdate AS DATE)) AS gap_days
        FROM orders o
    ),
    valid AS (SELECT * FROM gaps WHERE gap_days IS NOT NULL)
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_gaps,
           round(avg(v.gap_days), 4) AS avg_gap_days,
           CAST(min(v.gap_days) AS BIGINT) AS min_gap_days,
           CAST(max(v.gap_days) AS BIGINT) AS max_gap_days
    FROM valid v
    JOIN customer c ON c.c_custkey = v.o_custkey
    GROUP BY 1
    """,
)
def segment_order_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence profile: per market segment, the distribution
    of day-gaps between a customer's consecutive orders — the
    inter-arrival statistic behind churn models and demand forecasts.

    One window pass partitioned by customer (ordered by date with an
    orderkey tiebreak so same-day orders sequence identically in both
    engines) produces the lag gaps; the rollup joins the broadcast
    customer dim for the segment and aggregates exact integer day
    counts — avg is a single division of exact sums, so no
    cross-engine float drift."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"),
            F.to_date(F.lag("o_orderdate").over(w)),
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        gaps.join(
            F.broadcast(cust), gaps["o_custkey"] == cust["c_custkey"]
        )
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
            F.min("gap_days").cast("long").alias("min_gap_days"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
        )
    )


# ---------------------------------------------------------------------------
# year-over-year customer retention (cohort self-join on orders)
# ---------------------------------------------------------------------------
@register(
    "customer_yearly_retention",
    oracle="""
    WITH active AS (
        SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS yr,
                        o_custkey
        FROM orders
    )
    SELECT a.yr,
           count(*) AS n_active,
           CAST(count(b.o_custkey) AS BIGINT) AS n_retained_next_year,
           round(count(b.o_custkey) / CAST(count(*) AS DOUBLE), 6)
               AS retention_rate
    FROM active a
    LEFT JOIN active b
      ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
    GROUP BY a.yr
    """,
)
def customer_yearly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year retention on the orders fact: of the customers
    active in year Y, how many ordered again in Y+1 — the cohort
    health metric a subscription or marketplace team tracks (the
    events-based twin, user_retention_cohorts, works on daily event
    cohorts; this is the coarse revenue-side view).

    One distinct rollup of (year, customer) — the shuffle carries an
    int pair per order, collapsed map-side — self-joined on
    (customer, year+1). Both sides are the SAME staged rollup keyed by
    customer, so the join co-partitions; the final per-year rollup is
    a handful of rows."""
    orders = table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("yr"), "o_custkey"
    )
    active = orders.distinct()
    nxt = active.select(
        (F.col("yr") - 1).alias("prev_yr"),
        F.col("o_custkey").alias("next_cust"),
    )
    return (
        active.join(
            nxt,
            (active["o_custkey"] == nxt["next_cust"])
            & (active["yr"] == nxt["prev_yr"]),
            "left",
        )
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count("next_cust").alias("n_retained_next_year"),
            F.round(
                F.count("next_cust") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("retention_rate"),
        )
    )


# ---------------------------------------------------------------------------
# return-rate ranking by Wilson lower bound
# ---------------------------------------------------------------------------
WILSON_Z = 1.96  # 95% confidence


@register(
    "brand_return_rate_ranked",
    oracle=f"""
    WITH per_brand AS (
        SELECT p.p_brand AS brand,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS DOUBLE) AS r
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1
    )
    SELECT brand,
           CAST(n AS BIGINT) AS n_lineitems,
           CAST(r AS BIGINT) AS n_returned,
           round(r / n, 6) AS return_rate,
           round(((r / n) + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  - {WILSON_Z} * sqrt((r / n) * (1 - r / n) / n
                        + {WILSON_Z} * {WILSON_Z} / (4 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n), 6)
               AS wilson_lower_bound
    FROM per_brand
    ORDER BY round(((r / n) + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  - {WILSON_Z} * sqrt((r / n) * (1 - r / n) / n
                        + {WILSON_Z} * {WILSON_Z} / (4 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n), 6) DESC,
             brand ASC
    """,
)
def brand_return_rate_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand return rates ranked by the Wilson-score LOWER confidence
    bound (z={z}) — the statistically honest "worst offenders" list: a
    brand with 3/4 returns must not outrank one with 300/1000, which
    is exactly what sorting by the raw rate gets wrong. One broadcast
    part join, one low-cardinality rollup with map-side CASE partials;
    the Wilson arithmetic operates on exact integer counts, so both
    engines compute the identical IEEE expression, and the ordering
    uses the ROUNDED bound with a brand tiebreak."""
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    per_brand = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("double")
            .alias("r"),
        )
    )
    z = F.lit(WILSON_Z)
    p = F.col("r") / F.col("n")
    n = F.col("n")
    wilson = (
        p
        + z * z / (F.lit(2) * n)
        - z
        * F.sqrt(
            p * (F.lit(1) - p) / n + z * z / (F.lit(4) * n * n)
        )
    ) / (F.lit(1) + z * z / n)
    return (
        per_brand.select(
            "brand",
            F.col("n").cast("long").alias("n_lineitems"),
            F.col("r").cast("long").alias("n_returned"),
            F.round(p, 6).alias("return_rate"),
            F.round(wilson, 6).alias("wilson_lower_bound"),
        )
        .orderBy(F.desc("wilson_lower_bound"), F.asc("brand"))
    )


brand_return_rate_ranked.__doc__ = brand_return_rate_ranked.__doc__.format(
    z=WILSON_Z
)


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------
_KANON_K = 5
_LDIV_L = 3


@register(
    "customers_k_anonymity",
    oracle=f"""
    WITH q AS (
        SELECT c.c_custkey, n.n_regionkey AS region, c.c_mktsegment,
               CAST(floor(c.c_acctbal / 4000) AS INT) AS bal_band
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    j AS (
        SELECT q.*, o.o_orderpriority
        FROM q LEFT JOIN orders o ON o.o_custkey = q.c_custkey
    )
    SELECT region, c_mktsegment, bal_band,
           count(DISTINCT c_custkey) AS k_size,
           count(DISTINCT o_orderpriority) AS l_div,
           CASE WHEN count(DISTINCT c_custkey) < {_KANON_K} THEN 'k_risk'
                WHEN count(DISTINCT o_orderpriority) < {_LDIV_L} THEN 'l_risk'
                ELSE 'ok' END AS risk_tier
    FROM j
    GROUP BY 1, 2, 3
    """,
)
def customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release audit (Sweeney's k-anonymity + l-diversity):
    group customers by quasi-identifiers (region, segment, account
    balance band — nation folds to region through a broadcast dim join,
    the classic generalization step of a k-anonymity release) and flag groups small enough to re-identify
    (k_size < {k}) or homogeneous enough to infer the sensitive
    attribute — the order-priority mix — without identifying anyone
    (l_div < {l}). This is the audit that gates publishing "anonymized"
    extracts; it composes with the GDPR operators: erasure shrinks
    groups, so re-running the audit after an erasure wave shows which
    cells fell below k. One left join + one grouped dual
    count-distinct; the quasi-cube is tiny (|nations| x |segments| x
    |bands|) so the output never outgrows the driver."""
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_regionkey").alias("region")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            "region",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 4000).cast("int").alias("bal_band"),
        )
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    g = j.groupBy("region", "c_mktsegment", "bal_band").agg(
        F.countDistinct("c_custkey").alias("k_size"),
        F.countDistinct("o_orderpriority").alias("l_div"),
    )
    return g.select(
        "region",
        "c_mktsegment",
        "bal_band",
        "k_size",
        "l_div",
        F.when(F.col("k_size") < _KANON_K, F.lit("k_risk"))
        .when(F.col("l_div") < _LDIV_L, F.lit("l_risk"))
        .otherwise(F.lit("ok"))
        .alias("risk_tier"),
    )


customers_k_anonymity.__doc__ = customers_k_anonymity.__doc__.format(
    k=_KANON_K, l=_LDIV_L
)


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------
@register(
    "customer_rfm_segments",
    oracle="""
    WITH o AS (
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) AS d,
               o_totalprice
        FROM orders
    ),
    anchor AS (SELECT max(d) AS maxd FROM o),
    base AS (
        SELECT o_custkey AS c_custkey,
               date_diff('day', max(d), (SELECT maxd FROM anchor)) AS r_days,
               count(*) AS freq,
               round(sum(o_totalprice), 2) AS monetary
        FROM o GROUP BY 1
    ),
    scored AS (
        SELECT *,
               ntile(5) OVER (ORDER BY r_days DESC, c_custkey) AS r_score,
               ntile(5) OVER (ORDER BY freq ASC, c_custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary ASC, c_custkey) AS m_score
        FROM base
    )
    SELECT c_custkey, CAST(r_days AS BIGINT) AS r_days,
           CAST(freq AS BIGINT) AS freq, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                     THEN 'champion'
                WHEN f_score >= 4 THEN 'loyal'
                WHEN m_score >= 4 THEN 'big_spender'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM segmentation: per-customer recency (days since last
    order, anchored to the corpus max date so the result is
    reproducible), frequency, monetary; quintile scores via NTILE with
    full deterministic tiebreaks (score column then c_custkey — NTILE
    is order-sensitive, so ties MUST be broken identically in every
    engine) and the standard segment ladder. The per-customer rollup is
    one shuffle on o_custkey; the NTILEs run on the already-reduced
    customer frame (|customers| rows, not |orders|)."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_totalprice",
    )
    anchor = o.agg(F.max("d").alias("maxd"))
    base = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("d").alias("lastd"),
            F.count(F.lit(1)).alias("freq"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "c_custkey",
            F.datediff("maxd", "lastd").cast("long").alias("r_days"),
            "freq",
            "monetary",
        )
    )
    scored = base.select(
        "*",
        F.ntile(5)
        .over(Window.orderBy(F.desc("r_days"), F.asc("c_custkey")))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("freq"), F.asc("c_custkey")))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("monetary"), F.asc("c_custkey")))
        .alias("m_score"),
    )
    return scored.select(
        "c_custkey",
        "r_days",
        "freq",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            F.lit("champion"),
        )
        .when(F.col("f_score") >= 4, F.lit("loyal"))
        .when(F.col("m_score") >= 4, F.lit("big_spender"))
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") >= 3),
            F.lit("at_risk"),
        )
        .when(F.col("r_score") <= 2, F.lit("hibernating"))
        .otherwise(F.lit("regular"))
        .alias("segment"),
    )


# ---------------------------------------------------------------------------
# chi-square independence test (priority x weekday)
# ---------------------------------------------------------------------------
#: chi2 critical value, alpha=0.05, dof=(5-1)(7-1)=24
_CHI2_CRIT_24 = 36.415


@register(
    "orders_priority_weekday_chi2",
    oracle=f"""
    WITH o AS (
        SELECT o_orderpriority AS prio,
               date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) % 7 AS wd
        FROM orders
    ),
    obs AS (SELECT prio, wd, count(*) AS c FROM o GROUP BY 1, 2),
    rows_ AS (SELECT prio, sum(c) AS rc FROM obs GROUP BY 1),
    cols_ AS (SELECT wd, sum(c) AS cc FROM obs GROUP BY 1),
    tot AS (SELECT sum(c) AS n FROM obs),
    grid AS (
        SELECT r.prio, col.wd, coalesce(obs.c, 0) AS c, r.rc, col.cc, t.n
        FROM rows_ r CROSS JOIN cols_ col CROSS JOIN tot t
        LEFT JOIN obs ON obs.prio = r.prio AND obs.wd = col.wd
    ),
    terms AS (
        SELECT CAST(round(
                   (c - rc * cc / CAST(n AS DOUBLE))
                   * (c - rc * cc / CAST(n AS DOUBLE))
                   / (rc * cc / CAST(n AS DOUBLE))
                   * 100000000) AS BIGINT) AS t8,
               n
        FROM grid
    )
    SELECT round(sum(t8) / 100000000.0, 4) AS chi2,
           CAST((SELECT count(*) FROM rows_) - 1 AS INT)
           * CAST((SELECT count(*) FROM cols_) - 1 AS INT) AS dof,
           CAST(min(n) AS BIGINT) AS n,
           CASE WHEN sum(t8) / 100000000.0 > {_CHI2_CRIT_24}
                THEN 'dependent' ELSE 'independent' END AS verdict
    FROM terms
    """,
)
def orders_priority_weekday_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between order priority
    and weekday — the statistical-test family: is the priority mix a
    function of the day of week? Weekday is epoch-days mod 7 (pure
    integer — immune to engine DOW-numbering differences), expected
    counts are rank-one row x col / n, and each (obs-exp)^2/exp term is
    rounded to 8dp and summed AS AN INTEGER so no accumulation order
    can flip a digit. The contingency table is |priorities| x 7 — the
    whole test after the one groupBy is constant-size arithmetic."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
            % 7
        ).alias("wd"),
    )
    obs = o.groupBy("prio", "wd").agg(F.count(F.lit(1)).alias("c"))
    rows_ = obs.groupBy("prio").agg(F.sum("c").alias("rc"))
    cols_ = obs.groupBy("wd").agg(F.sum("c").alias("cc"))
    tot = obs.agg(F.sum("c").alias("n"))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["prio", "wd"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    e = F.col("rc") * F.col("cc") / F.col("n").cast("double")
    t8 = F.round((F.col("c") - e) * (F.col("c") - e) / e * 100000000).cast(
        "long"
    )
    return (
        grid.select("prio", "wd", t8.alias("t8"), "n")
        .agg(
            F.sum("t8").alias("s8"),
            F.min("n").alias("n"),
            F.countDistinct("prio").alias("nr"),
            F.countDistinct("wd").alias("nc"),
        )
        .select(
            F.round(F.col("s8") / 100000000.0, 4).alias("chi2"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("int").alias("dof"),
            F.col("n").cast("long").alias("n"),
            F.when(
                F.col("s8") / 100000000.0 > _CHI2_CRIT_24, F.lit("dependent")
            )
            .otherwise(F.lit("independent"))
            .alias("verdict"),
        )
    )


# ---------------------------------------------------------------------------
# Gini concentration of customer spend
# ---------------------------------------------------------------------------
@register(
    "segment_spend_gini",
    oracle="""
    WITH o AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    per_cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               sum(o.cents) AS x
        FROM o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT segment, x,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY x, o_custkey) AS r,
               count(*) OVER (PARTITION BY segment) AS n,
               sum(x) OVER (PARTITION BY segment) AS sx
        FROM per_cust
    )
    SELECT segment, CAST(min(n) AS BIGINT) AS n_customers,
           round((2.0 * sum(r * x) - (min(n) + 1.0) * min(sx))
                 / (min(n) * CAST(min(sx) AS DOUBLE)), 6) AS gini
    FROM ranked
    GROUP BY segment
    """,
)
def segment_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per market segment — the
    revenue-concentration health metric (0 = equal spend, ->1 = one
    whale). Prices become INTEGER CENTS before any aggregation
    (round(x*100) kills the double representation error, then every sum
    is exact integer arithmetic in both engines); the closed form
    G = (2*sum(r*x) - (n+1)*sum(x)) / (n*sum(x)) runs on per-segment
    rank windows, and equal-x tie order provably cancels in sum(r*x).
    Only the final display division is floating point."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    per_cust = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .groupBy("segment", "o_custkey")
        .agg(F.sum("cents").alias("x"))
    )
    w = Window.partitionBy("segment")
    ranked = per_cust.select(
        "segment",
        "x",
        F.row_number()
        .over(Window.partitionBy("segment").orderBy("x", "o_custkey"))
        .alias("r"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
    )
    return ranked.groupBy("segment").agg(
        F.min("n").cast("long").alias("n_customers"),
        F.round(
            (
                2.0 * F.sum(F.col("r") * F.col("x"))
                - (F.min("n") + 1.0) * F.min("sx")
            )
            / (F.min("n") * F.min("sx").cast("double")),
            6,
        ).alias("gini"),
    )
