"""Reference-parity query catalog (SURVEY.md §2 operator inventory).

Each query exercises one or more reference operators on the driver's
TPC-H-ish testdata and ships with a DuckDB oracle (``ORACLES``) that the
verification driver runs side-by-side. SURVEY.md §2 ids (W1, J1, A1, …)
are cited per query; reference file:line citations live in the operator
library these queries call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.functions.hashing import md5_int_key, scd_hash
from urban_mobility_data_pipeline_spark.operators.cleaning import (
    dq_flags,
    normalize_strings,
    redact_when,
)
from urban_mobility_data_pipeline_spark.operators.dedup import (
    current_and_previous,
    latest_per_key,
)
from urban_mobility_data_pipeline_spark.operators.star import (
    calendar_attributes,
    validate_fk,
    with_unknown_row,
)
from urban_mobility_data_pipeline_spark.plans._helpers import (
    SESSION_GAP_US,
    date_str,
    duck_md5_int_key,
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
# 1. pricing_summary — flagship. A1 conditional rollup + P1 predicate
#    (reference agg_trips_daily.py:128-143 pattern on TPC-H Q1 shape).
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                            AS sum_qty,
           round(sum(l_extendedprice), 2)                       AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
           round(avg(l_quantity), 4)                            AS avg_qty,
           round(avg(l_extendedprice), 4)                       AS avg_price,
           round(avg(l_discount), 6)                            AS avg_disc,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                                                                AS n_finished,
           count(*)                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-rollup-style hash aggregation with conditional counts
    (SURVEY §2.5 A1; reference agg_trips_daily.py:128-143) over a
    watermark-style predicate (P1). The filter is pushed to the parquet
    scan; the groupBy is a partial/final hash agg with map-side combine."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.sum(
            F.when(F.col("l_linestatus") == "F", 1).otherwise(0)
        ).cast("long").alias("n_finished"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# 2. latest_order_per_customer — W1 latest-per-key window dedup
# ---------------------------------------------------------------------------
@register(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number latest-version-per-key dedup with deterministic
    tiebreaker (reference silver/trips:209-219; tiebreak added per
    SURVEY §7 risk 2)."""
    orders = table(spark, sf_dir, "orders")
    latest = latest_per_key(
        orders, keys=["o_custkey"], order_desc=["o_orderdate", "o_orderkey"]
    )
    return latest.select(
        "o_custkey",
        "o_orderkey",
        date_str("o_orderdate").alias("order_date"),
        "o_totalprice",
    )


# ---------------------------------------------------------------------------
# 3. orders_conformed — P4 cast / P5 null-like scrub / P7 normalization
# ---------------------------------------------------------------------------
@register(
    "orders_conformed",
    oracle="""
    SELECT o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           CASE WHEN lower(trim(o_orderpriority)) IN
                     ('null','n/a','none','-','','4-not specified')
                THEN NULL ELSE lower(trim(o_orderpriority)) END AS priority_norm,
           upper(trim(o_orderstatus))                           AS status_norm,
           CASE WHEN o_totalprice < 0 THEN NULL ELSE o_totalprice END
                                                                AS total_price,
           CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER)     AS order_date_key
    FROM orders
    """,
)
def orders_conformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4-P7 cleaning block factored from the reference's per-table
    withColumn chains (silver/trips:132-190): enum lower(trim),
    upper(trim), null-like scrub extended with a domain-specific token,
    negative-amount clamp (P6), yyyyMMdd date_key derivation."""
    orders = table(spark, sf_dir, "orders")
    pr = F.lower(F.trim(F.col("o_orderpriority")))
    return orders.select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.when(
            pr.isin("null", "n/a", "none", "-", "", "4-not specified"),
            F.lit(None),
        ).otherwise(pr).alias("priority_norm"),
        F.upper(F.trim(F.col("o_orderstatus"))).alias("status_norm"),
        F.when(F.col("o_totalprice") < 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("total_price"),
        date_str("o_orderdate", "yyyyMMdd").cast("int").alias("order_date_key"),
    )


# ---------------------------------------------------------------------------
# 4. daily_sales_recompute — J3 affected-slice join + A1 + M6 read side
# ---------------------------------------------------------------------------
@register(
    "daily_sales_recompute",
    oracle="""
    WITH affected AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS d
        FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           count(*)                                          AS n_orders,
           round(sum(o.o_totalprice), 2)                     AS revenue,
           count(DISTINCT o.o_custkey)                       AS n_customers
    FROM orders o
    JOIN affected a ON CAST(o.o_orderdate AS DATE) = a.d
    GROUP BY 1
    """,
)
def daily_sales_recompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recompute-affected-grain aggregation (reference late-data strategy,
    SURVEY §2.3 J3 + §2.5 A1: agg_trips_daily.py:97-143): derive the
    affected key set, inner-join it back (broadcast — it's tiny), fully
    recompute those grains. This is what makes late arrivals safe without
    streaming state."""
    orders = table(spark, sf_dir, "orders").withColumn(
        "d", F.to_date("o_orderdate")
    )
    affected = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("d")
        .distinct()
    )
    sliced = orders.join(F.broadcast(affected), "d", "inner")
    return sliced.groupBy(date_str("d").alias("order_date")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# 5. orders_fk_validated — J1 dim-validation join, orphans → UNKNOWN key 0
# ---------------------------------------------------------------------------
@register(
    "orders_fk_validated",
    oracle="""
    SELECT o.o_orderkey,
           CASE WHEN c.c_custkey IS NULL THEN 0 ELSE o.o_custkey END AS cust_key,
           c.c_custkey IS NULL AS is_orphan
    FROM orders o
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
               WHERE c_mktsegment <> 'BUILDING') c
      ON o.o_custkey = c.c_custkey
    """,
)
def orders_fk_validated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: star-schema FK validation with orphan → reserved key 0
    (reference fact_trips.py:154-201). The dim key set is broadcast, so
    the fact never shuffles."""
    orders = table(spark, sf_dir, "orders")
    dim = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") != "BUILDING"
    )
    validated = validate_fk(
        orders,
        dim,
        fact_key="o_custkey",
        dim_key="c_custkey",
        out_col="cust_key",
        orphan_flag_col="is_orphan",
    )
    return validated.select("o_orderkey", "cust_key", "is_orphan")


# ---------------------------------------------------------------------------
# 6. customer_order_scd2_history — SCD2 valid_from/valid_to/is_current
# ---------------------------------------------------------------------------
@register(
    "customer_order_scd2_history",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
           (lead(o_orderdate) OVER w) IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def customer_order_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 historization semantics (M2+M3 close-current / insert-new,
    reference silver/trips:347-432) derived set-wise: each version's
    valid_to is the next version's valid_from; the last version is
    current. The merge engine in operators.scd applies the same
    semantics incrementally."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        date_str("o_orderdate").alias("valid_from"),
        date_str(nxt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# 7. customer_scd3_current_prev — W2/J7 SCD3 seed (current + prev_*)
# ---------------------------------------------------------------------------
@register(
    "customer_scd3_current_prev",
    oracle="""
    WITH ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    )
    SELECT cur.o_custkey,
           cur.o_orderkey                                    AS current_orderkey,
           cur.o_totalprice                                  AS current_totalprice,
           prev.o_totalprice                                 AS prev_totalprice,
           strftime(prev.o_orderdate, '%Y-%m-%d')            AS prev_order_date
    FROM (SELECT * FROM ranked WHERE rn = 1) cur
    LEFT JOIN (SELECT * FROM ranked WHERE rn = 2) prev
      ON cur.o_custkey = prev.o_custkey
    """,
)
def customer_scd3_current_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 + J7: SCD3 seed — rank versions, keep rn=1 as current, self-join
    rn=2 renamed prev_* (reference scd3/dim_passenger.py:63-95)."""
    orders = table(spark, sf_dir, "orders")
    cp = current_and_previous(
        orders,
        keys=["o_custkey"],
        order_desc=["o_orderdate", "o_orderkey"],
        prev_cols=["o_totalprice", "o_orderdate"],
    )
    return cp.select(
        "o_custkey",
        F.col("o_orderkey").alias("current_orderkey"),
        F.col("o_totalprice").alias("current_totalprice"),
        F.col("prev_o_totalprice").alias("prev_totalprice"),
        date_str("prev_o_orderdate").alias("prev_order_date"),
    )


# ---------------------------------------------------------------------------
# 8. calendar_dim — sequence+explode date spine + UNKNOWN row (U1)
# ---------------------------------------------------------------------------
@register(
    "calendar_dim",
    oracle="""
    WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS s,
                      max(CAST(o_orderdate AS DATE)) AS e FROM orders),
    spine AS (
        SELECT CAST(unnest(generate_series(s, e, INTERVAL 1 DAY)) AS DATE) AS date
        FROM b
    )
    SELECT strftime(date, '%Y-%m-%d')                AS date_str,
           CAST(strftime(date, '%Y%m%d') AS INTEGER) AS date_key,
           CAST(year(date) AS INTEGER)               AS year,
           CAST(month(date) AS INTEGER)              AS month,
           CAST(dayofmonth(date) AS INTEGER)         AS day,
           CAST(weekofyear(date) AS INTEGER)         AS week_of_year,
           CAST(dayofweek(date) + 1 AS INTEGER)      AS day_of_week,
           dayname(date)                             AS day_name,
           CAST(quarter(date) AS INTEGER)            AS quarter,
           dayofweek(date) IN (0, 6)                 AS is_weekend
    FROM spine
    UNION ALL
    SELECT '1900-01-01', 0, 0, 0, 0, 0, 0, 'UNKNOWN', 0, false
    """,
)
def calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dim: date endpoints from the data (A4), sequence+explode
    spine, date attributes, UNKNOWN row union (reference
    static/dim_date.py:116-159). No driver-side collect: the 1-row
    min/max aggregate feeds sequence() directly."""
    orders = table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("s"),
        F.max(F.to_date("o_orderdate")).alias("e"),
    )
    spine = bounds.select(
        F.explode(F.sequence("s", "e", F.expr("interval 1 day"))).alias("date")
    )
    dim = calendar_attributes(spine, "date").withColumn(
        "date_str", date_str("date")
    ).drop("date")
    return with_unknown_row(
        dim,
        {
            "date_str": F.lit("1900-01-01"),
            "date_key": F.lit(0),
            "year": F.lit(0),
            "month": F.lit(0),
            "day": F.lit(0),
            "week_of_year": F.lit(0),
            "day_of_week": F.lit(0),
            "day_name": F.lit("UNKNOWN"),
            "quarter": F.lit(0),
            "is_weekend": F.lit(False),
        },
    )


# ---------------------------------------------------------------------------
# 9. order_priority_dim — A3 dim build + surrogate keys + UNKNOWN row
# ---------------------------------------------------------------------------
_PK = duck_md5_int_key("lower(trim(o_orderpriority))")
@register(
    "order_priority_dim",
    oracle=f"""
    SELECT lower(trim(o_orderpriority))                    AS priority,
           {_PK}                                           AS priority_key,
           md5(coalesce(lower(trim(o_orderpriority)), '')) AS priority_hash,
           strftime(max(o_orderdate), '%Y-%m-%d')          AS last_seen
    FROM orders
    GROUP BY 1
    UNION ALL
    SELECT 'unknown', 0, NULL, NULL
    """,
)
def order_priority_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 dim build (groupBy + max last-seen, reference
    static/dim_payment.py:88-92) with deterministic surrogate keys
    (md5_int_key — portable twin of the reference's xxhash64+pmod recipe,
    fact_payments.py:135) and U1 UNKNOWN row."""
    orders = table(spark, sf_dir, "orders")
    pr = F.lower(F.trim(F.col("o_orderpriority")))
    dim = (
        orders.groupBy(pr.alias("priority"))
        .agg(date_str(F.max("o_orderdate")).alias("last_seen"))
        .select(
            "priority",
            md5_int_key(["priority"]).alias("priority_key"),
            F.md5(F.coalesce(F.col("priority"), F.lit(""))).alias("priority_hash"),
            "last_seen",
        )
    )
    return with_unknown_row(
        dim,
        {
            "priority": F.lit("unknown"),
            "priority_key": F.lit(0),
            "priority_hash": F.lit(None).cast("string"),
            "last_seen": F.lit(None).cast("string"),
        },
    )


# ---------------------------------------------------------------------------
# 10. watermark_bounds — A4 global min/max scalar aggregation
# ---------------------------------------------------------------------------
@register(
    "watermark_bounds",
    oracle="""
    SELECT strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_ts,
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_ts,
           count(*) AS n_rows
    FROM orders
    """,
)
def watermark_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: global min/max watermark probe (reference
    silver/trips:197-201, static/dim_date.py:44-90) — the engine's
    target-derived watermark read (fact_trips.py:43-56) is this exact
    plan against the target table."""
    orders = table(spark, sf_dir, "orders")
    return orders.agg(
        date_str(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("min_ts"),
        date_str(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# 11. daily_user_activity — A2 multi-distinct daily rollup on events
# ---------------------------------------------------------------------------
@register(
    "daily_user_activity",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d')                       AS event_date,
           count(*)                                        AS n_events,
           count(DISTINCT user_id)                         AS n_users,
           count(DISTINCT event_type)                      AS n_event_types,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                                                           AS n_purchases,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
                                                           AS purchase_value,
           round(avg(value), 4)                            AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def daily_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: daily grain with exact countDistinct + conditional counts
    (reference agg_driver_daily.py:164-228)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        date_str(event_time(), "yyyy-MM-dd").alias("event_date")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("purchase_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# 12. error_user_activity — J6 broadcast subject semi-join
# ---------------------------------------------------------------------------
@register(
    "error_user_activity",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_errors,
           max(epoch_us(ts)) AS last_seen_us
    FROM events
    WHERE user_id IN (SELECT DISTINCT user_id FROM events
                      WHERE event_type = 'error')
    GROUP BY user_id
    """,
)
def error_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: GDPR-style subject derivation — distinct affected ids,
    broadcast, left-semi join back to the fact (reference
    gdpr_propagate_erasure.py:607-655 uses broadcast + inner; we use the
    explicit left_semi Catalyst form per SURVEY §2.3)."""
    ev = table(spark, sf_dir, "events")
    affected = (
        ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    )
    hits = ev.join(F.broadcast(affected), "user_id", "left_semi")
    return hits.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
        F.max("ts_us").alias("last_seen_us"),
    )


# ---------------------------------------------------------------------------
# 13. customer_scd_hash — §1.3 change-detection hash
# ---------------------------------------------------------------------------
@register(
    "customer_scd_hash",
    oracle="""
    SELECT c_custkey,
           sha256(concat_ws('||',
               coalesce(c_name, ''),
               coalesce(c_mktsegment, ''),
               coalesce(CAST(c_nationkey AS VARCHAR), ''))) AS scd_hash
    FROM customer
    """,
)
def customer_scd_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scd_hash recipe: SHA-256 of ||-joined null-coalesced business
    columns (reference silver/trips:286-319). Doubles are excluded from
    the hash per SURVEY §7 risk 3 (engine-dependent rendering)."""
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        scd_hash(["c_name", "c_mktsegment", "c_nationkey"]).alias("scd_hash"),
    )


# ---------------------------------------------------------------------------
# 14. incremental_order_slice — P1 watermark filter + P2 coarse prune
# ---------------------------------------------------------------------------
@register(
    "incremental_order_slice",
    oracle="""
    SELECT o_orderkey, o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice,
           lower(trim(o_orderstatus)) AS status_norm
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1999-06-01'
      AND o_orderdate > TIMESTAMP '1999-06-01 00:00:00'
    """,
)
def incremental_order_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2: the incremental read — coarse partition-prune predicate on
    the date, then the fine watermark filter (reference
    silver/trips:121-130). Both predicates reach the parquet scan
    (PushedFilters)."""
    orders = table(spark, sf_dir, "orders")
    sliced = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1999-06-01").cast("date"))
        & (F.col("o_orderdate") > F.lit("1999-06-01 00:00:00"))
    )
    sliced = normalize_strings(sliced, lower_cols=["o_orderstatus"])
    return sliced.select(
        "o_orderkey",
        "o_custkey",
        date_str("o_orderdate").alias("order_date"),
        "o_totalprice",
        F.col("o_orderstatus").alias("status_norm"),
    )


# ---------------------------------------------------------------------------
# 15. events_dq_flags — P6/P8/P9 data-quality flag derivation
# ---------------------------------------------------------------------------
@register(
    "events_dq_flags",
    oracle=r"""
    SELECT event_id,
           coalesce(value < 0 OR value > 10000, true)    AS value_out_of_domain,
           coalesce(NOT regexp_matches(props, '^\{.*\}$'), true)
                                                          AS props_invalid,
           coalesce(event_type NOT IN
               ('click','view','purchase','signup','error'), true)
                                                          AS event_type_invalid,
           epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-15') AS is_stale
    FROM events
    """,
)
def events_dq_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 DQ-flag derivation: violations are recorded as booleans, rows
    are never dropped (reference silver/trips:222-281); includes a P8
    regex predicate (passengers:228-232) and P6 domain check."""
    ev = table(spark, sf_dir, "events")
    allowed = ["click", "view", "purchase", "signup", "error"]
    cutoff_us = 1_705_276_800_000_000  # 2024-01-15 UTC
    return dq_flags(
        ev,
        {
            "value_out_of_domain": F.coalesce(
                (F.col("value") < 0) | (F.col("value") > 10000), F.lit(True)
            ),
            "props_invalid": F.coalesce(
                ~F.col("props").rlike(r"^\{.*\}$"), F.lit(True)
            ),
            "event_type_invalid": F.coalesce(
                ~F.col("event_type").isin(*allowed), F.lit(True)
            ),
            "is_stale": F.col("ts_us") < F.lit(cutoff_us),
        },
    ).select(
        "event_id",
        "value_out_of_domain",
        "props_invalid",
        "event_type_invalid",
        "is_stale",
    )


# ---------------------------------------------------------------------------
# 16. customers_masked — P10 conditional redaction (GDPR safety belt)
# ---------------------------------------------------------------------------
@register(
    "customers_masked",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'ANONYMIZED' ELSE c_name END AS full_name,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END   AS mktsegment,
           c_acctbal < 0                                             AS is_masked,
           'ANON-' || CAST(c_custkey AS VARCHAR)                     AS anon_code
    FROM customer
    """,
)
def customers_masked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 + M8: conditional redaction projection — force-anonymize rows
    matching a predicate, with the deterministic ANON-<id> code shape
    (reference passengers:170-192 safety belt; plate recipe gdpr:477)."""
    cust = table(spark, sf_dir, "customer")
    deleted = F.col("c_acctbal") < 0
    masked = redact_when(
        cust,
        deleted,
        set_values={"c_name": F.lit("ANONYMIZED")},
        null_cols=["c_mktsegment"],
    )
    return masked.select(
        "c_custkey",
        F.col("c_name").alias("full_name"),
        F.col("c_mktsegment").alias("mktsegment"),
        deleted.alias("is_masked"),
        F.concat(F.lit("ANON-"), F.col("c_custkey").cast("string")).alias(
            "anon_code"
        ),
    )


# ---------------------------------------------------------------------------
# 17. events_retention_filter — P11 age predicate (retention read side)
# ---------------------------------------------------------------------------
@register(
    "events_retention_filter",
    oracle="""
    SELECT event_type, count(*) AS n_kept
    FROM events
    WHERE epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-20')
    GROUP BY event_type
    """,
)
def events_retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/S11: retention age predicate — the survivor set of a retention
    DELETE (reference retention/bronze_retention_cleanup.py:59-67; the
    mutating DELETE lives in operators.retention)."""
    ev = table(spark, sf_dir, "events")
    cutoff_us = 1_705_708_800_000_000  # 2024-01-20 UTC (mid data range)
    return (
        ev.filter(F.col("ts_us") >= F.lit(cutoff_us))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


# ---------------------------------------------------------------------------
# 18. top_customers_by_spend — sort + limit (top-k)
# ---------------------------------------------------------------------------
@register(
    "top_customers_by_spend",
    oracle="""
    SELECT o_custkey,
           round(sum(o_totalprice), 2) AS total_spend,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey ASC
    LIMIT 10
    """,
)
def top_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: agg → orderBy+limit (absent from the reference per SURVEY
    §2.7; engine capability). Spark plans this as TakeOrderedAndProject —
    a per-partition top-k + single-reduce, no full sort at scale."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# 19. event_props_json — JSON extraction (extension beyond reference §2.9)
# ---------------------------------------------------------------------------
@register(
    "event_props_json",
    oracle="""
    SELECT CAST(props->>'$.k' AS INTEGER) AS k,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + rollup (the reference has no JSON
    surface — SURVEY §2.9; this is engine capability for semi-structured
    event payloads)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# 20. union_distinct_customers — U2 unionByName + distinct
# ---------------------------------------------------------------------------
@register(
    "union_distinct_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def union_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: unionByName fold + distinct (reference gdpr:648-655 trip-id
    set union)."""
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderdate") < F.lit("1996-01-01")).select(
        "o_custkey"
    )
    b = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return a.unionByName(b).distinct()


# ---------------------------------------------------------------------------
# 21. hourly_event_windows — tumbling window aggregation (streaming parity)
# ---------------------------------------------------------------------------
@register(
    "hourly_event_windows",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows via F.window — the same expression the
    streaming module uses under readStream+watermark (SURVEY §2.10:
    reference has none; this is the Structured-Streaming-native rebuild
    of its batch-watermark analogue)."""
    ev = table(spark, sf_dir, "events")
    win = F.window(event_time(), "1 hour")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            date_str(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "total_value",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# 22. user_session_windows — sessionization (gaps-and-islands)
# ---------------------------------------------------------------------------
@register(
    "user_session_windows",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > {SESSION_GAP_US} OR
                         lag(epoch_us(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sessions AS (
        SELECT *, CAST(sum(is_new) OVER (
            PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           min(ts_us) AS session_start_us,
           max(ts_us) - min(ts_us) AS duration_us,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def user_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows as deterministic gaps-and-islands (lag + running
    sum) — batch twin of F.session_window / applyInPandasWithState in the
    streaming module. One shuffle on user_id serves both windows and the
    final groupBy."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(prev.isNull() | ((F.col("ts_us") - prev) > SESSION_GAP_US), 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("session_start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# 23. daily_sales_calendar — J5 calendar enrich join
# ---------------------------------------------------------------------------
@register(
    "daily_sales_calendar",
    oracle="""
    WITH agg AS (
        SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    ),
    b AS (SELECT min(CAST(o_orderdate AS DATE)) AS s,
                 max(CAST(o_orderdate AS DATE)) AS e FROM orders),
    dim AS (
        SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key,
               strftime(d, '%Y-%m-%d') AS date_str,
               dayname(d) AS day_name,
               CAST(year(d) AS INTEGER) AS year
        FROM (SELECT CAST(unnest(generate_series(s, e, INTERVAL 1 DAY)) AS DATE) AS d
              FROM b)
    )
    SELECT a.date_key, a.n_orders, a.revenue, m.date_str, m.day_name, m.year
    FROM agg a LEFT JOIN dim m ON a.date_key = m.date_key
    """,
)
def daily_sales_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: aggregate → LEFT join calendar dim to attach date attributes
    (reference agg_trips_daily.py:146-155). The dim is broadcast."""
    orders = table(spark, sf_dir, "orders")
    agg = orders.groupBy(
        date_str("o_orderdate", "yyyyMMdd").cast("int").alias("date_key")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("s"),
        F.max(F.to_date("o_orderdate")).alias("e"),
    )
    spine = bounds.select(
        F.explode(F.sequence("s", "e", F.expr("interval 1 day"))).alias("d")
    )
    dim = spine.select(
        date_str("d", "yyyyMMdd").cast("int").alias("date_key"),
        date_str("d").alias("date_str"),
        F.date_format("d", "EEEE").alias("day_name"),
        F.year("d").alias("year"),
    )
    return agg.join(F.broadcast(dim), "date_key", "left")


# ---------------------------------------------------------------------------
# 24. gdpr_subject_fingerprints — salted SHA-256 audit fingerprints
# ---------------------------------------------------------------------------
@register(
    "gdpr_subject_fingerprints",
    oracle="""
    SELECT DISTINCT user_id,
           sha256('pepper-42' || CAST(user_id AS VARCHAR)) AS subject_fingerprint
    FROM events
    WHERE event_type = 'error'
    """,
)
def gdpr_subject_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted SHA-256 subject fingerprints — the audit log never stores
    raw subject ids (reference gdpr_propagate_erasure.py:201-209)."""
    ev = table(spark, sf_dir, "events")
    subjects = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return subjects.select(
        "user_id",
        F.sha2(
            F.concat(F.lit("pepper-42"), F.col("user_id").cast("string")), 256
        ).alias("subject_fingerprint"),
    )


# ---------------------------------------------------------------------------
# 25. surrogate_keys_xxhash — the reference's exact xxhash64+pmod recipe
#     (rows-only: xxhash64 has no DuckDB twin; stability pinned in tests)
# ---------------------------------------------------------------------------
@register("surrogate_keys_xxhash", oracle=None)
def surrogate_keys_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact int surrogate key recipe:
    pmod(xxhash64(coalesce-string), 2147483646)+1
    (fact_payments.py:135, static/dim_payment.py:103-108). xxhash64 is
    Spark-specific, so this entry is rows-only for the driver;
    tests/test_functions.py pins the values against frozen constants."""
    from urban_mobility_data_pipeline_spark.functions.hashing import (
        surrogate_int_key,
    )

    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(F.lower(F.trim("o_orderpriority")).alias("priority"))
        .distinct()
        .select("priority", surrogate_int_key(["priority"]).alias("priority_key"))
    )


# ---------------------------------------------------------------------------
# 26. order_fulfilment_kpis — the reference's v_trip_kpis view
#     (db/mobility_oltp.sql:308-320): per-trip wait/duration seconds via
#     epoch subtraction. Our testdata has no trips table, so the analogue
#     is per-order: wait = first ship - order date, duration = shipping
#     span, both EXTRACT(EPOCH ...)-style BIGINT seconds, with the fare
#     passthrough the view keeps.
# ---------------------------------------------------------------------------
@register(
    "order_fulfilment_kpis",
    oracle="""
    SELECT o.o_orderkey,
           o.o_orderstatus,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d')  AS requested_at,
           strftime(s.first_ship, '%Y-%m-%d')                 AS started_at,
           strftime(s.last_ship, '%Y-%m-%d')                  AS ended_at,
           CAST(EXTRACT(EPOCH FROM (CAST(s.first_ship AS TIMESTAMP)
                - CAST(o.o_orderdate AS TIMESTAMP))) AS BIGINT) AS wait_time_sec,
           CAST(EXTRACT(EPOCH FROM (CAST(s.last_ship AS TIMESTAMP)
                - CAST(s.first_ship AS TIMESTAMP))) AS BIGINT)  AS trip_duration_sec,
           o.o_totalprice                                      AS fare_amount,
           s.n_lines
    FROM orders o
    JOIN (SELECT l_orderkey,
                 min(CAST(l_shipdate AS DATE)) AS first_ship,
                 max(CAST(l_shipdate AS DATE)) AS last_ship,
                 CAST(count(*) AS BIGINT)      AS n_lines
          FROM lineitem GROUP BY l_orderkey) s
      ON o.o_orderkey = s.l_orderkey
    """,
)
def order_fulfilment_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v_trip_kpis parity (reference db/mobility_oltp.sql:308-320):
    row-per-entity KPI projection with two epoch-second deltas. Scale
    shape: one partial-agg shuffle on the fact key, then an equi-join
    already co-partitioned on that key — no extra exchange."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    spans = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("first_ship"),
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    ordts = F.to_timestamp(F.col("o_orderdate"))
    first_ts = F.col("first_ship").cast("timestamp")
    last_ts = F.col("last_ship").cast("timestamp")
    return o.join(spans, o.o_orderkey == spans.l_orderkey).select(
        "o_orderkey",
        "o_orderstatus",
        date_str(F.col("o_orderdate")).alias("requested_at"),
        date_str(F.col("first_ship")).alias("started_at"),
        date_str(F.col("last_ship")).alias("ended_at"),
        (F.unix_timestamp(first_ts) - F.unix_timestamp(ordts)).alias(
            "wait_time_sec"
        ),
        (F.unix_timestamp(last_ts) - F.unix_timestamp(first_ts)).alias(
            "trip_duration_sec"
        ),
        F.col("o_totalprice").alias("fare_amount"),
        "n_lines",
    )


# ---------------------------------------------------------------------------
# 27-30. Consolidated driver-slot showcases (round 8, VERDICT r7 item 6).
#
# Each row below exercises SEVERAL already-attested SURVEY §2 primitives in
# one hash-checked query, so a single driver slot keeps the per-component
# ≥1-slot invariant while freeing slots for rotation. Component map:
#
#   scd_calendar_showcase          M11 SCD2 set-wise history (lead valid_to /
#                                  is_current), J7+W2 SCD3 current+prev,
#                                  §2.9 date spine (sequence+explode, EEEE),
#                                  U1 UNKNOWN dim row + orphan→UNKNOWN remap,
#                                  J5 broadcast calendar enrich join
#   conformance_masking_showcase   P4 casts, P5 null-like scrub, P6 domain
#                                  clamp→NULL, P7 case/space normalization,
#                                  P8 regex predicate, P9 DQ boolean flags,
#                                  P10 conditional redaction (M8 shape),
#                                  U2 unionByName fold to a common schema
#   watermark_retention_gdpr_showcase  P1/A4 global watermark bounds, P11/S11
#                                  retention age predicate, J6 GDPR subject
#                                  broadcast left-semi join, A2 exact
#                                  countDistinct, broadcast scalar crossJoin
#   star_latest_dim_showcase       W1 latest-per-key window dedup, J1 FK
#                                  validation orphan→0, J2 md5 surrogate key,
#                                  A3 dim build (groupBy max), S10/U1 UNKNOWN
#                                  dim row, broadcast dim joins
# ---------------------------------------------------------------------------
@register(
    "scd_calendar_showcase",
    oracle="""
    WITH hist AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               lead(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)            AS valid_to,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC)  AS rn
        FROM orders
    ),
    per_cust AS (
        SELECT o_custkey,
               max(CASE WHEN rn = 1 THEN o_orderkey END)   AS current_orderkey,
               max(CASE WHEN rn = 1 THEN o_totalprice END) AS current_totalprice,
               max(CASE WHEN rn = 1
                        THEN strftime(o_orderdate, '%Y-%m-%d') END)
                                                           AS current_valid_from,
               max(CASE WHEN rn = 2 THEN o_orderkey END)   AS prev_orderkey,
               max(CASE WHEN rn = 2 THEN o_totalprice END) AS prev_totalprice,
               count(*)                                    AS n_versions,
               CAST(sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT)                             AS n_closed_versions
        FROM hist GROUP BY 1
    ),
    b AS (SELECT max(CAST(o_orderdate AS DATE)) AS e FROM orders),
    dim AS (
        SELECT strftime(d, '%Y-%m-%d')                AS date_str,
               CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key,
               dayname(d)                             AS day_name,
               dayofweek(d) IN (0, 6)                 AS is_weekend
        FROM (SELECT CAST(unnest(generate_series(DATE '1996-01-01', e,
                                                 INTERVAL 1 DAY)) AS DATE) AS d
              FROM b)
        UNION ALL
        SELECT '1900-01-01', 0, 'UNKNOWN', false
    )
    SELECT p.o_custkey, p.current_orderkey, p.current_totalprice,
           p.current_valid_from, p.prev_orderkey, p.prev_totalprice,
           p.n_versions, p.n_closed_versions,
           m.date_key, m.day_name, m.is_weekend
    FROM per_cust p
    JOIN dim m ON m.date_str = CASE WHEN p.current_valid_from < '1996-01-01'
                                    THEN '1900-01-01'
                                    ELSE p.current_valid_from END
    """,
)
def scd_calendar_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated SCD showcase: SCD2 set-wise history (M11, reference
    silver/trips:347-432) + SCD3 current/prev rank pair (J7/W2,
    scd3/dim_passenger.py:63-95) from ONE windowed pass over orders, then
    a calendar-dim enrich join (J5, agg_trips_daily.py:146-155) against a
    sequence+explode spine carrying the U1 UNKNOWN row — currents older
    than the spine start remap to the UNKNOWN member (dim_date.py:150-159
    orphan semantics). One shuffle on o_custkey serves both windows and
    the groupBy; the dim is broadcast."""
    orders = table(spark, sf_dir, "orders")
    w_asc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_desc = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    hist = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lead("o_orderdate").over(w_asc).alias("valid_to"),
        F.row_number().over(w_desc).alias("rn"),
    )
    rn1 = F.col("rn") == 1
    rn2 = F.col("rn") == 2
    per_cust = hist.groupBy("o_custkey").agg(
        F.max(F.when(rn1, F.col("o_orderkey"))).alias("current_orderkey"),
        F.max(F.when(rn1, F.col("o_totalprice"))).alias("current_totalprice"),
        F.max(F.when(rn1, date_str("o_orderdate"))).alias("current_valid_from"),
        F.max(F.when(rn2, F.col("o_orderkey"))).alias("prev_orderkey"),
        F.max(F.when(rn2, F.col("o_totalprice"))).alias("prev_totalprice"),
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.when(F.col("valid_to").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_closed_versions"),
    )
    bounds = orders.agg(F.max(F.to_date("o_orderdate")).alias("e"))
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"), "e", F.expr("interval 1 day")
            )
        ).alias("d")
    )
    dim = spine.select(
        date_str("d").alias("date_str"),
        date_str("d", "yyyyMMdd").cast("int").alias("date_key"),
        F.date_format("d", "EEEE").alias("day_name"),
        F.dayofweek("d").isin(1, 7).alias("is_weekend"),
    )
    dim = with_unknown_row(
        dim,
        {
            "date_str": F.lit("1900-01-01"),
            "date_key": F.lit(0),
            "day_name": F.lit("UNKNOWN"),
            "is_weekend": F.lit(False),
        },
    )
    join_key = F.when(
        F.col("current_valid_from") < "1996-01-01", F.lit("1900-01-01")
    ).otherwise(F.col("current_valid_from"))
    return (
        per_cust.join(F.broadcast(dim), join_key == dim["date_str"], "inner")
        .select(
            "o_custkey",
            "current_orderkey",
            "current_totalprice",
            "current_valid_from",
            "prev_orderkey",
            "prev_totalprice",
            "n_versions",
            "n_closed_versions",
            "date_key",
            "day_name",
            "is_weekend",
        )
    )


@register(
    "conformance_masking_showcase",
    oracle=r"""
    SELECT 'order'                         AS entity,
           o_orderkey                      AS entity_key,
           CASE WHEN lower(trim(o_orderpriority)) IN
                     ('null','n/a','none','-','','4-not specified')
                THEN NULL ELSE lower(trim(o_orderpriority)) END AS attr_norm,
           upper(trim(o_orderstatus))      AS status_norm,
           CASE WHEN o_totalprice < 0 THEN NULL ELSE o_totalprice END AS amount,
           coalesce(o_totalprice < 0, true)                    AS flag_a,
           CASE WHEN lower(trim(o_orderpriority)) IN
                     ('null','n/a','none','-','','4-not specified')
                THEN true ELSE false END   AS flag_b,
           CAST(CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS VARCHAR)
                                           AS code
    FROM orders
    UNION ALL
    SELECT 'event', event_id, event_type,
           CAST(NULL AS VARCHAR),
           value,
           coalesce(value < 0 OR value > 10000, true),
           coalesce(NOT regexp_matches(props, '^\{.*\}$'), true),
           CAST(NULL AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'customer', c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'ANONYMIZED' ELSE c_name END,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END,
           c_acctbal,
           coalesce(c_acctbal < 0, true),
           false,
           'ANON-' || CAST(c_custkey AS VARCHAR)
    FROM customer
    """,
)
def conformance_masking_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated cleaning/DQ showcase: the full P4-P10 block from the
    reference's per-table withColumn chains (silver/trips:132-281,
    passengers:170-232) applied to three tables and unionByName-folded
    (U2) to one audit schema — P4 casts, P5 null-like scrub, P6 domain
    clamp→NULL, P7 lower/upper+trim, P8 regex predicate, P9 boolean DQ
    flags (rows never dropped), P10 conditional redaction with the
    deterministic ANON-<id> code. All three branches are map-side-only
    projections; the union adds no shuffle."""
    orders = table(spark, sf_dir, "orders")
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")

    pr = F.lower(F.trim(F.col("o_orderpriority")))
    pr_null = pr.isin("null", "n/a", "none", "-", "", "4-not specified")
    o_branch = orders.select(
        F.lit("order").alias("entity"),
        F.col("o_orderkey").alias("entity_key"),
        F.when(pr_null, F.lit(None)).otherwise(pr).alias("attr_norm"),
        F.upper(F.trim(F.col("o_orderstatus"))).alias("status_norm"),
        F.when(F.col("o_totalprice") < 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("amount"),
        F.coalesce(F.col("o_totalprice") < 0, F.lit(True)).alias("flag_a"),
        F.when(pr_null, F.lit(True)).otherwise(F.lit(False)).alias("flag_b"),
        date_str("o_orderdate", "yyyyMMdd").cast("int").cast("string").alias(
            "code"
        ),
    )
    flagged = dq_flags(
        ev,
        {
            "flag_a": F.coalesce(
                (F.col("value") < 0) | (F.col("value") > 10000), F.lit(True)
            ),
            "flag_b": F.coalesce(
                ~F.col("props").rlike(r"^\{.*\}$"), F.lit(True)
            ),
        },
    )
    e_branch = flagged.select(
        F.lit("event").alias("entity"),
        F.col("event_id").alias("entity_key"),
        F.col("event_type").alias("attr_norm"),
        F.lit(None).cast("string").alias("status_norm"),
        F.col("value").alias("amount"),
        "flag_a",
        "flag_b",
        F.lit(None).cast("string").alias("code"),
    )
    deleted = F.col("c_acctbal") < 0
    masked = redact_when(
        cust,
        deleted,
        set_values={"c_name": F.lit("ANONYMIZED")},
        null_cols=["c_mktsegment"],
    )
    c_branch = masked.select(
        F.lit("customer").alias("entity"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("attr_norm"),
        F.col("c_mktsegment").alias("status_norm"),
        F.col("c_acctbal").alias("amount"),
        F.coalesce(deleted, F.lit(True)).alias("flag_a"),
        F.lit(False).alias("flag_b"),
        F.concat(F.lit("ANON-"), F.col("c_custkey").cast("string")).alias(
            "code"
        ),
    )
    return o_branch.unionByName(e_branch).unionByName(c_branch)


@register(
    "watermark_retention_gdpr_showcase",
    oracle="""
    WITH kept AS (
        SELECT * FROM events
        WHERE epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-20')
    ),
    base AS (
        SELECT event_type,
               count(*)                AS n_kept,
               count(DISTINCT user_id) AS n_users_kept
        FROM kept GROUP BY 1
    ),
    aff AS (
        SELECT event_type, count(*) AS n_affected_kept
        FROM kept
        WHERE user_id IN (SELECT DISTINCT user_id FROM events
                          WHERE event_type = 'error')
        GROUP BY 1
    ),
    b AS (
        SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS wm_min_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS wm_max_ts,
               count(*)                               AS wm_rows
        FROM events
    )
    SELECT base.event_type, base.n_kept, base.n_users_kept,
           coalesce(aff.n_affected_kept, 0) AS n_affected_kept,
           b.wm_min_ts, b.wm_max_ts, b.wm_rows
    FROM base LEFT JOIN aff USING (event_type) CROSS JOIN b
    """,
)
def watermark_retention_gdpr_showcase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Consolidated incremental-read showcase: the P11/S11 retention age
    predicate (retention/bronze_retention_cleanup.py:59-67), the J6 GDPR
    subject broadcast left-semi join (gdpr_propagate_erasure.py:607-655),
    A2 exact countDistinct, and the A4 global watermark bounds
    (silver/trips:197-201) attached via a broadcast 1-row crossJoin —
    exactly how the engine's watermark read feeds its incremental plans
    (fact_trips.py:43-56). The retention filter reaches the parquet scan;
    the subject set and the bounds row are both broadcast."""
    ev = table(spark, sf_dir, "events")
    cutoff_us = 1_705_708_800_000_000  # 2024-01-20 UTC
    kept = ev.filter(F.col("ts_us") >= F.lit(cutoff_us))
    base = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.countDistinct("user_id").alias("n_users_kept"),
    )
    affected = (
        ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    )
    aff = (
        kept.join(F.broadcast(affected), "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_affected_kept"))
    )
    bounds = ev.agg(
        date_str(event_time(F.min("ts_us")), "yyyy-MM-dd HH:mm:ss").alias(
            "wm_min_ts"
        ),
        date_str(event_time(F.max("ts_us")), "yyyy-MM-dd HH:mm:ss").alias(
            "wm_max_ts"
        ),
        F.count(F.lit(1)).alias("wm_rows"),
    )
    joined = base.join(aff, "event_type", "left").withColumn(
        "n_affected_kept", F.coalesce(F.col("n_affected_kept"), F.lit(0))
    )
    return joined.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "n_kept",
        "n_users_kept",
        "n_affected_kept",
        "wm_min_ts",
        "wm_max_ts",
        "wm_rows",
    )


_PK_SHOWCASE = duck_md5_int_key("lower(trim(o_orderpriority))")
@register(
    "star_latest_dim_showcase",
    oracle=f"""
    WITH latest AS (
        SELECT * FROM orders
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    ),
    cdim AS (SELECT DISTINCT c_custkey FROM customer
             WHERE c_mktsegment <> 'BUILDING'),
    pdim AS (
        SELECT lower(trim(o_orderpriority)) AS priority,
               {_PK_SHOWCASE}               AS priority_key,
               strftime(max(o_orderdate), '%Y-%m-%d') AS last_seen
        FROM orders GROUP BY 1
        UNION ALL
        SELECT 'unknown', 0, NULL
    )
    SELECT l.o_custkey,
           l.o_orderkey                       AS latest_orderkey,
           strftime(l.o_orderdate, '%Y-%m-%d') AS order_date,
           CASE WHEN c.c_custkey IS NULL THEN 0 ELSE l.o_custkey END
                                              AS cust_key,
           c.c_custkey IS NULL                AS is_orphan,
           lower(trim(l.o_orderpriority))     AS priority,
           p.priority_key,
           p.last_seen
    FROM latest l
    LEFT JOIN cdim c ON l.o_custkey = c.c_custkey
    LEFT JOIN pdim p ON lower(trim(l.o_orderpriority)) = p.priority
    """,
)
def star_latest_dim_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated star-schema showcase: W1 latest-per-key window dedup
    (silver/trips:209-219), J1 FK validation with orphan→0 against a
    filtered customer dim (fact_trips.py:154-201), and a J2/A3 priority
    dim built in-flight (groupBy max last-seen, md5 surrogate key —
    portable twin of xxhash64+pmod, fact_payments.py:135) carrying the
    S10/U1 UNKNOWN row. Both dims are broadcast, so the fact path is one
    window shuffle on o_custkey and zero join shuffles."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    latest = latest_per_key(
        orders, keys=["o_custkey"], order_desc=["o_orderdate", "o_orderkey"]
    )
    cdim = cust.filter(F.col("c_mktsegment") != "BUILDING")
    validated = validate_fk(
        latest,
        cdim,
        fact_key="o_custkey",
        dim_key="c_custkey",
        out_col="cust_key",
        orphan_flag_col="is_orphan",
    )
    pr = F.lower(F.trim(F.col("o_orderpriority")))
    pdim = (
        orders.groupBy(pr.alias("priority"))
        .agg(date_str(F.max("o_orderdate")).alias("last_seen"))
        .select(
            "priority",
            md5_int_key(["priority"]).alias("priority_key"),
            "last_seen",
        )
    )
    pdim = with_unknown_row(
        pdim,
        {
            "priority": F.lit("unknown"),
            "priority_key": F.lit(0),
            "last_seen": F.lit(None).cast("string"),
        },
    )
    return (
        validated.withColumn("priority", pr)
        .join(F.broadcast(pdim), "priority", "left")
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            date_str("o_orderdate").alias("order_date"),
            "cust_key",
            "is_orphan",
            "priority",
            "priority_key",
            "last_seen",
        )
    )
