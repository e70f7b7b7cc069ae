"""Scalar-function surface queries (SURVEY.md §2.9 breadth + the wider
function surface a complete engine needs). Each is a map-only projection
— the point is cross-engine-verified semantics for the function library,
not plan shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.plans._helpers import date_str, table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@register(
    "string_functions_showcase",
    oracle="""
    SELECT c_custkey,
           concat_ws('|', c_name, c_mktsegment)        AS joined,
           substring(c_name, 1, 8)                     AS prefix,
           replace(c_name, 'Customer', 'Cust')         AS replaced,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')    AS padded,
           length(c_name)                              AS name_len,
           CAST(strpos(c_name, '#') AS INTEGER)        AS hash_pos,
           reverse(c_mktsegment)                       AS seg_rev,
           repeat(left(c_mktsegment, 1), 3)            AS initial3,
           contains(c_name, '1')                       AS has_one
    FROM customer
    """,
)
def string_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat_ws/substring/replace/lpad/length/instr/reverse/repeat/
    contains — §2.9 string surface and beyond."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "replaced"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.length("c_name").alias("name_len"),
        F.instr(F.col("c_name"), "#").cast("int").alias("hash_pos"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("initial3"),
        F.contains(F.col("c_name"), F.lit("1")).alias("has_one"),
    )


@register(
    "math_functions_showcase",
    oracle="""
    SELECT o_orderkey,
           round(sqrt(o_totalprice), 6)        AS sqrt_price,
           round(ln(o_totalprice), 6)          AS ln_price,
           round(log10(o_totalprice), 6)       AS log10_price,
           round(pow(o_totalprice, 0.25), 6)   AS price_4rt,
           CAST(ceil(o_totalprice) AS BIGINT)  AS ceil_price,
           CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
           CAST(sign(o_totalprice - 150000) AS INTEGER) AS above_150k,
           abs(o_totalprice - 150000)          AS dist_150k,
           CAST(o_orderkey % 7 AS BIGINT)      AS key_mod7,
           greatest(o_totalprice, 100000.0)    AS floored_at_100k,
           least(o_totalprice, 300000.0)       AS capped_at_300k
    FROM orders
    """,
)
def math_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt/ln/log10/pow/ceil/floor/sign/abs/mod/greatest/least."""
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.sqrt(p), 6).alias("sqrt_price"),
        F.round(F.log(p), 6).alias("ln_price"),
        F.round(F.log10(p), 6).alias("log10_price"),
        F.round(F.pow(p, 0.25), 6).alias("price_4rt"),
        F.ceil(p).cast("long").alias("ceil_price"),
        F.floor(p).cast("long").alias("floor_price"),
        F.signum(p - 150000).cast("int").alias("above_150k"),
        F.abs(p - 150000).alias("dist_150k"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod7"),
        F.greatest(p, F.lit(100000.0)).alias("floored_at_100k"),
        F.least(p, F.lit(300000.0)).alias("capped_at_300k"),
    )


@register(
    "array_functions_showcase",
    oracle=r"""
    WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents)
    SELECT doc_id,
           CAST(len(w) AS INTEGER)                          AS n_words,
           w[1]                                             AS first_word,
           w[-1]                                            AS last_word,
           array_to_string(list_sort(list_distinct(w[1:5])), ',') AS head_sorted,
           CAST(len(list_filter(w, x -> length(x) > 4)) AS INTEGER) AS n_long,
           list_contains(w, 'the')                          AS has_the,
           array_to_string(list_reverse(w[1:3]), ' ')       AS head_reversed
    FROM t
    """,
)
def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/array_sort/array_distinct/filter/
    array_contains/reverse/array_join — the higher-order array surface."""
    d = table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("w"),
    )
    w = F.col("w")
    return staged.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.element_at(w, 1).alias("first_word"),
        F.element_at(w, -1).alias("last_word"),
        F.array_join(
            F.array_sort(F.array_distinct(F.slice(w, 1, 5))), ","
        ).alias("head_sorted"),
        F.size(F.filter(w, lambda x: F.length(x) > 4)).alias("n_long"),
        F.array_contains(w, "the").alias("has_the"),
        F.array_join(F.reverse(F.slice(w, 1, 3)), " ").alias("head_reversed"),
    )


@register(
    "date_functions_showcase",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3_months,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
           round(CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2002-01-01') AS BIGINT) / 30.4375, 4)
               AS approx_months_to_2002,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS day_of_year
    FROM orders
    """,
)
def date_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_months/date_trunc/datediff/last_day/dayofyear — §2.9 date
    arithmetic surface (month arithmetic is what dim_date's consumers
    need)."""
    o = table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        date_str(F.add_months(d, 3)).alias("plus_3_months"),
        date_str(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        F.round(
            F.datediff(F.lit("2002-01-01").cast("date"), d).cast("long")
            / 30.4375,
            4,
        ).alias("approx_months_to_2002"),
        F.last_day(d).cast("string").alias("month_end"),
        F.dayofyear(d).cast("int").alias("day_of_year"),
    )


@register(
    "conditional_functions_showcase",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           if(c_acctbal >= 0, 'ok', 'review') AS review_flag,
           c_acctbal IS NOT NULL AS has_balance
    FROM customer
    """,
)
def conditional_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif/coalesce/multi-branch case/if — the conditional surface."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.when(bal < 0, "debt")
        .when(bal < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.when(bal >= 0, "ok").otherwise("review").alias("review_flag"),
        bal.isNotNull().alias("has_balance"),
    )
