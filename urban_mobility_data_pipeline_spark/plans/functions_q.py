"""Scalar-function surface queries (SURVEY.md §2.9 breadth + the wider
function surface a complete engine needs). Each is a map-only projection
— the point is cross-engine-verified semantics for the function library,
not plan shape.

Two combined showcases (was five single-family ones — collapsed per
VERDICT r3 item 2 so they fit the driver's correctness-slot budget):

- ``doc_text_functions_showcase``: string + higher-order array surface
  over ``documents.text``.
- ``order_scalar_functions_showcase``: math + date arithmetic +
  conditional surface over ``orders``.
"""

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
    "doc_text_functions_showcase",
    oracle=r"""
    WITH t AS (SELECT doc_id, text, lang, source,
                      string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents)
    SELECT doc_id,
           -- string surface
           concat_ws('|', lang, source)                    AS lang_source,
           substring(text, 1, 12)                          AS prefix,
           lpad(CAST(doc_id AS VARCHAR), 8, '0')           AS padded_id,
           CAST(length(text) AS INTEGER)                   AS text_len,
           CAST(strpos(text, 'e') AS INTEGER)              AS first_e_pos,
           reverse(lang)                                   AS lang_rev,
           repeat(left(source, 1), 3)                      AS source_initial3,
           contains(lower(text), 'the')                    AS has_the_substr,
           replace(source, '-', '_')                       AS source_norm,
           -- higher-order array surface
           CAST(len(w) AS INTEGER)                         AS n_words,
           w[1]                                            AS first_word,
           w[-1]                                           AS last_word,
           array_to_string(list_sort(list_distinct(w[1:5])), ',') AS head_sorted,
           CAST(len(list_filter(w, x -> length(x) > 4)) AS INTEGER) AS n_long,
           list_contains(w, 'the')                         AS has_the_word,
           array_to_string(list_reverse(w[1:3]), ' ')      AS head_reversed
    FROM t
    """,
)
def doc_text_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat_ws/substring/lpad/length/instr/reverse/repeat/contains/
    replace + size/element_at/slice/array_sort/array_distinct/filter/
    array_contains/array_join — §2.9 string + higher-order array surface
    in one map-only projection."""
    d = table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("w"),
    )
    w = F.col("w")
    return staged.select(
        "doc_id",
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.substring("text", 1, 12).alias("prefix"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.length("text").cast("int").alias("text_len"),
        F.instr(F.col("text"), "e").cast("int").alias("first_e_pos"),
        F.reverse(F.col("lang")).alias("lang_rev"),
        F.repeat(F.substring("source", 1, 1), 3).alias("source_initial3"),
        F.contains(F.lower(F.col("text")), F.lit("the")).alias(
            "has_the_substr"
        ),
        F.replace(F.col("source"), F.lit("-"), F.lit("_")).alias(
            "source_norm"
        ),
        F.size(w).alias("n_words"),
        F.element_at(w, 1).alias("first_word"),
        F.element_at(w, -1).alias("last_word"),
        F.array_join(
            F.array_sort(F.array_distinct(F.slice(w, 1, 5))), ","
        ).alias("head_sorted"),
        F.size(F.filter(w, lambda x: F.length(x) > 4)).alias("n_long"),
        F.array_contains(w, "the").alias("has_the_word"),
        F.array_join(F.reverse(F.slice(w, 1, 3)), " ").alias("head_reversed"),
    )


@register(
    "order_scalar_functions_showcase",
    oracle="""
    SELECT o_orderkey,
           -- math surface
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
           least(o_totalprice, 300000.0)       AS capped_at_300k,
           -- date arithmetic surface
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3_months,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
           round(CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2002-01-01') AS BIGINT) / 30.4375, 4)
               AS approx_months_to_2002,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS day_of_year,
           -- conditional surface
           coalesce(nullif(o_orderstatus, 'O'), 'OTHER') AS status_or_other,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_band,
           if(o_totalprice >= 100000, 'big', 'small') AS size_flag,
           o_orderpriority IS NOT NULL AS has_priority
    FROM orders
    """,
)
def order_scalar_functions_showcase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """sqrt/ln/log10/pow/ceil/floor/sign/abs/mod/greatest/least +
    add_months/date_trunc/datediff/last_day/dayofyear +
    nullif/coalesce/case/if — §2.9 math + date + conditional surface in
    one map-only projection."""
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    d = F.to_date("o_orderdate")
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
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OTHER")
        ).alias("status_or_other"),
        F.when(p < 50000, "low")
        .when(p < 150000, "mid")
        .otherwise("high")
        .alias("price_band"),
        F.when(p >= 100000, "big").otherwise("small").alias("size_flag"),
        F.col("o_orderpriority").isNotNull().alias("has_priority"),
    )


@register(
    "event_regex_map_showcase",
    oracle=r"""
    SELECT event_id,
           -- regex surface
           regexp_extract(event_type, '^([a-z]+)', 1)        AS type_word,
           regexp_replace(event_type, '[aeiou]', '_', 'g')   AS devoweled,
           regexp_matches(event_type, '^(purchase|signup)$') AS is_conversion,
           -- map surface, derived from the JSON itself (mirrors Spark's
           -- from_json: NULL/malformed/non-object props -> NULL map)
           CASE WHEN json_valid(props) AND json_type(props::JSON) = 'OBJECT'
                THEN CAST(props->>'$.k' AS INTEGER) END      AS k_value,
           CASE WHEN json_valid(props) AND json_type(props::JSON) = 'OBJECT'
                THEN json_keys(props)[1] END                 AS first_key,
           CASE WHEN json_valid(props) AND json_type(props::JSON) = 'OBJECT'
                THEN CAST(len(json_keys(props)) AS INTEGER) END AS n_keys,
           -- struct surface
           event_type                                        AS s_type,
           CASE WHEN json_valid(props) AND json_type(props::JSON) = 'OBJECT'
                THEN CAST(props->>'$.k' AS INTEGER) * 2 END  AS s_doubled
    FROM events
    """,
)
def event_regex_map_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract/regexp_replace/rlike + from_json→map
    (map_keys/size/element_at) + named_struct field access — the
    regex/map/struct surface in one map-only projection."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    s = F.named_struct(
        F.lit("typ"), F.col("event_type"),
        F.lit("doubled"), F.element_at(m, "k") * 2,
    )
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("event_type"), r"^([a-z]+)", 1).alias(
            "type_word"
        ),
        F.regexp_replace(F.col("event_type"), "[aeiou]", "_").alias(
            "devoweled"
        ),
        F.col("event_type").rlike("^(purchase|signup)$").alias(
            "is_conversion"
        ),
        F.element_at(m, "k").alias("k_value"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.size(m).alias("n_keys"),
        s.getField("typ").alias("s_type"),
        s.getField("doubled").alias("s_doubled"),
    )


# ---------------------------------------------------------------------------
# event_scalar_union_showcase — U2 union fold + A6 distinct key-set with
# the §2.9 scalar surface projected off the distinct rows. Consolidates
# the slot coverage of union_distinct_customers (U2/A6),
# event_props_json (JSON extraction), event_regex_map_showcase
# (regex/map), and gdpr_subject_fingerprints (md5/sha2 hashes) into a
# single driver row so the round-7 rotation can seat 36 first-time
# entrants (VERDICT r6 item 1); each consolidated query keeps its own
# catalog entry, pytest-oracle row, and bench timing.
# ---------------------------------------------------------------------------
@register(
    "event_scalar_union_showcase",
    oracle=r"""
    WITH unioned AS (
        SELECT user_id, event_type,
               CASE WHEN json_valid(props) AND json_type(props::JSON) = 'OBJECT'
                    THEN CAST(props->>'$.k' AS INTEGER) END AS k_value
        FROM events WHERE event_type = 'purchase'
        UNION
        SELECT user_id, event_type,
               CASE WHEN json_valid(props) AND json_type(props::JSON) = 'OBJECT'
                    THEN CAST(props->>'$.k' AS INTEGER) END
        FROM events WHERE value >= 100
    )
    SELECT user_id, event_type, k_value,
           regexp_extract(event_type, '^([a-z]+)', 1)       AS type_word,
           regexp_replace(event_type, '[aeiou]', '_', 'g')  AS devoweled,
           upper(event_type || '#' ||
                 lpad(CAST(user_id AS VARCHAR), 8, '0'))    AS tag,
           CAST(user_id % 7 AS BIGINT)                      AS key_mod7,
           round(sqrt(CAST(user_id AS DOUBLE)), 6)          AS sqrt_user,
           CASE WHEN k_value IS NULL THEN 'none'
                WHEN k_value >= 5 THEN 'high'
                ELSE 'low' END                              AS k_band,
           md5(event_type || ':' || CAST(user_id AS VARCHAR))
               AS fp_md5,
           sha256('pepper-42' || event_type || ':' ||
                  CAST(user_id AS VARCHAR))                 AS fp_sha256
    FROM unioned
    """,
)
def event_scalar_union_showcase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """U2 unionByName fold of two overlapping event slices (reference
    gdpr:648-655 trip-id set union) → A6 distinct key-set over
    (user_id, event_type, JSON-extracted k) → §2.9 scalar projection
    (regex extract/replace, string upper/concat/lpad, math mod/sqrt,
    CASE conditional with NULL branch, md5 + salted sha2-256
    fingerprints). The JSON k rides the union so the distinct is a
    genuine three-part key-set; every scalar column is a pure function
    of the distinct keys, so projection after distinct is exact. Plan:
    two pushed-filter scans → union → one distinct shuffle → map-only
    projection."""
    ev = table(spark, sf_dir, "events")
    k = F.element_at(F.from_json(F.col("props"), "map<string,int>"), "k")
    a = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_type", k.alias("k_value")
    )
    b = ev.filter(F.col("value") >= 100).select(
        "user_id", "event_type", k.alias("k_value")
    )
    u = a.unionByName(b).distinct()
    uid_str = F.col("user_id").cast("string")
    return u.select(
        "user_id",
        "event_type",
        "k_value",
        F.regexp_extract(F.col("event_type"), r"^([a-z]+)", 1).alias(
            "type_word"
        ),
        F.regexp_replace(F.col("event_type"), "[aeiou]", "_").alias(
            "devoweled"
        ),
        F.upper(
            F.concat(
                F.col("event_type"), F.lit("#"), F.lpad(uid_str, 8, "0")
            )
        ).alias("tag"),
        (F.col("user_id") % 7).cast("long").alias("key_mod7"),
        F.round(F.sqrt(F.col("user_id").cast("double")), 6).alias(
            "sqrt_user"
        ),
        F.when(F.col("k_value").isNull(), "none")
        .when(F.col("k_value") >= 5, "high")
        .otherwise("low")
        .alias("k_band"),
        F.md5(F.concat(F.col("event_type"), F.lit(":"), uid_str)).alias(
            "fp_md5"
        ),
        F.sha2(
            F.concat(
                F.lit("pepper-42"),
                F.col("event_type"),
                F.lit(":"),
                uid_str,
            ),
            256,
        ).alias("fp_sha256"),
    )
