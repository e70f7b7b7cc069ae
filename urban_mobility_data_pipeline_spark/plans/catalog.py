"""Unified query catalog: every implemented operator's query + oracle.

``QUERIES`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps name -> DuckDB SQL equivalent (omitted for genuinely
non-SQL-expressible ops, which the driver checks rows-only).
"""

from __future__ import annotations

from urban_mobility_data_pipeline_spark.plans import (
    analytics,
    functions_q,
    llm_ops,
    parity,
    streaming_q,
)

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

for _mod in (parity, llm_ops, analytics, functions_q, streaming_q):
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)

FLAGSHIP = "pricing_summary"

# ---------------------------------------------------------------------------
# Driver slots: the correctness driver records at most 50 rows, taken in
# dict order from __spark_entry__.queries(). Curate which 50 (VERDICT r3
# item 2): every SURVEY §2 component keeps at least one slot, the three
# temporal joins / rollup / sampling / streaming queries that previously
# fell past the cap get slots, and redundant or rows-only entries are
# covered by bench + tests/test_parity_oracle.py instead.
# ---------------------------------------------------------------------------
DRIVER_QUERY_NAMES: tuple[str, ...] = (
    # parity core (SURVEY §2 operator inventory)
    "pricing_summary",
    "latest_order_per_customer",
    "orders_conformed",
    "daily_sales_recompute",
    "orders_fk_validated",
    "customer_order_scd2_history",
    "customer_scd3_current_prev",
    "calendar_dim",
    "order_priority_dim",
    "watermark_bounds",
    "daily_user_activity",
    "error_user_activity",
    "customer_scd_hash",
    "incremental_order_slice",
    "events_dq_flags",
    "customers_masked",
    "events_retention_filter",
    "event_props_json",
    "union_distinct_customers",
    "user_session_windows",
    "daily_sales_calendar",
    "order_fulfilment_kpis",
    # LLM-pipeline extensions
    "dedup_exact_docs",
    "doc_minhash_signatures",
    "doc_lsh_band_keys",
    "doc_near_dup_pairs",
    "doc_simhash",
    "embedding_cosine_topk",
    "embedding_ann_buckets",
    "doc_lang_id",
    "doc_quality_scores",
    "doc_token_counts",
    "doc_fingerprints",
    "embedding_near_dup_pairs",
    "doc_dup_clusters",
    "documents_train_test_split",
    "documents_stratified_sample",
    # analytics / temporal
    "revenue_by_region",
    "order_rollup_totals",
    "order_value_percentiles",
    "priority_status_pivot",
    "nation_customer_supplier_overlap",
    "customer_only_nations",
    "events_asof_prior_purchase",
    "events_range_join_error_counts",
    "events_interval_join_purchases",
    "daily_event_rollup_from_hourly",
    # scalar-function surface
    "doc_text_functions_showcase",
    "order_scalar_functions_showcase",
    # structured streaming (real readStream execution)
    "streaming_hourly_event_counts",
)

assert len(DRIVER_QUERY_NAMES) == 50, len(DRIVER_QUERY_NAMES)
_missing = [n for n in DRIVER_QUERY_NAMES if n not in QUERIES]
assert not _missing, f"driver slots name unknown queries: {_missing}"

DRIVER_QUERIES: dict = {n: QUERIES[n] for n in DRIVER_QUERY_NAMES}
DRIVER_ORACLES: dict[str, str] = {
    n: ORACLES[n] for n in DRIVER_QUERY_NAMES if n in ORACLES
}
