"""Bucketed co-located joins: the join plan must contain no Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.sources.files import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    o = spark.table("orders_b")
    l = spark.table("lineitem_b")
    joined = o.join(l, o["o_orderkey"] == l["l_orderkey"]).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    # disable broadcast so the bucketing is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # correctness unchanged
        total = joined.agg(F.sum("n")).first()[0]
        assert total == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
