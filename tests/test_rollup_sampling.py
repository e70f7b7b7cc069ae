"""Rollup cascade decomposability + deterministic split stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.sampling import (
    deterministic_sample,
    fingerprint_bucket,
    train_test_split,
)
from urban_mobility_data_pipeline_spark.operators.rollup import (
    cascade,
    finalize,
    partial_rollup,
)


def test_cascade_equals_direct_aggregation(spark):
    rows = [(i, i % 3, float(i * 7 % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "ts long, k int, v double")
    hourly = partial_rollup(df, ts="ts", grain=10, keys=["k"], measures=["v"])
    daily = cascade(hourly, grain=50, keys=["k"], measures=["v"])
    got = finalize(daily, keys=["k"], measures=["v"])
    direct = df.groupBy(
        (F.col("ts") - F.col("ts") % 50).alias("bucket"), "k"
    ).agg(
        F.count("v").alias("n_v"),
        F.round(F.sum("v"), 2).alias("total_v"),
        F.round(F.min("v"), 2).alias("min_v"),
        F.round(F.max("v"), 2).alias("max_v"),
    )
    g = {(r["bucket"], r["k"]): (r["n_v"], r["total_v"], r["min_v"], r["max_v"])
         for r in got.collect()}
    d = {(r["bucket"], r["k"]): (r["n_v"], r["total_v"], r["min_v"], r["max_v"])
         for r in direct.collect()}
    assert g == d


def test_split_is_partition_layout_independent(spark):
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(500)], "doc_id long, t string"
    )
    a = {
        (r["doc_id"], r["split"])
        for r in train_test_split(df, key="doc_id").collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in train_test_split(
            df.repartition(17, "t"), key="doc_id"
        ).collect()
    }
    assert a == b
    frac_test = sum(1 for _, s in a if s == "test") / len(a)
    assert 0.1 < frac_test < 0.3  # ~20% by uniform fingerprint


def test_deterministic_sample_is_subset_and_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    s1 = {r["k"] for r in deterministic_sample(df, key="k", pct=10).collect()}
    s2 = {r["k"] for r in deterministic_sample(df, key="k", pct=30).collect()}
    assert s1 <= s2  # widening pct only adds rows (bucket monotonicity)
    assert 0.05 < len(s1) / 1000 < 0.15


def test_fingerprint_bucket_range(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "k long")
    mn, mx = (
        df.select(
            F.min(fingerprint_bucket("k", 7)), F.max(fingerprint_bucket("k", 7))
        ).collect()[0]
    )
    assert mn >= 0 and mx <= 6


def test_hll_sketch_cascade_within_tolerance(spark, sf_dir):
    """Daily distinct users derived by unioning hourly HLL sketches must
    track the exact daily distinct count (non-algebraic aggregate made
    cascade-safe via mergeable sketch states)."""
    from urban_mobility_data_pipeline_spark.operators.rollup import (
        sketch_cascade,
        sketch_estimate,
        sketch_rollup,
    )
    from urban_mobility_data_pipeline_spark.plans._helpers import table

    hour_us = 3600 * 1_000_000
    day_us = 24 * hour_us
    ev = table(spark, sf_dir, "events")
    hourly = sketch_rollup(
        ev, ts="ts_us", grain=hour_us, keys=[], distinct_cols=["user_id"]
    )
    daily = sketch_cascade(
        hourly, grain=day_us, keys=[], distinct_cols=["user_id"]
    )
    got = {
        r["bucket"]: r["approx_distinct_user_id"]
        for r in sketch_estimate(daily, distinct_cols=["user_id"]).collect()
    }
    exact = {
        r["bucket"]: r["exact"]
        for r in ev.groupBy(
            ((ev.ts_us - ev.ts_us % day_us)).alias("bucket")
        )
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for b, est in got.items():
        assert abs(est - exact[b]) / max(exact[b], 1) < 0.05, (b, est, exact[b])


def test_stratified_sample_deterministic_and_balanced(spark, sf_dir):
    from urban_mobility_data_pipeline_spark.extensions.sampling import (
        stratified_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = stratified_sample(
        docs, key="doc_id", strata_col="lang",
        fractions={"en": 25}, default_pct=75,
    )
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # identical membership under a different partition layout
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(13), key="doc_id", strata_col="lang",
            fractions={"en": 25}, default_pct=75,
        ).select("doc_id").collect()
    }
    assert ids == ids2
    # strata are actually sampled at different rates
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["en"] / tot["en"] < 0.45
    assert all(got[lg] / tot[lg] > 0.55 for lg in tot if lg != "en")
