#!/usr/bin/env python
"""End-to-end domain throughput anchor (README "Throughput anchor").

Generates the reference generator's full run volume in-memory
(BASELINE.md: 10,000 trips + 2,000 passengers + 500 drivers + 500
vehicles + zones per batch, 4,000-row churn batch), then times the
complete lifecycle on a tmp lake:

    bronze ingest (5 tables) → silver SCD2 (clean/dedup/flags/hash/
    merge) → churn batch (bronze+silver again) → gold (dim_zone,
    dim_passenger snapshot/hist/scd3, fact_trips, agg_trips_daily,
    agg_driver_daily)

Prints ONE JSON line: {"metric": "domain_wall_sec", "value": N,
"unit": "sec", "stages": {...}}. Compare against the reference's 30
sequential spark-submit JVM launches of the same volume.

Extra sections (VERDICT r4 items 3 and 6):

- ``--skew``: hot-key proof under data — one user holds 30% of a 16M-row
  event table; measures the naive sort-merge join / exact
  count-distinct against ``operators.skew``'s salted variants (AQE off,
  broadcast off, best-of-2) and asserts (a) the salted layout's max
  post-shuffle task input undercuts the naive layout's by ≥2.5×
  (deterministic — this is the property that matters at 100 TB, where
  the hot task is an executor OOM, not a slow local thread) and (b) the
  naive/salted join wall-clock ratio ≥ 1.2.
- ``--soak``: 10× the anchor volume (100k trips) + 3 identical
  incremental churn→silver→gold cycles; asserts the per-cycle latency
  stays flat (last ≤ 1.6 × first) — the materialized-rounds /
  file-pruned-MERGE design must not accrete per-cycle cost.
- ``--corpus``: corpus-lakehouse throughput — a 50k-doc synthetic crawl
  feed (deterministic word salad, ~1% dups, ~1% PII, ~0.5% malformed)
  through ingest (quarantine+gates+redaction+MERGE), a 10% incremental
  cycle, and the gates→dedup→packing manifest over the stored corpus.
- ``--all``: run every section and write the committed
  ``BENCH_DOMAIN_r{N}.json`` artifact.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.domain import config as C
from urban_mobility_data_pipeline_spark.domain import jobs as J

D0 = dt.datetime(2024, 3, 1, 8, 0)
D1 = dt.datetime(2024, 3, 1, 9, 0)
D2 = dt.datetime(2024, 3, 2, 9, 0)

N_TRIPS, N_PASS, N_DRV, N_VEH, N_ZONES = 10_000, 2_000, 500, 500, 50
N_CHURN = 4_000


def _ts(base: dt.datetime, offset_col) -> F.Column:
    return F.lit(base).cast("timestamp") + F.make_interval(secs=offset_col)


def gen_trips(
    spark: SparkSession,
    n: int,
    start_id: int,
    upd: dt.datetime,
    n_pass: int = N_PASS,
    n_drv: int = N_DRV,
    n_veh: int = N_VEH,
) -> DataFrame:
    """Reference-generator-shaped trips (scripts/generate_oltp_data:
    statuses, coords, distances, fares), built JVM-side via range()."""
    r = spark.range(start_id, start_id + n).withColumnRenamed("id", "trip_id")
    h = F.abs(F.xxhash64("trip_id"))
    status = (
        F.when(h % 10 < 7, "completed")
        .when(h % 10 < 9, "canceled")
        .otherwise("requested")
    )
    t0 = _ts(D0, (F.col("trip_id") % 3600).cast("double"))
    return r.select(
        "trip_id",
        (h % n_pass + 1).alias("passenger_id"),
        (h % n_drv + 1).alias("driver_id"),
        (h % n_veh + 1).alias("vehicle_id"),
        (h % N_ZONES + 1).alias("pickup_zone_id"),
        ((h + 7) % N_ZONES + 1).alias("dropoff_zone_id"),
        status.alias("status"),
        t0.alias("requested_at"),
        (t0 + F.make_interval(secs=F.lit(120.0))).alias("accepted_at"),
        (t0 + F.make_interval(secs=F.lit(300.0))).alias("started_at"),
        F.when(
            status == "completed", t0 + F.make_interval(secs=F.lit(1500.0))
        ).alias("ended_at"),
        F.lit(None).cast("timestamp").alias("canceled_at"),
        F.lit(None).cast("string").alias("cancel_reason"),
        F.lit(None).cast("string").alias("cancel_by"),
        F.when(h % 20 == 0, "  NULL ").alias("cancel_note"),
        ((h % 200).cast("double") / 10).alias("estimated_distance_km"),
        F.when(h % 17 != 0, (h % 220).cast("double") / 10).alias(
            "actual_distance_km"
        ),
        F.when(h % 50 == 0, -5.0)
        .otherwise((h % 500).cast("double") / 10 + 3)
        .alias("fare_amount"),
        (F.lit(41.0) + (h % 100).cast("double") / 1000).alias("start_lat"),
        (F.lit(2.0) + (h % 100).cast("double") / 1000).alias("start_lng"),
        (F.lit(41.1) + (h % 100).cast("double") / 1000).alias("end_lat"),
        (F.lit(2.1) + (h % 100).cast("double") / 1000).alias("end_lng"),
        F.lit(D0).cast("timestamp").alias("created_at"),
        F.lit(upd).cast("timestamp").alias("updated_at"),
    )


def gen_passengers(spark, n, upd):
    r = spark.range(1, n + 1).withColumnRenamed("id", "passenger_id")
    return r.select(
        "passenger_id",
        F.concat(F.lit("Passenger "), F.col("passenger_id")).alias("full_name"),
        F.concat(F.lit("p"), F.col("passenger_id"), F.lit("@example.com")).alias("email"),
        F.concat(F.lit("+1555"), F.lpad(F.col("passenger_id").cast("string"), 7, "0")).alias("phone"),
        F.element_at(
            F.array(F.lit("Rome"), F.lit("Oslo"), F.lit("Bern"), F.lit("Riga")),
            (F.col("passenger_id") % 4 + 1).cast("int"),
        ).alias("city"),
        (F.col("passenger_id") % 97 == 0).alias("is_deleted"),
        F.when(F.col("passenger_id") % 97 == 0, F.lit(D0).cast("timestamp")).alias("deleted_at"),
        F.lit(D0).cast("timestamp").alias("created_at"),
        F.lit(upd).cast("timestamp").alias("updated_at"),
    )


def gen_drivers(spark, n, upd):
    r = spark.range(1, n + 1).withColumnRenamed("id", "driver_id")
    return r.select(
        "driver_id",
        F.concat(F.lit("Driver "), F.col("driver_id")).alias("full_name"),
        F.concat(F.lit("LIC-"), F.col("driver_id")).alias("license_number"),
        F.element_at(
            F.array(F.lit("active"), F.lit("active"), F.lit("inactive"), F.lit("suspended")),
            (F.col("driver_id") % 4 + 1).cast("int"),
        ).alias("status"),
        F.lit(False).alias("is_deleted"),
        F.lit(D0).cast("timestamp").alias("created_at"),
        F.lit(upd).cast("timestamp").alias("updated_at"),
    )


def gen_vehicles(spark, n, upd, n_drv: int = N_DRV):
    r = spark.range(1, n + 1).withColumnRenamed("id", "vehicle_id")
    return r.select(
        "vehicle_id",
        (F.col("vehicle_id") % n_drv + 1).alias("driver_id"),
        F.concat(F.lit("PL"), F.lpad(F.col("vehicle_id").cast("string"), 5, "0")).alias("plate_number"),
        F.lit("sedan").alias("vehicle_type"),
        F.element_at(
            F.array(F.lit("Toyo"), F.lit("Ford"), F.lit("VW")),
            (F.col("vehicle_id") % 3 + 1).cast("int"),
        ).alias("make"),
        F.concat(F.lit("M"), (F.col("vehicle_id") % 9)).alias("model"),
        (F.lit(2015) + (F.col("vehicle_id") % 10)).cast("int").alias("year"),
        F.lit("active").alias("status"),
        F.lit(D0).cast("timestamp").alias("created_at"),
        F.lit(upd).cast("timestamp").alias("updated_at"),
    )


def gen_zones(spark, n):
    r = spark.range(1, n + 1).withColumnRenamed("id", "zone_id")
    return r.select(
        "zone_id",
        F.concat(F.lit("Zone "), F.col("zone_id")).alias("zone_name"),
        F.lit("Rome").alias("city"),
        F.lit("EU").alias("region"),
        F.lit(D0).cast("timestamp").alias("created_at"),
    )


def run_anchor(spark: SparkSession) -> dict:
    """Reference-volume lifecycle (the original anchor)."""
    root = tempfile.mkdtemp(prefix="umdp_domain_bench_")
    lake = J.Lakehouse(spark, root)
    stages: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        stages[name] = round(time.perf_counter() - t0, 2)

    batch1 = {
        "trips": gen_trips(spark, N_TRIPS, 1, D1),
        "passengers": gen_passengers(spark, N_PASS, D1),
        "drivers": gen_drivers(spark, N_DRV, D1),
        "vehicles": gen_vehicles(spark, N_VEH, D1),
        "zones": gen_zones(spark, N_ZONES),
    }
    t_start = time.perf_counter()
    timed("bronze_batch1", lambda: [
        J.bronze_ingest(lake, C.ALL_TABLES[t], df, now=D1)
        for t, df in batch1.items()
    ])
    timed("silver_batch1", lambda: [
        J.silver_apply(lake, C.ALL_TABLES[t]) for t in batch1
    ])
    # churn: 2,000 updated trips + 2,000 brand-new
    churn = gen_trips(spark, N_CHURN // 2, 1, D2).unionByName(
        gen_trips(spark, N_CHURN // 2, N_TRIPS + 1, D2)
    )
    timed("bronze_churn", lambda: J.bronze_ingest(lake, C.TRIPS, churn, now=D2))
    timed("silver_churn", lambda: J.silver_apply(lake, C.TRIPS))
    timed("gold_dims", lambda: [
        J.build_static_dim(
            lake, "dim_zone",
            J.silver_current(lake, "zones").select("zone_id", "zone_name", "city", "region"),
        ),
        J.build_snapshot_dim(lake, C.PASSENGERS, "dim_passenger"),
        J.build_hist_dim(lake, C.PASSENGERS, "dim_passenger_hist"),
        J.build_scd3_dim(lake, C.PASSENGERS, "dim_passenger_scd3",
                         ["full_name", "email", "city"]),
    ])
    timed("gold_fact", lambda: J.build_fact_trips(lake))
    timed("gold_aggs", lambda: [
        J.build_agg_trips_daily(lake),
        J.build_agg_driver_daily(lake),
    ])
    total = round(time.perf_counter() - t_start, 2)

    n_fact = lake.table("gold", "fact_trips").read().count()
    assert n_fact >= N_TRIPS, n_fact
    shutil.rmtree(root, ignore_errors=True)
    return {
        "metric": "domain_wall_sec",
        "value": total,
        "unit": "sec",
        "stages": stages,
        "fact_rows": n_fact,
    }


SKEW_N = 16_000_000
SKEW_HOT_FRAC = 0.3
SKEW_USERS = 50_000
SKEW_BUCKETS = 32


def run_skew(spark: SparkSession) -> dict:
    """Hot-key proof under data (VERDICT r4 item 3): one user holds 30%
    of 16M events. AQE and auto-broadcast are disabled so the naive
    plan is the genuine one-task-gets-the-hot-key sort-merge join /
    exact count-distinct; best-of-2 timings filter shared-VM noise. The
    deterministic teeth: max post-shuffle task input, naive vs salted
    layout — the number that decides executor OOM at 100 TB."""
    from urban_mobility_data_pipeline_spark.operators.skew import (
        SALT_COL,
        _row_salt,
        salted_count_distinct,
        salted_join,
    )

    h = F.abs(F.xxhash64("id"))
    ev = (
        spark.range(SKEW_N)
        .select(
            F.when(F.col("id") < int(SKEW_N * SKEW_HOT_FRAC), F.lit(0))
            .otherwise(h % SKEW_USERS + 1)
            .alias("user_id"),
            (h % 1_000_000).alias("item_id"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        .repartition(8)
        .persist()
    )
    ev.count()
    dim = (
        spark.range(SKEW_USERS + 1)
        .select(
            F.col("id").alias("user_id"), (F.col("id") % 5).alias("tier")
        )
        .persist()
    )
    dim.count()

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def best_of(fn, n: int = 3) -> float:
            # n=3: run 1 absorbs codegen warmup, min of the rest
            # estimates true cost under shared-VM contention
            runs = []
            for _ in range(n):
                t0 = time.perf_counter()
                fn()
                runs.append(time.perf_counter() - t0)
            return round(min(runs), 2)

        def naive_join():
            ev.join(dim, "user_id").agg(
                F.sum(F.col("value") * F.col("tier"))
            ).collect()

        def s_join():
            salted_join(ev, dim, ["user_id"], buckets=SKEW_BUCKETS).agg(
                F.sum(F.col("value") * F.col("tier"))
            ).collect()

        def naive_cd():
            ev.groupBy("user_id").agg(
                F.countDistinct("item_id").alias("nd")
            ).agg(F.sum("nd")).collect()

        def s_cd():
            salted_count_distinct(ev, ["user_id"], "item_id").agg(
                F.sum("n_distinct")
            ).collect()

        # the SAME attempt count for both sides, unconditionally
        # (ADVICE r10): the old shape re-ran best-of-5 only when the
        # first measurement LOST, which biases the recorded speedup
        # (and win rate) upward — a retry policy conditioned on the
        # outcome is a one-sided filter even when the loss flag stays
        # honest. 5 warm attempts each, min taken, no outcome-dependent
        # reruns anywhere.
        out = {
            "metric": "skew_proof",
            "rows": SKEW_N,
            "hot_frac": SKEW_HOT_FRAC,
            "buckets": SKEW_BUCKETS,
            "join_naive_sec": best_of(naive_join, 5),
            "join_salted_sec": best_of(s_join, 5),
            "count_distinct_naive_sec": best_of(naive_cd, 2),
            "count_distinct_salted_sec": best_of(s_cd, 2),
        }

        # deterministic max-task-input bound: shuffle the event table by
        # the naive key vs (key, per-row salt) and compare the largest
        # post-shuffle partition — the hot task's input
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

        def max_part(df, *cols) -> int:
            return (
                df.repartition(n_shuffle, *cols)
                .withColumn("__p", F.spark_partition_id())
                .groupBy("__p")
                .count()
                .agg(F.max("count"))
                .first()[0]
            )

        out["max_task_rows_naive"] = max_part(ev, "user_id")
        out["max_task_rows_salted"] = max_part(
            ev.withColumn(SALT_COL, _row_salt(["user_id"], SKEW_BUCKETS)),
            "user_id",
            SALT_COL,
        )
        bound_ratio = out["max_task_rows_naive"] / out["max_task_rows_salted"]
        out["max_task_bound_ratio"] = round(bound_ratio, 2)
        out["join_speedup"] = round(
            out["join_naive_sec"] / max(out["join_salted_sec"], 1e-9), 2
        )
        # wall clock is shared-VM-weather-dependent (historical wins
        # 1.23-1.49x; one contended host run measured 0.7x with the
        # identical plan). The recorded ratio is now UNBIASED — same
        # best-of-5 for both sides, no outcome-conditioned reruns
        # (ADVICE r10) — and the win flag reports whatever it reports;
        # the HARD gate below stays the deterministic max-task-input
        # bound, the number that decides executor OOM/straggler at
        # 100 TB. The count-distinct wall has never been gated for the
        # same reason (salting pays extra local-mode work for the
        # bounded task).
        out["join_wall_win"] = out["join_speedup"] >= 1.2
        # the committed floor: salting must bound the hot task's input
        # by a wide margin — deterministic, load-independent
        assert bound_ratio >= 2.5, out

        # 10x-rows rider (VERDICT r11 item 7): at 16M rows the salted
        # join's wall win is weather-sized (the hot task's 4.8M rows
        # still fit one local thread comfortably); this measures the
        # same plans at 160M rows / 48M-row hot key — where the single
        # hot sort-merge task becomes the stage — so the committed
        # artifact records where wall-clock crossover actually lands
        # locally instead of extrapolating. Both sides best-of-2 (same
        # attempt count, no outcome-conditioned reruns — the unbiased
        # r11 protocol).
        from pyspark import StorageLevel

        h10 = F.abs(F.xxhash64("id"))
        ev10 = (
            spark.range(SKEW_N * 10)
            .select(
                F.when(
                    F.col("id") < int(SKEW_N * 10 * SKEW_HOT_FRAC),
                    F.lit(0),
                )
                .otherwise(h10 % SKEW_USERS + 1)
                .alias("user_id"),
                (h10 % 1_000_000).alias("item_id"),
                (F.col("id") % 1000).cast("double").alias("value"),
            )
            .repartition(64)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        ev10.count()
        try:
            def naive_join_10x():
                ev10.join(dim, "user_id").agg(
                    F.sum(F.col("value") * F.col("tier"))
                ).collect()

            def s_join_10x():
                salted_join(
                    ev10, dim, ["user_id"], buckets=SKEW_BUCKETS
                ).agg(F.sum(F.col("value") * F.col("tier"))).collect()

            out["rows_10x"] = SKEW_N * 10
            out["join_naive_sec_10x"] = best_of(naive_join_10x, 2)
            out["join_salted_sec_10x"] = best_of(s_join_10x, 2)
            out["join_speedup_10x"] = round(
                out["join_naive_sec_10x"]
                / max(out["join_salted_sec_10x"], 1e-9),
                2,
            )
        finally:
            ev10.unpersist()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        ev.unpersist()
        dim.unpersist()
    return out


def run_soak(spark: SparkSession, scale: int = 10, cycles: int = 3) -> dict:
    """10× volume + repeated identical incremental cycles (VERDICT r4
    item 6): per-cycle latency must stay flat — the log-backed MERGE
    prunes by watermark/partition, so cycle N must not pay for cycles
    1..N-1's accumulated history."""
    import resource

    n_trips = N_TRIPS * scale
    n_pass, n_drv, n_veh = N_PASS * scale, N_DRV * scale, N_VEH * scale
    n_churn = N_CHURN * scale
    root = tempfile.mkdtemp(prefix="umdp_domain_soak_")
    lake = J.Lakehouse(spark, root)
    try:
        t0 = time.perf_counter()
        batch1 = {
            "trips": gen_trips(spark, n_trips, 1, D1, n_pass, n_drv, n_veh),
            "passengers": gen_passengers(spark, n_pass, D1),
            "drivers": gen_drivers(spark, n_drv, D1),
            "vehicles": gen_vehicles(spark, n_veh, D1, n_drv),
            "zones": gen_zones(spark, N_ZONES),
        }
        for t, df in batch1.items():
            J.bronze_ingest(lake, C.ALL_TABLES[t], df, now=D1)
        for t in batch1:
            J.silver_apply(lake, C.ALL_TABLES[t])
        J.build_fact_trips(lake)
        J.build_agg_trips_daily(lake)
        J.build_agg_driver_daily(lake)
        initial_sec = round(time.perf_counter() - t0, 2)

        cycle_secs: list[float] = []
        next_new_id = n_trips + 1
        for c in range(cycles):
            when = D2 + dt.timedelta(days=c)
            churn = gen_trips(
                spark, n_churn // 2, 1 + c * 1000, when, n_pass, n_drv, n_veh
            ).unionByName(
                gen_trips(
                    spark, n_churn // 2, next_new_id, when, n_pass, n_drv, n_veh
                )
            )
            next_new_id += n_churn // 2
            t0 = time.perf_counter()
            J.bronze_ingest(lake, C.TRIPS, churn, now=when)
            J.silver_apply(lake, C.TRIPS)
            J.build_fact_trips(lake)
            J.build_agg_trips_daily(lake)
            J.build_agg_driver_daily(lake)
            cycle_secs.append(round(time.perf_counter() - t0, 2))

        n_fact = lake.table("gold", "fact_trips").read().count()
        assert n_fact >= n_trips, n_fact
        out = {
            "metric": "domain_soak",
            "scale": scale,
            "trips": n_trips,
            "initial_load_sec": initial_sec,
            "cycle_secs": cycle_secs,
            "fact_rows": n_fact,
            # Python driver process only — the JVM is a child process;
            # cycle-latency flatness is the actual no-accretion signal
            "python_peak_rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
            ),
        }
        # flatness: an identical churn cycle must not get slower as
        # history accumulates (1.6 allows shared-VM noise, not growth)
        assert cycle_secs[-1] <= cycle_secs[0] * 1.6, out
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    args = set(sys.argv[1:])
    run_all = "--all" in args
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from urban_mobility_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="umdp-domain-bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus), 8)),
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("WARN")

    sections: dict[str, dict] = {}
    if run_all or not (
        args
        & {"--skew", "--soak", "--corpus", "--compaction", "--bloom",
           "--dedupindex", "--kmeans", "--scaling", "--bq", "--semdedup",
           "--replicate", "--bm25index", "--dv", "--bpe",
           "--bpe-divergence", "--dedupindex10x", "--bm25index10x",
           "--dedupindex-zipf", "--bm25index-zipf", "--embingest-zipf",
           "--quality-lifecycle"}
    ):
        sections["anchor"] = run_anchor(spark)
    if run_all or "--skew" in args:
        sections["skew"] = run_skew(spark)
    if run_all or "--soak" in args:
        sections["soak"] = run_soak(spark)
    if run_all or "--corpus" in args:
        sections["corpus"] = run_corpus(spark)
    if run_all or "--compaction" in args:
        sections["compaction"] = run_compaction_soak(spark)
    if run_all or "--bloom" in args:
        sections["bloom"] = run_bloom_pointops(spark)
    if run_all or "--dedupindex" in args:
        sections["dedup_index"] = run_dedup_index_soak(spark)
    if run_all or "--dedupindex10x" in args:
        sections["dedup_index_10x"] = run_dedup_index_soak_10x(spark)
    if run_all or "--bm25index" in args:
        sections["bm25_index"] = run_bm25_index_soak(spark)
    if run_all or "--bm25index10x" in args:
        sections["bm25_index_10x"] = run_bm25_index_soak_10x(spark)
    if run_all or "--dedupindex-zipf" in args:
        sections["dedup_index_zipf"] = run_dedup_index_soak_zipf(spark)
    if run_all or "--bm25index-zipf" in args:
        sections["bm25_index_zipf"] = run_bm25_index_soak_zipf(spark)
    if run_all or "--embingest-zipf" in args:
        sections["embedding_ingest_zipf"] = run_embedding_ingest_soak_zipf(
            spark
        )
    if run_all or "--quality-lifecycle" in args:
        sections["quality_lifecycle"] = run_quality_lifecycle(spark)
    if run_all or "--dv" in args:
        sections["dv_pointops"] = run_dv_pointops(spark)
        sections["dv_erasure_soak"] = run_dv_erasure_soak(spark)
        sections["dv_clustered_erasure"] = run_dv_clustered_erasure(spark)
    if run_all or "--semdedup" in args:
        sections["semdedup_probe"] = run_semdedup_probe(spark)
    if run_all or "--bq" in args:
        sections["bq_scan"] = run_bq_scan(spark)
    if run_all or "--replicate" in args:
        sections["replicate"] = run_replicate(spark)
    if run_all or "--scaling" in args:
        sections["corpus_scaling"] = run_scaling(spark)
    if run_all or "--kmeans" in args:
        sections["kmeans_scale"] = run_kmeans_scale(spark)
    if run_all or "--bpe" in args:
        sections["bpe_merges"] = run_bpe_merges(spark)
    if run_all or "--bpe-divergence" in args:
        sections["bpe_divergence"] = run_bpe_divergence(spark)

    for payload in sections.values():
        print(json.dumps(payload))
    if run_all:
        import re

        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(re.fullmatch(r"BENCH_r(\d+)\.json", f).group(1))
            for f in os.listdir(here)
            if re.fullmatch(r"BENCH_r\d+\.json", f)
        ]
        n = (max(rounds) + 1) if rounds else 1
        with open(os.path.join(here, f"BENCH_DOMAIN_r{n:02d}.json"), "w") as f:
            json.dump(sections, f, indent=1, sort_keys=True)
            f.write("\n")
    spark.stop()
    return 0


# ---------------------------------------------------------------------------
# corpus section: feed ingest → curation → manifest throughput
# ---------------------------------------------------------------------------
N_DOCS = 50_000


def _gen_feed(spark: SparkSession, path: str, n: int, id_offset: int = 0,
              files: int = 8) -> None:
    """Deterministic synthetic crawl feed: word-salad text (seeded from
    the doc id, no RNG), ~1% exact dups, ~1% PII-bearing lines, ~0.5%
    malformed lines — written as JSONL shards."""
    words = F.array(*[F.lit(w) for w in (
        "the", "data", "spark", "merge", "corpus", "table", "join",
        "filter", "window", "batch", "stream", "quality", "token", "a",
        "in", "is", "scan",
    )])
    base = spark.range(id_offset, id_offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(24)),
                lambda i: F.element_at(
                    words,
                    (F.pmod(F.xxhash64(F.col("id") * 31 + i), F.lit(17)) + 1)
                    .cast("int"),
                ),
            ),
        ).alias("text"),
    )
    doc = base.select(
        "doc_id",
        F.when(  # ~1% exact dups: clone doc 0's text
            F.pmod("doc_id", F.lit(100)) == 7,
            F.lit("the data spark merge table scan in a batch row")
        )
        .when(  # ~1% PII injections
            F.pmod("doc_id", F.lit(100)) == 13,
            F.concat(F.col("text"), F.lit(" contact bob@example.com now")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        F.lit("en").alias("lang"),
    )
    line = F.when(
        F.pmod("doc_id", F.lit(200)) == 19, F.lit("{malformed json")
    ).otherwise(F.to_json(F.struct("doc_id", "text", "lang")))
    doc.select(line.alias("value")).coalesce(files).write.mode(
        "overwrite"
    ).text(path)


#: fixed boilerplate page for the Zipf feeds: every copy signatures
#: identically, so its LSH band buckets grow linearly with the corpus —
#: the exact hot-bucket regime the r10 saturation guard exists for
_BOILERPLATE = (
    "w1 w2 w1 w3 terms of service boilerplate w1 w2 w4 w1 w5 the same "
    "page text appears verbatim on every crawled page w2 w1 w3 w2"
)


def _gen_zipf_feed(
    spark: SparkSession, path: str, n: int, id_offset: int = 0,
    files: int = 8, boiler_every: int = 12,
) -> None:
    """Zipf-skewed crawl feed (VERDICT r10 item 8): token ranks drawn
    rank ≈ exp(U·ln V) (Zipf s=1, the natural-text law — same recipe
    as bench_scaling's zipf corpus), so postings lists and band
    buckets skew like a real crawl instead of the uniform 17-word
    salad; every ``boiler_every``-th doc is the IDENTICAL boilerplate
    page. Deterministic (hash-seeded, no RNG), JSONL shards."""
    import math as _math

    v = 5000
    base = spark.range(id_offset, id_offset + n).select(
        F.col("id").alias("doc_id")
    )
    length = (
        F.pmod(F.xxhash64(F.col("doc_id"), F.lit("len")), F.lit(30)) + 20
    ).cast("int")

    def u(i):
        return (
            F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(1_000_003))
            / F.lit(1_000_003.0)
        )

    def rank(i):
        return F.greatest(
            F.lit(1),
            F.floor(F.exp(u(i) * F.lit(_math.log(float(v))))).cast("int"),
        )

    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.concat(F.lit("w"), rank(i).cast("string")),
    )
    text = F.when(
        F.pmod("doc_id", F.lit(boiler_every)) == 3, F.lit(_BOILERPLATE)
    ).otherwise(F.array_join(words, " "))
    doc = base.select(
        "doc_id", text.alias("text"), F.lit("en").alias("lang")
    )
    doc.select(
        F.to_json(F.struct("doc_id", "text", "lang")).alias("value")
    ).coalesce(files).write.mode("overwrite").text(path)


def run_corpus(spark: SparkSession) -> dict:
    """Corpus lakehouse throughput: 50k-doc feed ingest (quarantine +
    gates + PII redaction + MERGE), a 10% redelivery/new-docs second
    cycle, then the gates→dedup→packing manifest over the stored
    corpus."""
    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        ingest_feed,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.functions import text as T

    root = tempfile.mkdtemp(prefix="umdp_corpus_bench_")
    stages: dict[str, float] = {}
    counts: dict[str, int] = {}
    try:
        _gen_feed(spark, os.path.join(root, "feed1"), N_DOCS)
        _gen_feed(
            spark, os.path.join(root, "feed2"), N_DOCS // 10,
            id_offset=N_DOCS - N_DOCS // 20,  # half redelivery, half new
        )
        corpus = MergeTable(spark, os.path.join(root, "corpus"))
        quarantine = MergeTable(spark, os.path.join(root, "quarantine"))

        t = time.time()
        r1 = ingest_feed(spark, os.path.join(root, "feed1"), corpus, quarantine)
        counts["ingest1"] = r1["upserted"]
        stages["ingest_50k"] = round(time.time() - t, 3)
        # the malformed-line schedule is deterministic (id % 200 == 19):
        # every dead letter must land in quarantine, none silently drop
        want_bad = sum(1 for i in range(N_DOCS) if i % 200 == 19)
        assert r1["quarantined"] == want_bad, (r1["quarantined"], want_bad)

        t = time.time()
        r2 = ingest_feed(spark, os.path.join(root, "feed2"), corpus, quarantine)
        counts["ingest2"] = r2["upserted"]
        stages["incremental_5k"] = round(time.time() - t, 3)

        t = time.time()
        docs = corpus.read()
        reps = docs.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
        clean = docs.join(reps.select("doc_id"), "doc_id").select(
            "doc_id",
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                    16, 10,
                ).cast("int") % 32
            ).alias("shard"),
            T.whitespace_token_count("text").cast("int").alias("n_tokens"),
        )
        from pyspark.sql import Window

        w = (
            Window.partitionBy("shard").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        manifest = clean.select(
            "doc_id", "shard", "n_tokens",
            F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048)
            .cast("int").alias("bin"),
        )
        counts["manifest_rows"] = manifest.count()
        stages["manifest"] = round(time.time() - t, 3)
        # dedup must have collapsed the planted exact-dup clique
        assert counts["manifest_rows"] < corpus.read().count()

        total = round(sum(stages.values()), 3)
        return {
            "metric": "corpus_wall_sec",
            "value": total,
            "unit": "sec",
            "stages": stages,
            "counts": counts,
            "docs_per_sec": round(N_DOCS / max(stages["ingest_50k"], 1e-9), 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# compaction soak: ingest loops must plateau file counts (VERDICT r5 #4)
# ---------------------------------------------------------------------------
def run_compaction_soak(spark: SparkSession) -> dict:
    """Long-horizon small-file proof: with auto-compaction wired into
    the ingest loops, live file counts PLATEAU across repeated cycles
    instead of growing linearly, while per-cycle latency stays flat.

    Two loops, matching the two wired call sites:

    - **bronze intraday appends**: 10 same-day batches through
      ``J.bronze_ingest`` — each append adds up to shuffle.partitions
      files to the current load_date leaf; the where-scoped
      ``auto_compact`` must keep that leaf's file count bounded and
      append latency flat (appends never pay for history).
    - **corpus MERGE ingest**: 6 feed cycles through ``ingest_feed``;
      the corpus manifest's file count must plateau. The CoW MERGE
      dereferences old files every rewrite, so the count is naturally
      bounded; the wired ``auto_compact`` backstop is additionally
      proven to fire once its threshold is crossed. (Latency here is
      reported, not gated: a copy-on-write MERGE rewrites matched
      data, so cycle cost tracks corpus size by design — the
      flat-latency claim belongs to the append loop above.)
    """
    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        ingest_feed,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    out: dict = {"metric": "compaction_soak"}

    # -- bronze append loop -------------------------------------------------
    root = tempfile.mkdtemp(prefix="umdp_compact_soak_")
    try:
        lake = J.Lakehouse(spark, root)
        leaf = f"load_date={D1.date().isoformat()}"
        secs, leaf_files, compactions = [], [], 0
        for c in range(10):
            when = D1 + dt.timedelta(minutes=c)
            batch = gen_trips(spark, 2_000, 1 + c * 10_000, when)
            t0 = time.perf_counter()
            J.bronze_ingest(lake, C.TRIPS, batch, now=when)
            secs.append(round(time.perf_counter() - t0, 2))
            bronze = lake.table("bronze", C.TRIPS.name)
            n = len(bronze.live_files(leaf_contains=leaf))
            if leaf_files and n < leaf_files[-1]:
                compactions += 1
            leaf_files.append(n)
        out["bronze"] = {
            "cycle_secs": secs,
            "leaf_file_counts": leaf_files,
            "compactions": compactions,
            "rows": lake.table("bronze", C.TRIPS.name).read().count(),
        }
        assert compactions >= 1, out["bronze"]
        # plateau: the leaf never exceeds threshold + one batch's files
        per_batch = max(
            b - a for a, b in zip(leaf_files, leaf_files[1:])
        )
        assert max(leaf_files) <= 32 + per_batch + 8, out["bronze"]
        assert out["bronze"]["rows"] == 20_000
        # flat: identical appends must not pay for accumulated history
        # (2.0 allows the cycles where the where-scoped compact runs)
        med = sorted(secs[1:4])[1]
        assert secs[-1] <= med * 2.0 + 0.5, out["bronze"]
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # -- corpus MERGE loop --------------------------------------------------
    root = tempfile.mkdtemp(prefix="umdp_compact_corpus_")
    try:
        corpus = MergeTable(spark, os.path.join(root, "corpus"))
        quarantine = MergeTable(spark, os.path.join(root, "quarantine"))
        secs, files, compacted = [], [], []
        for c in range(6):
            feed = os.path.join(root, f"feed{c}")
            _gen_feed(spark, feed, 5_000, id_offset=c * 5_000, files=8)
            t0 = time.perf_counter()
            r = ingest_feed(
                spark, feed, corpus, quarantine, auto_compact_files=24
            )
            secs.append(round(time.perf_counter() - t0, 2))
            files.append(len(corpus.live_files()))
            compacted.append(r["compacted"])
        out["corpus"] = {
            "cycle_secs": secs,
            "file_counts": files,
            "compacted": compacted,
            "rows": corpus.read().count(),
        }
        # the copy-on-write MERGE dereferences old files every cycle, so
        # the corpus file count is NATURALLY bounded (≈ write parallelism,
        # not cycles × files) — the plateau holds before the backstop ever
        # fires; file accumulation lives in APPEND loops (bronze above)
        assert max(files) <= 24, out["corpus"]
        # ...and the wired auto_compact backstop does fire when the
        # threshold is crossed (forced here with threshold 0)
        feed = os.path.join(root, "feed_backstop")
        _gen_feed(spark, feed, 1_000, id_offset=50_000, files=4)
        r = ingest_feed(
            spark, feed, corpus, quarantine, auto_compact_files=0
        )
        out["corpus"]["backstop_compacted"] = r["compacted"]
        out["corpus"]["files_after_backstop"] = len(corpus.live_files())
        assert r["compacted"] == 1, out["corpus"]
        assert corpus.history()[0]["op"] == "compact"
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)

# ---------------------------------------------------------------------------
# bloom section: point-key lookup/erasure IO under a zone-map-hostile layout
# ---------------------------------------------------------------------------
def run_bloom_pointops(spark: SparkSession) -> dict:
    """Measured proof of the bloom sidecar: a corpus whose doc_ids are
    uniformly spread over many files (every file's [min,max] covers the
    whole key space, so zone maps prune NOTHING), probed and erased for
    a handful of ids — the GDPR shape. Gates:

    - bloom pruning must skip ≥90% of files for a 4-id probe;
    - the bloom point-delete must rewrite ≤10% of the files the naive
      full-scan delete rewrites, with identical surviving rows.

    Latencies are reported, not gated: at this local scale the whole
    table is page-cached and a 2M-row scan costs well under a second,
    so the fixed cost of the 4-row probe-hash Spark job can exceed the
    scan it avoids — the win is the IO ratio (files opened), which is
    what survives the jump to 100 TB where a file open is a remote
    read.
    """
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    out: dict = {"metric": "bloom_pointops"}
    root = tempfile.mkdtemp(prefix="umdp_bloom_bench_")
    n_rows, n_files = 2_000_000, 64
    try:
        base = spark.range(n_rows).select(
            F.col("id").alias("doc_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("body"),
        )
        t_bloom = MergeTable(spark, os.path.join(root, "bloomed"))
        t_bloom.create(base.repartition(n_files))
        t_naive = MergeTable(spark, os.path.join(root, "naive"))
        t_naive.create(base.repartition(n_files))

        t0 = time.perf_counter()
        t_bloom.build_blooms("doc_id", fpp=0.001)
        build_s = time.perf_counter() - t0

        victims = [123, 456_789, 1_111_111, 1_999_999]
        cands, skipped = t_bloom.prune_files_by_keys("doc_id", victims)
        zone_cands, _ = t_bloom.prune_files(
            "doc_id", min(victims), max(victims) + 1
        )

        t0 = time.perf_counter()
        n_hit = t_bloom.read_by_keys("doc_id", victims).count()
        lookup_bloom_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_full = (
            t_naive.read().filter(F.col("doc_id").isin(victims)).count()
        )
        lookup_scan_s = time.perf_counter() - t0

        files_before = len(t_bloom._load()[0]["files"])
        t0 = time.perf_counter()
        stats = t_bloom.delete_by_keys("doc_id", victims)
        del_bloom_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        t_naive.delete(F.col("doc_id").isin(victims))
        del_naive_s = time.perf_counter() - t0

        assert n_hit == n_full == len(victims)
        assert (
            t_bloom.read().count()
            == t_naive.read().count()
            == n_rows - len(victims)
        )
        out.update(
            {
                "rows": n_rows,
                "files": files_before,
                "bloom_build_s": round(build_s, 2),
                "probe_candidates": len(cands),
                "probe_skipped": len(skipped),
                "zonemap_candidates": len(zone_cands),
                "lookup_bloom_s": round(lookup_bloom_s, 2),
                "lookup_scan_s": round(lookup_scan_s, 2),
                "delete_bloom_s": round(del_bloom_s, 2),
                "delete_bloom_rewritten": stats["rewritten_files"],
                "delete_naive_s": round(del_naive_s, 2),
            }
        )
        # zone maps are useless on this layout — that's the point
        assert len(zone_cands) == files_before, out
        assert len(skipped) >= int(files_before * 0.9), out
        assert stats["rewritten_files"] <= max(1, files_before // 10), out
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out

def run_dv_pointops(spark: SparkSession) -> dict:
    """Deletion-vector proof at the same GDPR point-delete shape as
    ``run_bloom_pointops``: uniformly-spread keys over many files, a
    handful of victims. CoW (delete_by_keys) rewrites every
    bloom-positive file — terabytes at 100 TB; MOR (delete_keys_mor)
    scans them for positions and rewrites NOTHING. Gates:

    - the MOR delete rewrites 0 files (manifest file list identical);
    - the read-side DV overhead (broadcast anti-join) costs < 2x a
      clean full scan at this scale;
    - ``purge_deletes`` rewrites only the covered files and restores
      anti-join-free reads with identical rows."""
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    out: dict = {"metric": "dv_pointops"}
    root = tempfile.mkdtemp(prefix="umdp_dv_bench_")
    n_rows, n_files = 2_000_000, 64
    try:
        base = spark.range(n_rows).select(
            F.col("id").alias("doc_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("body"),
        )
        t_mor = MergeTable(spark, os.path.join(root, "mor"))
        t_mor.create(base.repartition(n_files))
        t_cow = MergeTable(spark, os.path.join(root, "cow"))
        t_cow.create(base.repartition(n_files))
        for t in (t_mor, t_cow):
            t.build_blooms("doc_id", fpp=0.001)

        victims = [123, 456_789, 1_111_111, 1_999_999]
        files_before = list(t_mor._load()[0]["files"])

        t0 = time.perf_counter()
        mor_stats = t_mor.delete_keys_mor("doc_id", victims)
        del_mor_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        cow_stats = t_cow.delete_by_keys("doc_id", victims)
        del_cow_s = time.perf_counter() - t0

        assert mor_stats["rewritten_files"] == 0, mor_stats
        assert mor_stats["deleted_rows"] == len(victims), mor_stats
        assert t_mor._load()[0]["files"] == files_before
        assert cow_stats["rewritten_files"] >= 1, cow_stats

        t0 = time.perf_counter()
        n_dv = t_mor.read().count()
        read_dv_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_cow = t_cow.read().count()
        read_clean_s = time.perf_counter() - t0
        assert n_dv == n_cow == n_rows - len(victims)

        t0 = time.perf_counter()
        purge_stats = t_mor.purge_deletes()
        purge_s = time.perf_counter() - t0
        assert purge_stats["rewritten_files"] == mor_stats[
            "scanned_files"
        ], (purge_stats, mor_stats)
        assert t_mor.read().count() == n_rows - len(victims)
        assert (
            t_mor.read().filter(F.col("doc_id").isin(victims)).count() == 0
        )

        out.update(
            {
                "rows": n_rows,
                "files": len(files_before),
                "victims": len(victims),
                "delete_mor_s": round(del_mor_s, 2),
                "delete_cow_s": round(del_cow_s, 2),
                "mor_rewritten_files": mor_stats["rewritten_files"],
                "mor_scanned_files": mor_stats["scanned_files"],
                "mor_skipped_files": mor_stats["skipped_files"],
                "cow_rewritten_files": cow_stats["rewritten_files"],
                "read_with_dv_s": round(read_dv_s, 2),
                "read_clean_s": round(read_clean_s, 2),
                "purge_s": round(purge_s, 2),
                "purge_rewritten_files": purge_stats["rewritten_files"],
                "purge_kept_files": purge_stats["kept_files"],
            }
        )
        # read overhead of the broadcast anti-join stays bounded
        assert read_dv_s < read_clean_s * 2 + 0.5, out
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def run_dv_erasure_soak(spark: SparkSession) -> dict:
    """Two-phase GDPR erasure under SUSTAINED load (VERDICT r7 item 7,
    r8 item 7): ten ``mode="mor"`` erasure cycles with full reads
    between; the ``finalize_erasure`` purge is now scheduled by the
    ``dv_purge_due`` POLICY (pending DV rows >= max_dv_rows) instead of
    a fixed every-N clock — same two-phase semantics, but the rewrite
    only happens when the measured read-penalty proxy crossed its
    knob. Gates:

    - erased ids vanish from reads IMMEDIATELY after each MoR cycle;
    - pending DV rows are BOUNDED by the policy knob (never exceed
      ``max_dv_rows`` right after the policy check) and drop to 0 at
      every purge — never unbounded growth;
    - the policy fires exactly when due (no purge while under the
      bound), yielding EQUAL-OR-FEWER rewrites than the old
      purge-every-5 cadence on the same workload;
    - the read penalty between purges stays < 2× the clean read;
    - every purge rewrites ONLY the files carrying DV'd rows (kept +
      rewritten == live files; rewritten == covered)."""
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        erase_document_ids,
        finalize_erasure,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    out: dict = {"metric": "dv_erasure_soak"}
    root = tempfile.mkdtemp(prefix="umdp_dvsoak_bench_")
    n_rows, n_files, victims_per, cycles = 1_000_000, 32, 200, 10
    # policy knob: tolerate up to 1,000 pending DV rows (the old
    # every-5 cadence purged at exactly this depth on this workload,
    # so rewrite counts are directly comparable)
    max_dv_rows = 1_000
    try:
        corpus = MergeTable(spark, os.path.join(root, "corpus"))
        corpus.create(
            spark.range(n_rows).select(
                F.col("id").alias("doc_id"),
                F.sha2(F.col("id").cast("string"), 256).alias("text"),
            ).repartition(n_files)
        )
        corpus.build_blooms("doc_id", fpp=0.001)
        tables = {"corpus": corpus}

        t0 = time.perf_counter()
        baseline = corpus.read().count()
        read_clean_s = time.perf_counter() - t0
        assert baseline == n_rows

        dv_rows_curve, read_secs, purges = [], [], []
        erased_total = 0
        for c in range(1, cycles + 1):
            victims = list(range((c - 1) * victims_per * 7,
                                 (c - 1) * victims_per * 7 + victims_per))
            erase_document_ids(
                spark, victims, tables,
                id_cols={"corpus": ["doc_id"]}, mode="mor",
            )
            erased_total += victims_per
            # immediate logical erasure + bounded pending DVs
            got = corpus.read().filter(
                F.col("doc_id").isin(victims[:5])
            ).count()
            assert got == 0, (c, got)
            gauge = corpus.dv_purge_due(max_dv_rows=max_dv_rows)
            pending = gauge["dv_rows"]
            dv_rows_curve.append(pending)
            assert pending <= max_dv_rows, (c, pending)
            t0 = time.perf_counter()
            n = corpus.read().count()
            read_secs.append(round(time.perf_counter() - t0, 2))
            assert n == n_rows - erased_total, (c, n)
            if gauge["due"]:
                manifest = corpus._load()[0]
                covered = {
                    f for e in (manifest.get("dvs") or [])
                    for f in e["files"]
                    if f in set(manifest["files"])
                }
                live_before = len(manifest["files"])
                st = finalize_erasure(tables)["corpus"]
                purges.append(st)
                assert st["rewritten_files"] == len(covered), (st, covered)
                assert st["rewritten_files"] + st["kept_files"] == (
                    live_before
                ), (st, live_before)
                assert corpus.dv_rows() == 0, corpus.dv_rows()
        out.update(
            {
                "rows": n_rows,
                "files": n_files,
                "victims_per_cycle": victims_per,
                "cycles": cycles,
                "policy_max_dv_rows": max_dv_rows,
                "read_clean_s": round(read_clean_s, 2),
                "read_secs": read_secs,
                "dv_rows_curve": dv_rows_curve,
                "purges": purges,
                "n_purges": len(purges),
                "final_rows": n_rows - erased_total,
            }
        )
        # equal-or-fewer rewrites than the old purge-every-5 cadence
        # (which purged twice over these 10 cycles on this workload)
        assert len(purges) <= 2, out
        assert max(read_secs) < read_clean_s * 2 + 0.5, out
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def run_dv_clustered_erasure(spark: SparkSession) -> dict:
    """File-CLUSTERED GDPR erasure (VERDICT r9 item 7): the uniform
    soak's scattered victims force 32/32-file purges, proving nothing
    about pruning; real per-subject erasure is file-clustered — a
    subject's rows co-locate once the table is range-partitioned or
    ZORDERed by the subject key. This lays the corpus out
    range-clustered by doc_id (what OPTIMIZE ZORDER BY doc_id
    produces), MoR-erases a contiguous id range (one subject's data),
    and asserts the purge REWRITES ONLY THE COVERED FILES — a handful
    — while every untouched file survives byte-identical. Gates:

    - bloom routing keeps the DV sidecars on <= 3 of 32 files;
    - purge rewrites exactly the covered files (rewritten == covered,
      rewritten + kept == live) and rewritten_files <= 3 << 32;
    - untouched files' (name, size) pairs are unchanged across the
      purge — never rewritten, not merely "not logically changed";
    - erased ids vanish from reads immediately after the MoR phase."""
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        erase_document_ids,
        finalize_erasure,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    out: dict = {"metric": "dv_clustered_erasure"}
    root = tempfile.mkdtemp(prefix="umdp_dvclust_bench_")
    n_rows, n_files, victims = 1_000_000, 32, 2_000
    try:
        corpus = MergeTable(spark, os.path.join(root, "corpus"))
        corpus.create(
            spark.range(n_rows).select(
                F.col("id").alias("doc_id"),
                F.sha2(F.col("id").cast("string"), 256).alias("text"),
            ).repartitionByRange(n_files, "doc_id")
        )
        corpus.build_blooms("doc_id", fpp=0.001)
        tables = {"corpus": corpus}
        # one subject's contiguous slice, mid-table
        lo = 500_000
        ids = list(range(lo, lo + victims))
        erase_document_ids(
            spark, ids, tables, id_cols={"corpus": ["doc_id"]}, mode="mor"
        )
        assert corpus.read().filter(
            F.col("doc_id").between(lo, lo + victims - 1)
        ).count() == 0
        manifest = corpus._load()[0]
        live = set(manifest["files"])
        covered = {
            f for e in (manifest.get("dvs") or [])
            for f in e["files"] if f in live
        }
        out["files_total"] = len(live)
        out["files_covered_by_dvs"] = len(covered)
        assert len(covered) <= 3, out  # clustered: a handful, not 32/32
        local = corpus._local_path()
        sizes_before = {
            f: os.path.getsize(os.path.join(local, f))
            for f in live if f not in covered
        }
        st = finalize_erasure(tables)["corpus"]
        out["purge"] = st
        assert st["rewritten_files"] == len(covered), (st, len(covered))
        assert st["rewritten_files"] + st["kept_files"] == len(live), st
        assert st["rewritten_files"] <= 3, st
        after = set(corpus._load()[0]["files"])
        for f, sz in sizes_before.items():
            assert f in after, f  # untouched file still live...
            assert os.path.getsize(os.path.join(local, f)) == sz, f
        assert corpus.read().count() == n_rows - victims
        out["untouched_files_byte_identical"] = True
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# dedup-index section: O(changed) maintenance vs O(corpus) recompute
# ---------------------------------------------------------------------------
def run_dedup_index_soak(spark: SparkSession) -> dict:
    return _dedup_index_soak(spark)


def run_dedup_index_soak_10x(spark: SparkSession) -> dict:
    """VERDICT r9 item 6: the same O(batch) flat-refresh assertion, but
    against a corpus TEN TIMES the original soak's final size — seeded
    up front so a hidden O(corpus) term in the refresh (a stray
    snapshot scan, an unpruned bloom pass) would be ~10x the batch
    work and fail the flat gate instead of hiding inside noise."""
    return _dedup_index_soak(
        spark, seed_rows=360_000, metric="dedup_index_soak_10x"
    )


def run_dedup_index_soak_zipf(spark: SparkSession) -> dict:
    """VERDICT r10 item 8: the index soak under REALISTIC bucket skew —
    Zipf-rank token text plus an identical boilerplate page every 12th
    doc, so the boilerplate's band buckets grow linearly with the
    corpus (the regime the r10 saturation machinery exists for). The
    soak maintains the bucket-``sizes`` table through every refresh
    and probes each incoming batch through the GUARDED
    ``incremental_near_dups_with_report``. Gates: per-cycle refresh
    (index + sizes fold) stays flat; the planted hot buckets are
    skipped AND reported every cycle (nonzero truncation, never
    silent); fully-saturated docs are surfaced as unchecked; and the
    delta-maintained sizes equal a from-scratch recount at the end."""
    from urban_mobility_data_pipeline_spark.cache import release_scratch
    from urban_mobility_data_pipeline_spark.extensions.dedup_index import (
        bucket_size_rows,
        incremental_near_dups_with_report,
        refresh_dedup_index,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    seed_rows, batch, cycles, cap = 36_000, 3_000, 6, 256
    out: dict = {
        "metric": "dedup_index_soak_zipf",
        "seed_rows": seed_rows,
        "batch_docs": batch,
        "bucket_cap": cap,
    }
    root = tempfile.mkdtemp(prefix="umdp_dedupidx_zipf_")
    try:
        corpus = MergeTable(spark, os.path.join(root, "corpus"))
        index = MergeTable(
            spark, os.path.join(root, "index"),
            bucket_keys=["doc_id"], num_buckets=16,
        )
        sizes = MergeTable(spark, os.path.join(root, "sizes"))
        cursor = VersionCursor(spark, os.path.join(root, "cursor"))
        seed = os.path.join(root, "seed")
        _gen_zipf_feed(spark, seed, seed_rows, id_offset=10_000_000,
                       files=32)
        corpus.create(
            spark.read.json(seed, schema="doc_id long, text string")
            .filter(F.col("text").isNotNull())
        )
        refresh_dedup_index(corpus, index, cursor, sizes=sizes)
        refresh_secs, probe_secs = [], []
        skipped_bands, unchecked_docs, pairs_found = [], [], []
        for c in range(cycles):
            feed = os.path.join(root, f"f{c}")
            _gen_zipf_feed(spark, feed, batch, id_offset=c * batch,
                           files=4)
            docs = (
                spark.read.json(feed, schema="doc_id long, text string")
                .filter(F.col("text").isNotNull())
            )
            t0 = time.perf_counter()
            pairs, skipped = incremental_near_dups_with_report(
                docs, corpus, index, sizes, cap, threshold=0.5
            )
            n_pairs = pairs.count()
            sk = skipped.groupBy("new_id").count().collect()
            probe_secs.append(round(time.perf_counter() - t0, 2))
            pairs_found.append(n_pairs)
            skipped_bands.append(sum(int(r["count"]) for r in sk))
            from urban_mobility_data_pipeline_spark.extensions.dedup import (
                LSH_BANDS,
            )

            unchecked_docs.append(
                sum(1 for r in sk if int(r["count"]) >= LSH_BANDS)
            )
            release_scratch()
            corpus.append(docs)
            t0 = time.perf_counter()
            n = refresh_dedup_index(corpus, index, cursor, sizes=sizes)
            refresh_secs.append(round(time.perf_counter() - t0, 2))
            assert n >= batch * 0.9, (c, n)
        out.update(
            {
                "cycles": cycles,
                "refresh_secs": refresh_secs,
                "probe_secs": probe_secs,
                "skipped_bands_per_cycle": skipped_bands,
                "unchecked_docs_per_cycle": unchecked_docs,
                "pairs_per_cycle": pairs_found,
            }
        )
        # the planted hot buckets must be skipped AND reported every
        # cycle (each batch carries boiler docs whose every band lands
        # in a >cap bucket), and the skip is never silent
        assert all(s > 0 for s in skipped_bands), out
        assert all(u > 0 for u in unchecked_docs), out
        # flat refresh under skew: same gate as the uniform soaks
        mids = refresh_secs[:-1]
        med_mid = sorted(mids)[len(mids) // 2]
        assert refresh_secs[-1] <= med_mid * 1.2 + 0.3, out
        # the guarded probe must stay flat too: its work is
        # O(batch x B x cap), independent of the growing hot bucket
        pmids = probe_secs[:-1]
        pmed = sorted(pmids)[len(pmids) // 2]
        assert probe_secs[-1] <= pmed * 1.35 + 0.5, out
        # delta-maintained sizes == from-scratch recount
        recount = {
            (r["band_id"], r["band_key"]): r["n"]
            for r in bucket_size_rows(corpus.read()).collect()
        }
        live = {
            (r["band_id"], r["band_key"]): r["n"]
            for r in sizes.read().filter(F.col("n") != 0).collect()
        }
        assert live == recount, "sizes drifted from recount"
        out["sizes_match_recount"] = True
        # and the hot bucket really is hot: top bucket ≈ boiler count
        out["max_bucket"] = max(live.values())
        assert out["max_bucket"] > cap, out
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _dedup_index_soak(
    spark: SparkSession,
    seed_rows: int = 0,
    batch: int = 4_000,
    cycles: int = 10,
    metric: str = "dedup_index_soak",
) -> dict:
    """Scale proof for the incrementally maintained LSH index
    (extensions/dedup_index.py): as the corpus grows by a CONSTANT
    batch per cycle, per-cycle index refresh time must stay ~flat
    (it reads only the changed docs), while the naive alternative —
    re-running the full near-dup pipeline — grows with the corpus.
    Gates: the last refresh is within ±20%-ish of the median
    mid-run refresh (the delete+append refresh does O(batch) work —
    bloom-probe the changed ids, append their band rows, top up the
    sidecar — so the curve must be FLAT, not merely sublinear; 1.35x
    covers timer noise on a busy VM), and the maintained index stays
    row-identical to a from-scratch rebuild at the end."""
    from urban_mobility_data_pipeline_spark.extensions.dedup_index import (
        band_rows,
        refresh_dedup_index,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    out: dict = {"metric": metric}
    root = tempfile.mkdtemp(prefix="umdp_dedupidx_bench_")
    try:
        corpus = MergeTable(spark, os.path.join(root, "corpus"))
        index = MergeTable(
            spark, os.path.join(root, "index"),
            bucket_keys=["doc_id"], num_buckets=16,
        )
        cursor = VersionCursor(spark, os.path.join(root, "cursor"))
        if seed_rows:
            seed = os.path.join(root, "seed")
            _gen_feed(spark, seed, seed_rows, id_offset=10_000_000,
                      files=32)
            corpus.create(
                spark.read.json(seed, schema="doc_id long, text string")
                .filter(F.col("text").isNotNull())
            )
            # bootstrap build outside the measured cycles: the soak
            # measures steady-state O(batch) refreshes at big-corpus
            # size, not the one-time full build
            refresh_dedup_index(corpus, index, cursor)
        refresh_secs, corpus_rows = [], []
        for c in range(cycles):
            feed = os.path.join(root, f"f{c}")
            _gen_feed(spark, feed, batch, id_offset=c * batch, files=4)
            docs = (
                spark.read.json(feed, schema="doc_id long, text string")
                .filter(F.col("text").isNotNull())
            )
            if corpus.exists():
                corpus.append(docs)
            else:
                corpus.create(docs)
            files_before = (
                set(index._load()[0]["files"]) if (c or seed_rows) else set()
            )
            t0 = time.perf_counter()
            n = refresh_dedup_index(corpus, index, cursor)
            refresh_secs.append(round(time.perf_counter() - t0, 2))
            corpus_rows.append(corpus.read().count())
            assert n >= batch * 0.9, (c, n)
            # all-new-ids batches must never rewrite an existing band
            # file (MoR delete writes nothing, append adds new files)
            if c or seed_rows:
                rewritten = files_before - set(index._load()[0]["files"])
                assert not rewritten, (c, sorted(rewritten)[:5])
        out.update(
            {
                "batch_docs": batch,
                "cycles": cycles,
                "corpus_rows": corpus_rows,
                "refresh_secs": refresh_secs,
                "untouched_files_never_rewritten": True,
            }
        )
        # flat maintenance, ±20% of the mid-run median: the last
        # (biggest-corpus) refresh stays within noise — O(batch), not
        # O(corpus). (Unseeded runs bootstrap on c0; compare from c1.
        # Seeded runs bootstrapped before the loop, so every measured
        # cycle is a steady-state refresh.)
        mids = refresh_secs[0 if seed_rows else 1:-1]
        med_mid = sorted(mids)[len(mids) // 2]
        assert refresh_secs[-1] <= med_mid * 1.2 + 0.3, out
        # and the maintained index is exactly a from-scratch rebuild
        rebuilt = band_rows(corpus.read())
        live = index.read()
        diff = live.exceptAll(rebuilt).count() + rebuilt.exceptAll(live).count()
        assert diff == 0, diff
        out["index_matches_rebuild"] = True
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def run_bm25_index_soak(spark: SparkSession) -> dict:
    return _bm25_index_soak(spark)


def run_bm25_index_soak_10x(spark: SparkSession) -> dict:
    """VERDICT r9 item 6: the bm25 flat-refresh soak at a 10x-seeded
    corpus — see run_dedup_index_soak_10x for why."""
    return _bm25_index_soak(
        spark, seed_rows=360_000, metric="bm25_index_soak_10x"
    )


def run_bm25_index_soak_zipf(spark: SparkSession) -> dict:
    """VERDICT r10 item 8: the bm25 flat-refresh soak re-seeded with
    Zipf-rank text (hot tokens -> skewed postings lists, the regime a
    real crawl puts the token-bucketed postings table in) plus the
    identical boilerplate page every 12th doc. The O(batch) refresh
    claim must hold when the per-token posting lists are wildly
    unequal, not only under the uniform 17-word salad."""
    return _bm25_index_soak(
        spark, seed_rows=36_000, cycles=6,
        metric="bm25_index_soak_zipf", gen=_gen_zipf_feed,
    )


def _bm25_index_soak(
    spark: SparkSession,
    seed_rows: int = 0,
    batch: int = 4_000,
    cycles: int = 10,
    metric: str = "bm25_index_soak",
    gen=_gen_feed,
) -> dict:
    """Scale proof for the incrementally maintained BM25 inverted
    index (extensions/lexical_index.py), the lexical twin of
    ``run_dedup_index_soak``: as the corpus grows by a CONSTANT batch
    per cycle, per-cycle ``refresh_bm25_index`` must stay ~flat — it
    deletes the changed docs' postings through the doc_id bloom
    sidecar, appends their re-tokenized rows, and folds a DELTA into
    the one-row stats, so the work is O(batch), never O(corpus).
    Gates: the last refresh is within noise of the mid-run median, the
    maintained postings are row-identical to a from-scratch rebuild,
    and the delta-maintained stats equal a recount."""
    from urban_mobility_data_pipeline_spark.extensions.lexical_index import (
        bm25_postings,
        bm25_stats,
        refresh_bm25_index,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    out: dict = {"metric": metric}
    root = tempfile.mkdtemp(prefix="umdp_bm25idx_bench_")
    try:
        corpus = MergeTable(spark, os.path.join(root, "corpus"))
        postings = MergeTable(
            spark, os.path.join(root, "postings"),
            bucket_keys=["token"], num_buckets=16,
        )
        stats = MergeTable(spark, os.path.join(root, "stats"))
        cursor = VersionCursor(spark, os.path.join(root, "cursor"))
        if seed_rows:
            seed = os.path.join(root, "seed")
            gen(spark, seed, seed_rows, id_offset=10_000_000,
                      files=32)
            corpus.create(
                spark.read.json(seed, schema="doc_id long, text string")
                .filter(F.col("text").isNotNull())
            )
            refresh_bm25_index(corpus, postings, stats, cursor)
        refresh_secs, corpus_rows = [], []
        for c in range(cycles):
            feed = os.path.join(root, f"f{c}")
            gen(spark, feed, batch, id_offset=c * batch, files=4)
            docs = (
                spark.read.json(feed, schema="doc_id long, text string")
                .filter(F.col("text").isNotNull())
            )
            if corpus.exists():
                corpus.append(docs)
            else:
                corpus.create(docs)
            files_before = (
                set(postings._load()[0]["files"])
                if (c or seed_rows)
                else set()
            )
            t0 = time.perf_counter()
            n = refresh_bm25_index(corpus, postings, stats, cursor)
            refresh_secs.append(round(time.perf_counter() - t0, 2))
            corpus_rows.append(corpus.read().count())
            assert n >= batch * 0.9, (c, n)
            # an all-new-ids batch must never rewrite an existing
            # postings file: the doc_id blooms reject every changed id,
            # so the refresh is delete-noop + append-only (the same
            # invariant that keeps the dedup-index soak flat)
            if c or seed_rows:
                files_after = set(postings._load()[0]["files"])
                rewritten = files_before - files_after
                assert not rewritten, (c, sorted(rewritten)[:5])
        out.update(
            {
                "batch_docs": batch,
                "cycles": cycles,
                "corpus_rows": corpus_rows,
                "refresh_secs": refresh_secs,
                "untouched_buckets_never_rewritten": True,
            }
        )
        # flat maintenance, ±20% of the mid-run median (unseeded runs
        # bootstrap on c0 — compare from c1; seeded runs bootstrapped
        # before the loop)
        mids = refresh_secs[0 if seed_rows else 1:-1]
        med_mid = sorted(mids)[len(mids) // 2]
        assert refresh_secs[-1] <= med_mid * 1.2 + 0.3, out
        # maintained index == from-scratch rebuild, rows and stats
        cols = ["token", "doc_id", "dl", "tf"]  # exceptAll is positional
        live = postings.read().select(*cols)
        rebuilt = bm25_postings(corpus.read()).select(*cols)
        diff = live.exceptAll(rebuilt).count() + rebuilt.exceptAll(live).count()
        assert diff == 0, diff
        st = stats.read().first()
        st_full = bm25_stats(corpus.read()).first()
        assert st["n_docs"] == st_full["n_docs"], (st, st_full)
        assert abs(st["total_dl"] - st_full["total_dl"]) < 1e-6, (st, st_full)
        out["index_matches_rebuild"] = True
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def run_semdedup_probe(spark: SparkSession) -> dict:
    """Scale proof for semantic dedup-at-ingest
    (extensions/similarity.py:incremental_semantic_dups): an incoming
    batch probes ONLY its assigned cells of the materialized IVF index,
    so the probe must (a) beat the naive batch × corpus brute-force
    cosine sweep by a wide margin, (b) demonstrably read a strict
    subset of the index's cell partitions, and (c) still find every
    planted duplicate (exact twins land in their original's cell, so
    cell pruning costs them nothing)."""
    import glob

    import numpy as np

    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        build_ivf_index,
        incremental_semantic_dups,
    )
    from urban_mobility_data_pipeline_spark.functions.vectors import cosine
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    out: dict = {"metric": "semdedup_probe"}
    root = tempfile.mkdtemp(prefix="umdp_semdedup_bench_")
    dim, k_cells, corpus_n, batch_n, planted = 32, 16, 24_000, 500, 40
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(k_cells, dim)) * 6.0
    try:
        vecs = []
        for vid in range(corpus_n):
            c = vid % k_cells
            v = centers[c] + rng.normal(size=dim)
            vecs.append((vid, [float(x) for x in v], c))
        emb = spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>, label int"
        ).coalesce(8)
        cents_rows = [
            (c, [float(x) for x in centers[c]]) for c in range(k_cells)
        ]
        cents = spark.createDataFrame(
            cents_rows, "cell int, centroid array<double>"
        )
        index = MergeTable(spark, os.path.join(root, "ivf"))
        build_ivf_index(emb, cents, index)

        # the batch: planted exact twins of corpus vectors from THREE
        # clusters plus fresh non-dup vectors from the same clusters —
        # a topically concentrated crawl, the shape cell pruning pays on
        hot = [0, 5, 11]
        batch_rows = []
        for i in range(planted):
            src = hot[i % 3] + k_cells * (i * 7 % (corpus_n // k_cells))
            batch_rows.append((100_000 + i, vecs[src][1]))
        for i in range(planted, batch_n):
            c = hot[i % 3]
            v = centers[c] + rng.normal(size=dim)
            batch_rows.append((100_000 + i, [float(x) for x in v]))
        batch = spark.createDataFrame(
            batch_rows, "vec_id long, embedding array<float>"
        ).coalesce(1)
        batch.persist().count()

        def best_of(fn, n: int = 2) -> float:
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return round(best, 2)

        thresh = 0.999
        probe_df = incremental_semantic_dups(
            batch, index, cents, threshold=thresh, nprobe=2
        )
        probe_sec = best_of(lambda: probe_df.count())
        found = {
            (r["new_id"], r["corpus_id"]) for r in probe_df.collect()
        }

        naive = (
            batch.select(
                F.col("vec_id").alias("new_id"),
                F.col("embedding").alias("__nv"),
            )
            .crossJoin(
                emb.select(
                    F.col("vec_id").alias("corpus_id"),
                    F.col("embedding").alias("__iv"),
                )
            )
            .select(
                "new_id",
                "corpus_id",
                F.round(cosine("__nv", "__iv"), 6).alias("cosine"),
            )
            .filter(F.col("cosine") >= thresh)
        )
        naive_sec = best_of(lambda: naive.count())
        naive_found = {
            (r["new_id"], r["corpus_id"]) for r in naive.collect()
        }

        # (c) every planted twin found, and nothing the sweep didn't see
        planted_pairs = {p for p in naive_found if p[0] < 100_000 + planted}
        assert len(planted_pairs) >= planted, len(planted_pairs)
        assert planted_pairs <= found <= naive_found, (
            len(planted_pairs), len(found), len(naive_found),
        )
        # (b) the probe plans a PartitionFilters entry on cell — the
        # index scan is pruned to the batch's probed cells at the
        # FileIndex level, never a full-table read
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            probe_df.explain("formatted")
        plan_txt = buf.getvalue()
        assert "PartitionFilters" in plan_txt and "cell" in plan_txt, (
            plan_txt[:2000]
        )
        all_cells = len(glob.glob(os.path.join(root, "ivf", "cell=*")))
        assert all_cells == k_cells, all_cells
        # (a) wide margin over the brute-force sweep
        assert probe_sec * 2 <= naive_sec, (probe_sec, naive_sec)
        out.update(
            {
                "corpus_vecs": corpus_n,
                "batch_vecs": batch_n,
                "planted_dups": planted,
                "probe_sec": probe_sec,
                "naive_sweep_sec": naive_sec,
                "speedup": round(naive_sec / max(probe_sec, 1e-9), 2),
                "probe_found_pairs": len(found),
                "naive_found_pairs": len(naive_found),
                "recall_vs_naive": round(
                    len(found) / max(len(naive_found), 1), 4
                ),
            }
        )
        batch.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# bq section: binary-quantized scan vs brute-force float cosine
# ---------------------------------------------------------------------------
def run_bq_scan(spark: SparkSession) -> dict:
    """Scale proof for binary-quantized search
    (extensions/similarity.py:bq_topk_from_codes): with the sign-bit
    codes STORED beside the float vectors (the deployment shape), a
    query must (a) beat the brute-force float cosine scan by reading
    16 bytes instead of 256+ per vector, (b) rerank only the
    ``candidates`` winners' float vectors, and (c) recover the exact
    top-k on a clustered corpus — the workload binary embeddings are
    deployed for.

    The corpus is generated deterministically from xxhash64 expressions
    (no RNG): 64 well-separated centers + small per-vector noise."""
    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        bq_codes,
        bq_topk_from_codes,
        cosine_topk,
    )

    out: dict = {"metric": "bq_scan"}
    root = tempfile.mkdtemp(prefix="umdp_bq_bench_")
    n, dim, cands, k, planted = 500_000, 64, 40, 10, 9
    try:
        def comp(scale: float, key):
            return (
                (
                    F.pmod(F.xxhash64(key), F.lit(2001)) - F.lit(1000)
                ).cast("double")
                / 1000.0
                * scale
            )

        # near-duplicate retrieval workload (dedup candidate
        # generation): ids 1..planted are tiny perturbations of the
        # query vector (id 0) — Hamming ~0-3 to the query — buried in
        # an isotropic background at Hamming ~dim/2. The exact top-k
        # is the planted set; the code scan must recover it.
        base = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.when(
                    F.col("id") <= planted,
                    comp(1.0, i)
                    + comp(0.05, F.col("id") * 1000003 + i),
                ).otherwise(comp(1.0, F.col("id") * 131 + i)),
            ).alias("embedding"),
        )
        emb_path = os.path.join(root, "emb")
        base.write.parquet(emb_path)
        emb = spark.read.parquet(emb_path)

        t0 = time.perf_counter()
        codes_path = os.path.join(root, "codes")
        bq_codes(emb, dim=dim).write.parquet(codes_path)
        build_sec = round(time.perf_counter() - t0, 2)
        codes = spark.read.parquet(codes_path)

        def best_of(fn, reps: int = 3) -> float:
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return round(best, 2)

        exact_df = cosine_topk(emb, query_vec_id=0, k=k)
        naive_sec = best_of(lambda: exact_df.write.format("noop")
                            .mode("overwrite").save())
        exact = [r["vec_id"] for r in exact_df.collect()]

        bq_df = bq_topk_from_codes(
            codes, emb, query_vec_id=0, k=k, candidates=cands
        )
        bq_sec = best_of(lambda: bq_df.write.format("noop")
                         .mode("overwrite").save())
        got = [r["vec_id"] for r in bq_df.collect()]

        planted_ids = set(range(1, planted + 1))
        recall = len(set(got) & set(exact)) / k
        planted_found = len(set(got) & planted_ids) / planted
        # (a) cheaper than the float scan; (c) every planted near-dup
        # recovered through the 16-byte code scan
        assert bq_sec <= naive_sec, (bq_sec, naive_sec)
        assert planted_ids <= set(exact), "exact top-k must hold twins"
        assert planted_found == 1.0, (sorted(got), sorted(exact))
        out.update(
            {
                "corpus_vecs": n,
                "dim": dim,
                "candidates": cands,
                "planted_near_dups": planted,
                "encode_sec": build_sec,
                "bq_query_sec": bq_sec,
                "naive_cosine_sec": naive_sec,
                "speedup": round(naive_sec / max(bq_sec, 1e-9), 2),
                "planted_recall": planted_found,
                "recall_at_10_vs_exact": round(recall, 4),
                "codes_bytes_per_vec": 16,
                "float_bytes_per_vec": 4 * dim,
            }
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# replicate section: delta replication vs full re-copy
# ---------------------------------------------------------------------------
def run_replicate(spark: SparkSession) -> dict:
    """Scale proof for incremental replication
    (extensions/replicate.py): with a 200k-row source and 1%-row
    change cycles, each delta cycle must (a) put EXACTLY the changed
    rows on the wire — the resource that prices cross-region
    replication — even though every source MERGE rewrites far more
    files than it changes, and (b) leave the replica content-equal to
    the source. Local wall times are reported for context; at this toy
    scale a full local re-copy is cheap, the delta's win is the 100x
    reduction in shipped rows (and, at 100 TB, in cross-region
    bytes)."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.replicate import (
        replicate_table,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    out: dict = {"metric": "replicate"}
    root = tempfile.mkdtemp(prefix="umdp_repl_bench_")
    n, batch = 200_000, 2_000
    try:
        src = MergeTable(spark, os.path.join(root, "src"))
        dst = MergeTable(spark, os.path.join(root, "dst"))
        cursor = VersionCursor(spark, os.path.join(root, "cursor"))
        base = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("body "), F.md5(F.col("id").cast("string")))
            .alias("text"),
            F.lit("en").alias("lang"),
        )
        src.create(base)

        t0 = time.perf_counter()
        replicate_table(src, dst, cursor, "doc_id")
        bootstrap_sec = round(time.perf_counter() - t0, 2)

        cycle_secs, upserts = [], []
        for c in range(1, 4):
            upd = spark.range(c * batch, (c + 1) * batch).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit(f"rev{c} "), F.md5(F.col("id").cast("string")))
                .alias("text"),
                F.lit("en").alias("lang"),
            )
            src.merge(
                upd,
                keys=["doc_id"],
                update_set={
                    "text": F.col("s.text"),
                    "lang": F.col("s.lang"),
                },
                insert=True,
            )
            t0 = time.perf_counter()
            r = replicate_table(src, dst, cursor, "doc_id")
            cycle_secs.append(round(time.perf_counter() - t0, 2))
            upserts.append(r["upserted"])

        t0 = time.perf_counter()
        full = MergeTable(spark, os.path.join(root, "full"))
        full.create(src.read())
        full_copy_sec = round(time.perf_counter() - t0, 2)

        diff = (
            src.read()
            .select("doc_id", "text")
            .exceptAll(dst.read().select("doc_id", "text"))
            .count()
        )
        assert diff == 0, diff
        # (a) the wire carries the TRUE row delta — exactly the batch,
        # even though each source MERGE rewrote far more files
        assert upserts == [batch] * 3, upserts
        out.update(
            {
                "src_rows": n,
                "changed_per_cycle": batch,
                "bootstrap_sec": bootstrap_sec,
                "cycle_secs": cycle_secs,
                "cycle_upserts": upserts,
                "full_copy_sec": full_copy_sec,
                "rows_shipped_per_cycle": upserts[0],
                "rows_shipped_full_copy": n,
                "wire_reduction": round(n / max(upserts[0], 1), 1),
            }
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# scaling section: corpus-operator wall vs data volume
# ---------------------------------------------------------------------------
def run_scaling(spark: SparkSession) -> dict:
    """Scaling-law evidence for the headline corpus operators: run
    exact dedup, MinHash-LSH pair generation, and BM25 top-k at 1x /
    2x / 4x of the sf0.1 documents table (volume grown by replicating
    rows under fresh doc_ids — same text distribution, same bucket
    skew) and assert the wall grows SUB-QUADRATICALLY (t(4x)/t(1x)
    well under 16x; the pair pipeline's bound is O(sum bucket^2),
    which this corpus's duplicate structure keeps near-linear). The
    design claim every operator docstring makes, measured."""
    from urban_mobility_data_pipeline_spark.cache import release_scratch
    from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES

    out: dict = {"metric": "corpus_scaling"}
    root = tempfile.mkdtemp(prefix="umdp_scale_bench_")
    base_dir = "/root/testdata/sf0.1"
    # doc_near_dup_pairs_capped rides along (VERDICT r8 item 1): the
    # per-bucket cap + secondary banding must hold the pair join's
    # growth at-or-under the uncapped query's on this exact-replica
    # corpus (the bucket-densifying worst case)
    names = [
        "dedup_exact_docs",
        "doc_near_dup_pairs",
        "doc_near_dup_pairs_capped",
        "doc_bm25_topk",
    ]
    try:
        base = spark.read.parquet(f"{base_dir}/documents.parquet")
        n_base = base.count()
        walls: dict[str, list[float]] = {n: [] for n in names}
        for mult in (1, 2, 4):
            d = os.path.join(root, f"x{mult}")
            os.makedirs(d)
            df = base
            for k in range(1, mult):
                df = df.unionByName(
                    base.withColumn(
                        "doc_id", F.col("doc_id") + F.lit(k * 10_000_000)
                    )
                )
            df.write.parquet(os.path.join(d, "documents.parquet"))
            for name in names:
                t0 = time.perf_counter()
                QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[name].append(round(time.perf_counter() - t0, 2))
                release_scratch()
                spark.catalog.clearCache()
        ratios = {
            n: round(w[2] / max(w[0], 1e-9), 2) for n, w in walls.items()
        }
        # 4x data must cost far less than the quadratic 16x
        for n, r in ratios.items():
            assert r < 8.0, (n, walls[n])
        # the capped pair join must not grow FASTER than the uncapped
        # one on the bucket-densifying worst case
        assert (
            ratios["doc_near_dup_pairs_capped"]
            <= ratios["doc_near_dup_pairs"] + 0.3
        ), ratios
        out.update(
            {
                "base_docs": n_base,
                "multipliers": [1, 2, 4],
                "wall_secs": walls,
                "t4x_over_t1x": ratios,
            }
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out



# ---------------------------------------------------------------------------
# kmeans section: Lloyd's at synthetic-corpus scale
# ---------------------------------------------------------------------------
def run_kmeans_scale(spark: SparkSession) -> dict:
    """Scale proof for spherical_kmeans: 100k and 400k synthetic 64-d
    vectors (8 planted clusters + per-id jitter, generated JVM-side and
    localCheckpointed so generation cost stays out of the timing).
    Asserts the wall grows near-linearly (4x data < 8x time) — each
    iteration is one broadcast join + one (cell, pos) aggregate, so
    nothing in the plan is super-linear in the corpus."""
    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        spherical_kmeans,
    )

    out: dict = {"metric": "kmeans_scale", "k": 8, "iters": 3, "dim": 64}
    sizes = (100_000, 400_000)
    walls: list[float] = []
    for n in sizes:
        vec = F.array(
            *[
                (
                    F.sin((F.col("id") % 8) * 31.0 + F.lit(float(j)))
                    + F.sin(F.col("id") * 7.0 + F.lit(float(j))) * 0.1
                ).cast("double")
                for j in range(64)
            ]
        )
        emb = (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
            .localCheckpoint()
        )
        t0 = time.time()
        assignments, cents = spherical_kmeans(emb, k=8, iters=3)
        n_assigned = assignments.count()
        walls.append(round(time.time() - t0, 2))
        assert n_assigned == n, n_assigned
        emb.unpersist()
    out["n"] = list(sizes)
    out["secs"] = walls
    out["ratio_4x"] = round(walls[1] / max(walls[0], 1e-9), 2)
    out["near_linear"] = out["ratio_4x"] < 8
    assert out["near_linear"], out
    return out


def run_bpe_merges(spark: SparkSession) -> dict:
    """BPE training at realistic merge counts (VERDICT r7 item 8): the
    per-merge driver round-trip is the documented cost model of
    ``learn_bpe``; this section measures whether merges/sec stays FLAT
    across a 2,000-rule run (the per-round localCheckpoint must keep
    planning O(1) — without it, round r re-analyzes r nested folds and
    the curve is quadratic). The sf0.1 word-salad corpus has only 31
    distinct words, so the vocabulary here is synthesized: 20k
    deterministic hex words, 4-13 chars — enough pair diversity to
    sustain 2k distinct rules. Gate: the last 200-merge block runs at
    ≥ 0.6× the median block's merges/sec."""
    from urban_mobility_data_pipeline_spark.extensions.bpe import learn_bpe

    out: dict = {"metric": "bpe_merges"}
    vocab_n, n_merges, block = 20_000, 2_000, 200
    words = spark.range(vocab_n).select(
        F.expr(
            "substring(sha2(CAST(id AS STRING), 256), 1, "
            "CAST(4 + id % 10 AS INT))"
        ).alias("text")
    )
    times: list = []
    state = {"last": time.perf_counter()}

    def on_round(_rank: int) -> None:
        now = time.perf_counter()
        times.append(now - state["last"])
        state["last"] = now

    t0 = time.perf_counter()
    merges = learn_bpe(words, n_merges=n_merges, on_round=on_round)
    wall = time.perf_counter() - t0
    blocks = [
        sum(times[i : i + block]) for i in range(0, len(times), block)
    ]
    rate = [round(min(block, len(times) - i) / b, 1)
            for i, b in zip(range(0, len(times), block), blocks)]
    out.update(
        {
            "vocab_words": vocab_n,
            "merges_learned": len(merges),
            "wall_s": round(wall, 1),
            "block_size": block,
            "merges_per_sec_by_block": rate,
            "overall_merges_per_sec": round(len(merges) / wall, 1),
        }
    )
    assert len(merges) == n_merges, len(merges)
    med = sorted(rate)[len(rate) // 2]
    assert rate[-1] >= med * 0.6, out

    # VERDICT r8 item 3: batched trainer. Fast mode (batch_size=32,
    # strict=False — skip-conflict selection + ONE single-pass
    # multi-rule rewrite per round, constant per-round cost) must run
    # >=5x the sequential rate at the same 2,000 rules. Exact-batched
    # mode (strict=True) is measured too: provably rule-identical,
    # bounded by conflict density (this hex corpus is its worst case).
    t0 = time.perf_counter()
    batch_sizes: list = []
    fast = learn_bpe(
        words, n_merges=n_merges, batch_size=32, strict=False,
        on_batch=batch_sizes.append,
    )
    wall_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    exact = learn_bpe(words, n_merges=n_merges, batch_size=16)
    wall_exact = time.perf_counter() - t0
    assert [
        (m["left"], m["right"], m["freq"]) for m in exact
    ] == [(m["left"], m["right"], m["freq"]) for m in merges], (
        "exact-batched diverged from sequential"
    )
    out.update(
        {
            "fast_wall_s": round(wall_fast, 1),
            "fast_merges_per_sec": round(len(fast) / wall_fast, 1),
            "fast_speedup_vs_sequential": round(wall / wall_fast, 2),
            "fast_spark_rounds": len(batch_sizes),
            "fast_avg_realized_batch": round(
                len(fast) / max(1, len(batch_sizes)), 2
            ),
            "exact_batched_wall_s": round(wall_exact, 1),
            "exact_batched_speedup": round(wall / wall_exact, 2),
            "exact_batched_rule_identical": True,
        }
    )
    assert len(fast) == n_merges, len(fast)
    # the GATE is the deterministic realized batch size (rules learned
    # per Spark round — the quantity batching exists to raise), not the
    # wall-clock ratio: a contended host can't fail it spuriously and a
    # fast host can't pass a batching regression (advisor r9). The wall
    # speedup stays in the artifact as the observed consequence.
    assert out["fast_avg_realized_batch"] >= 5.0, out
    return out



def run_bpe_divergence(spark: SparkSession) -> dict:
    """VERDICT r9 item 5: quantify what fast-mode BPE's rule-order
    freedom actually costs at PRODUCTION vocab size, so users know what
    they're buying. strict=False (batch 32) vs the exact sequential
    trajectory at 10k merges on a Zipf-frequency corpus with realistic
    character diversity (hex words, 4-13 chars, log-uniform rank
    draw).

    The sequential gold comes from ``sequential_bpe_reference`` — the
    distributed trainer's word-frequency model collects to the driver
    (Zipf-bounded, the MODEL not the data) and the exact trajectory
    replays in incremental Python (pinned rule-for-rule against the
    naive Sennrich reference by tests/test_bpe.py); running
    ``learn_bpe(batch_size=1)`` to 10k rules would take ~an hour of
    Spark rounds to compute the identical list. Reported:

    - rule_set_agreement: |gold ∩ fast| / n — merges learned by both,
      order-blind (the vocabulary overlap);
    - rule_order_agreement: fraction of ranks where both lists hold
      the same rule (stricter; drops fast after the first divergence);
    - fertility (freq-weighted tokens/word) under BOTH rule lists via
      one consistent encoder, and the delta — the number that actually
      hits a downstream training budget.
    """
    from urban_mobility_data_pipeline_spark.extensions.bpe import (
        bpe_encode_word,
        learn_bpe,
        sequential_bpe_reference,
        word_frequencies,
    )

    out: dict = {"metric": "bpe_divergence"}
    vocab_n, n_tokens, n_merges = 20_000, 300_000, 10_000
    # Zipf token stream: token i draws a vocab rank log-uniformly
    # (Zipf-ish pmf), word text = hex of the rank (diverse char pairs)
    u = (
        F.pmod(F.xxhash64(F.col("id"), F.lit("w")), F.lit(1_000_003))
        / F.lit(1_000_003.0)
    )
    rank = F.greatest(
        F.lit(1),
        F.floor(F.exp(u * F.lit(math.log(float(vocab_n))))).cast("int"),
    )
    words = spark.range(n_tokens).select(rank.alias("rk")).select(
        F.expr(
            "substring(sha2(CAST(rk AS STRING), 256), 1, "
            "CAST(4 + rk % 10 AS INT))"
        ).alias("text")
    )
    wf = {
        r["word"]: r["freq"] for r in word_frequencies(words).collect()
    }
    out["distinct_words"] = len(wf)
    out["total_tokens"] = n_tokens
    out["n_merges"] = n_merges

    t0 = time.perf_counter()
    gold = sequential_bpe_reference(wf, n_merges)
    out["gold_wall_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    batch_sizes: list = []
    fast = learn_bpe(
        words, n_merges=n_merges, batch_size=32, strict=False,
        on_batch=batch_sizes.append,
    )
    out["fast_wall_s"] = round(time.perf_counter() - t0, 1)
    out["fast_avg_realized_batch"] = round(
        len(fast) / max(1, len(batch_sizes)), 2
    )
    n = min(len(gold), len(fast))
    out["merges_learned"] = {"gold": len(gold), "fast": len(fast)}
    gset = {(m["left"], m["right"]) for m in gold[:n]}
    fset = {(m["left"], m["right"]) for m in fast[:n]}
    out["rule_set_agreement"] = round(len(gset & fset) / max(1, n), 4)
    out["rule_order_agreement"] = round(
        sum(
            1
            for a, b in zip(gold[:n], fast[:n])
            if (a["left"], a["right"]) == (b["left"], b["right"])
        )
        / max(1, n),
        4,
    )

    def fertility(merges: list) -> float:
        ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
        tot_tok = tot_w = 0
        for w, f in wf.items():
            tot_tok += f * len(bpe_encode_word(w, ranks))
            tot_w += f
        return tot_tok / tot_w

    fg, ff = fertility(gold), fertility(fast)
    out["fertility_gold"] = round(fg, 4)
    out["fertility_fast"] = round(ff, 4)
    out["fertility_delta_pct"] = round((ff - fg) / fg * 100, 3)
    out["recommendation"] = (
        "fast mode buys its ~14x throughput with a substantially "
        f"DIFFERENT vocabulary (rule-set agreement "
        f"{out['rule_set_agreement']:.0%}, order agreement ~0 at "
        f"{n_merges} merges on Zipf text) that tokenizes essentially "
        f"as well (fertility delta {out['fertility_delta_pct']:+.2f}%). "
        "Use it when training a NEW tokenizer and compression quality "
        "is the target metric; use batch_size=1 / strict batching when "
        "the exact sequential vocabulary is the requirement — "
        "reproducing a published tokenizer, extending an existing "
        "vocab, or cross-engine rule parity"
    )
    return out




# ---------------------------------------------------------------------------
# embedding-ingest soak under Zipf-clustered vectors (VERDICT r11 item 5:
# the semantic saturation guard's production consumer, soaked)
# ---------------------------------------------------------------------------
def _gen_zipf_vectors(
    spark: SparkSession, path: str, n: int, id_offset: int = 0,
    dim: int = 16, n_clusters: int = 64,
) -> None:
    """Zipf-clustered vector feed (bench_scaling's emb-zipf mixture,
    feed-shaped): cluster drawn rank ≈ exp(U·ln C) so the hottest
    cluster holds ~1/ln(C) of the corpus and ANY fixed quantizer's
    matching cell grows linearly with it. Deterministic, parquet."""
    import math as _math

    u = (
        F.pmod(F.xxhash64(F.col("vec_id"), F.lit("cl")), F.lit(1_000_003))
        / F.lit(1_000_003.0)
    )
    cluster = (
        F.floor(F.exp(u * F.lit(_math.log(float(n_clusters))))) - 1
    ).cast("int")
    base = spark.range(id_offset, id_offset + n).select(
        F.col("id").alias("vec_id")
    ).withColumn("__label", cluster)
    center = lambda i: (  # noqa: E731
        F.when(
            F.pmod(F.xxhash64(F.col("__label"), i, F.lit("c")), F.lit(2))
            == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
    )
    jitter = lambda i: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit("j")), F.lit(997))
        .cast("double")
        / 997.0
        - 0.5
    )
    base.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (center(i) + jitter(i) * 0.6).cast("float"),
        ).alias("embedding"),
    ).repartition(4).write.mode("overwrite").parquet(path)


def run_embedding_ingest_soak_zipf(spark: SparkSession) -> dict:
    """The embedding door under realistic cluster skew (VERDICT r11
    item 5's soak): a FIXED coarse quantizer (the not-yours-to-retrain
    regime) over a Zipf-clustered corpus leaves the hottest cell far
    over the cap; each cycle a constant batch of new vectors runs the
    full production door (validate → guarded probe → MERGE → O(changed)
    index refresh). Gates: per-cycle wall stays FLAT while the corpus
    (and its hot cell) grows — the guard bounds the pair join at
    O(batch × cap); saturated-cell skips are reported EVERY cycle and
    fully-unchecked vectors divert EVERY cycle, never silently."""
    from urban_mobility_data_pipeline_spark.extensions.embedding_ingest import (
        ingest_embedding_feed,
    )
    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        build_ivf_index,
        spherical_kmeans,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    seed_rows, batch, cycles, cap = 40_000, 2_000, 6, 6_000
    out: dict = {
        "metric": "embedding_ingest_soak_zipf",
        "seed_rows": seed_rows,
        "batch_vectors": batch,
        "cell_cap": cap,
        "nprobe": 1,
    }
    root = tempfile.mkdtemp(prefix="umdp_embingest_zipf_")
    try:
        corpus = MergeTable(spark, os.path.join(root, "embeddings"))
        quarantine = MergeTable(spark, os.path.join(root, "quarantine"))
        index = MergeTable(spark, os.path.join(root, "emb_index"))
        cursor = VersionCursor(spark, os.path.join(root, "cursor"))
        qdir = os.path.join(root, "quantizer")
        seed = os.path.join(root, "seed")
        _gen_zipf_vectors(spark, seed, seed_rows, id_offset=10_000_000)
        corpus.create(spark.read.parquet(seed))
        # FIXED k=16 quantizer trained once on the seed (deliberately
        # too coarse for the skew — the adaptive path would train
        # k=ceil(sqrt(cN))~400 and dissolve the hot cell; this soak
        # proves the door survives when the quantizer is frozen)
        _, cents = spherical_kmeans(
            corpus.read(), k=16, iters=2
        )
        cents.coalesce(1).write.mode("overwrite").parquet(qdir)
        build_ivf_index(corpus.read(), spark.read.parquet(qdir), index)
        cursor.upsert("ivf_index", corpus.history()[0]["version"], "OK")
        hot = (
            index.read().groupBy("cell").count()
            .orderBy(F.col("count").desc()).first()
        )
        out["max_cell_seed"] = int(hot["count"])
        assert out["max_cell_seed"] > cap, out  # the hazard is planted
        cycle_secs, skips, unchecked, upserted = [], [], [], []
        for c in range(cycles):
            feed = os.path.join(root, f"f{c}")
            _gen_zipf_vectors(spark, feed, batch, id_offset=c * batch)
            t0 = time.perf_counter()
            counts = ingest_embedding_feed(
                spark, feed, corpus, quarantine,
                quantizer_dir=qdir, index=index, index_cursor=cursor,
                fmt="parquet", nprobe=1, cell_cap=cap,
                dup_threshold=0.999,
            )
            cycle_secs.append(round(time.perf_counter() - t0, 2))
            skips.append(counts["sem_skipped_cells"])
            unchecked.append(counts["sem_unchecked"])
            upserted.append(counts["upserted"])
        out.update(
            {
                "cycles": cycles,
                "cycle_secs": cycle_secs,
                "skipped_cells_per_cycle": skips,
                "unchecked_per_cycle": unchecked,
                "upserted_per_cycle": upserted,
                "corpus_rows_final": corpus.read().count(),
            }
        )
        # the hot cell is skipped AND reported every cycle; vectors
        # whose only probe saturated divert every cycle — never silent
        assert all(s > 0 for s in skips), out
        assert all(u > 0 for u in unchecked), out
        assert all(n > 0 for n in upserted), out  # the door still admits
        # flat door under skew: O(batch x cap) probe + O(changed)
        # refresh — the growing hot cell must not bend the curve
        mids = cycle_secs[:-1]
        med = sorted(mids)[len(mids) // 2]
        assert cycle_secs[-1] <= med * 1.35 + 0.5, out
        # dead letters carry the saturated cells (operator-actionable)
        dead = quarantine.read().filter(
            F.col("raw_record").contains("sem_dedup_unchecked")
        )
        assert dead.count() == sum(unchecked), out
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# quality-model lifecycle soak (VERDICT r11 item 6: the pieces composed
# end-to-end — door gates -> histogram fold -> PSI trigger -> retrain ->
# fingerprint-keyed rescore -> mid-soak erasure through the artifact)
# ---------------------------------------------------------------------------
def _gen_quality_feed(
    spark: SparkSession, path: str, n: int, id_offset: int = 0,
    n_tokens: int = 24, files: int = 4,
) -> None:
    """_gen_feed's word salad with a configurable length: the drift
    feeds use n_tokens≈180, shifting the classifier's x1 (clipped
    word-count) feature from bin ~2 to bin ~18 — a distribution move
    the PSI trigger must catch — while still PASSING every door gate
    (stopwords present, no punctuation, fluent-enough word salad)."""
    words = F.array(*[F.lit(w) for w in (
        "the", "data", "spark", "merge", "corpus", "table", "join",
        "filter", "window", "batch", "stream", "quality", "token", "a",
        "in", "is", "scan",
    )])
    base = spark.range(id_offset, id_offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(n_tokens)),
                lambda i: F.element_at(
                    words,
                    (F.pmod(F.xxhash64(F.col("id") * 31 + i), F.lit(17)) + 1)
                    .cast("int"),
                ),
            ),
        ).alias("text"),
        F.lit("en").alias("lang"),
    )
    base.select(
        F.to_json(F.struct("doc_id", "text", "lang")).alias("value")
    ).coalesce(files).write.mode("overwrite").text(path)


def run_quality_lifecycle(spark: SparkSession) -> dict:
    """One composed soak of the maintained quality-model lifecycle the
    CLI jobs run nightly (corpus_ingest -> quality_model_refresh ->
    quality_scores_refresh), over a feed that DRIFTS mid-soak, with a
    GDPR erasure landing between ticks. Each tick: the full ingest
    door (saturation-guarded dedup + model gate once the artifact
    exists) -> O(changed) histogram fold + PSI check (retrain on
    trigger) -> fingerprint-keyed score fold. Pinned invariants, every
    tick: the maintained histogram equals a from-scratch recount (the
    r12 cursor fix under real interleaving — erase -> rebuild ->
    ingest -> fold), and the scores table NEVER carries a stale model
    fingerprint (a retrain forces exactly one full rescore). Gates:
    non-retrain tick cost stays flat; the drift feed trips PSI."""
    from urban_mobility_data_pipeline_spark.extensions.classifier import (
        artifact_exists,
    )
    from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
        _model_fingerprint,
        clf_hist_contributions,
        rebuild_quality_classifier,
        refresh_quality_classifier,
        refresh_quality_scores,
    )
    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        ingest_feed,
    )
    from urban_mobility_data_pipeline_spark.extensions.dedup_index import (
        refresh_dedup_index,
    )
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        ModelArtifact,
        erase_document_ids,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        _LOGREG_FEATURE_COLS,
        _logreg_feature_frame,
    )

    def feature_frame(docs):
        # the CLI adapter's shape: managed corpus tables carry lang,
        # not source (run.py._quality_feature_frame)
        if "source" not in docs.columns:
            docs = docs.withColumn("source", F.lit("corpus"))
        return _logreg_feature_frame(docs)

    seed_rows, batch, ticks = 6_000, 1_500, 6
    drift_from, erase_at, erase_n = 4, 3, 50
    out: dict = {
        "metric": "quality_lifecycle_soak",
        "seed_rows": seed_rows,
        "batch_docs": batch,
        "ticks": ticks,
        "drift_from_tick": drift_from,
        "erase_before_tick": erase_at,
    }
    root = tempfile.mkdtemp(prefix="umdp_qlife_")
    try:
        corpus = MergeTable(spark, os.path.join(root, "documents"))
        quarantine = MergeTable(spark, os.path.join(root, "quarantine"))
        index = MergeTable(
            spark, os.path.join(root, "dedup_index"),
            bucket_keys=["doc_id"], num_buckets=16,
        )
        sizes = MergeTable(spark, os.path.join(root, "sizes"))
        dcursor = VersionCursor(spark, os.path.join(root, "dcursor"))
        hist = MergeTable(spark, os.path.join(root, "clf_hist"))
        mcursor = VersionCursor(spark, os.path.join(root, "mcursor"))
        scores = MergeTable(spark, os.path.join(root, "scores"))
        scursor = VersionCursor(spark, os.path.join(root, "scursor"))
        model_dir = os.path.join(root, "quality_model")

        # bootstrap (untimed): seed ingest, dedup index, model, scores
        seed = os.path.join(root, "seed")
        _gen_quality_feed(spark, seed, seed_rows, id_offset=1_000_000)
        ingest_feed(spark, seed, corpus, quarantine)
        refresh_dedup_index(corpus, index, dcursor, sizes=sizes)
        refresh_quality_classifier(
            corpus, model_dir, hist, mcursor,
            feature_frame, _LOGREG_FEATURE_COLS,
        )
        refresh_quality_scores(
            corpus, model_dir, scores, scursor,
            feature_frame, _LOGREG_FEATURE_COLS,
        )

        def hist_ok() -> bool:
            got = {
                (r["feat"], r["b"]): r["c"]
                for r in hist.read().filter(F.col("c") > 0).collect()
            }
            want = {
                (r["feat"], r["b"]): r["c"]
                for r in clf_hist_contributions(
                    feature_frame(corpus.read()), _LOGREG_FEATURE_COLS
                ).collect()
            }
            return got == want

        def fp_ok() -> bool:
            fp_path = scores._local_path().rstrip("/") + "_model_fp"
            with open(fp_path) as f:
                stored = f.read().strip()
            live = _model_fingerprint(
                spark.read.parquet(model_dir).collect()[0]
            )
            return stored == live

        tick_secs, psis, retrains, score_modes, gated = [], [], [], [], []
        for t in range(ticks):
            if t == erase_at:
                # GDPR lands MID-SOAK: rows go, the artifact retrains
                # against the post-erasure corpus, and the histogram
                # cursor advances with the reseed (the r12 fix) so the
                # NEXT fold starts clean
                victims = [
                    r["doc_id"]
                    for r in corpus.read().limit(erase_n).collect()
                ]
                art = ModelArtifact(
                    model_dir,
                    model_dir + "_train_hist",
                    retrain=lambda: rebuild_quality_classifier(
                        corpus, model_dir, hist,
                        feature_frame, _LOGREG_FEATURE_COLS,
                        cursor=mcursor,
                    ),
                )
                erase_document_ids(
                    spark, victims,
                    {"documents": corpus, "dedup_index": index},
                    artifacts={"quality_classifier": art},
                )
                assert hist_ok(), "hist stale right after erase+rebuild"
            feed = os.path.join(root, f"f{t}")
            _gen_quality_feed(
                spark, feed, batch, id_offset=t * batch,
                n_tokens=180 if t >= drift_from else 24,
            )
            t0 = time.perf_counter()
            counts = ingest_feed(
                spark, feed, corpus, quarantine,
                dedup_index=index, dedup_cursor=dcursor,
                dedup_sizes=sizes,
                quality_model_dir=(
                    model_dir if artifact_exists(model_dir) else None
                ),
            )
            rm = refresh_quality_classifier(
                corpus, model_dir, hist, mcursor,
                feature_frame, _LOGREG_FEATURE_COLS,
            )
            rs = refresh_quality_scores(
                corpus, model_dir, scores, scursor,
                feature_frame, _LOGREG_FEATURE_COLS,
            )
            tick_secs.append(round(time.perf_counter() - t0, 2))
            psis.append(rm["psi"])
            retrains.append(rm["retrained"])
            score_modes.append(rs["mode"])
            gated.append(counts["model_gated"])
            # invariants OUTSIDE the timer: exact histogram, no stale
            # fingerprint, retrain => one full rescore
            assert hist_ok(), f"hist drifted at tick {t}"
            assert fp_ok(), f"stale score fingerprint at tick {t}"
            if rm["retrained"]:
                assert rs["mode"] == "full", (t, rs)
        out.update(
            {
                "tick_secs": tick_secs,
                "psi_per_tick": psis,
                "retrained_per_tick": retrains,
                "score_mode_per_tick": score_modes,
                "model_gated_per_tick": gated,
                "corpus_rows_final": corpus.read().count(),
                "hist_exact_every_tick": True,
                "fingerprint_fresh_every_tick": True,
            }
        )
        # the drift feed must trip the PSI trigger at least once
        assert any(
            r for r, t in zip(retrains, range(ticks)) if t >= drift_from
        ), out
        # steady-state ticks (no retrain) stay flat: O(changed) folds
        steady = [
            s for s, r in zip(tick_secs, retrains) if not r
        ]
        assert len(steady) >= 3, out
        med = sorted(steady[:-1])[len(steady[:-1]) // 2]
        assert steady[-1] <= med * 1.5 + 1.0, out
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


if __name__ == "__main__":
    sys.exit(main())
