#!/usr/bin/env python
"""Benchmark: run the full query catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "catalog_wall_sec", "value": <total>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <float>}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Stdout carries only the JSON line; Spark chatter goes to
stderr.

The driver captures only the LAST 2000 chars of stdout, and the full
per-query map for the 64-query catalog exceeds that — every recorded
``BENCH_r{N}.json`` through r4 had ``parsed: null`` and a
head-truncated ``tail``. Two-part fix (VERDICT r4 item 2): the complete
per-query map is written to a committed ``BENCH_LOCAL_r{N}.json``
beside this file, and the stdout line self-trims (slowest queries
first, a ``queries_omitted`` count, and a ``full`` pointer to the local
artifact) until it fits the capture window, so ``parsed`` is real JSON
again. Baseline comparison prefers the complete local artifacts over
driver-truncated tails.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from urban_mobility_data_pipeline_spark.cache import release_scratch
from urban_mobility_data_pipeline_spark.plans import llm_ops as _llm_ops
from urban_mobility_data_pipeline_spark.plans.catalog import FLAGSHIP, QUERIES
from urban_mobility_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="umdp-bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(int(cpus), 8)),
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("WARN")

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        # a query may persist() intermediates (e.g. the staged shingle
        # table in near-dup detection); drop them so cached blocks can't
        # leak heap into the queries that run after it. release_scratch
        # unpins the registered staging frames (so clearCache's eviction
        # isn't fighting pinned relations), then clearCache sweeps any
        # remainder.
        release_scratch()
        spark.catalog.clearCache()
        return elapsed

    # best-of-N: per-query minimum over N passes. The noop-sink work is
    # identical each pass, so the minimum estimates the true cost with
    # transient host contention (shared-VM CPU steal) filtered out.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))

    run_once(FLAGSHIP)  # JVM/codegen warmup, uncounted

    # fixed CPU-bound calibration probe (no IO, no shuffle): cross-run
    # comparisons divide by this to normalize away shared-VM "weather"
    # (host frequency scaling / steal), which measurably moved absolute
    # times 1.3-2x WITHIN round 6 on identical code (see notes).
    from pyspark.sql import functions as _F

    t0 = time.perf_counter()
    (
        spark.range(200_000_000)
        .select(_F.xxhash64("id").alias("h"))
        # avg, not sum: summing 200M xxhash64 longs overflows under
        # the session's ANSI mode; avg is the same per-row work
        .agg(_F.avg("h"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    calibration = round(time.perf_counter() - t0, 4)

    # concurrency-matched probe pair (VERDICT r11 item 4): the legacy
    # probe above splits 200M rows into short default-parallelism
    # tasks, so it mostly tracks single-core frequency/steal — r11's
    # driver run measured it 1.86x FASTER while the 32-way workload
    # read 1.14x slower (inverse drift: the host's cores got quicker
    # but more contended). These two run the SAME xxhash64 loop as one
    # long single task (pure single-core story) and as cpus-many
    # copies of that identical task (the multi-core envelope the
    # catalog queries actually feel). The gate can then pick the
    # corrector whose own drift is in-band instead of forfeiting
    # normalization whenever the single-core story diverges.
    _PER_TASK = 20_000_000
    t0 = time.perf_counter()
    (
        spark.range(_PER_TASK, numPartitions=1)
        .select(_F.xxhash64("id").alias("h"))
        .agg(_F.avg("h"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    calibration_ser = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    (
        spark.range(_PER_TASK * int(cpus), numPartitions=int(cpus))
        .select(_F.xxhash64("id").alias("h"))
        .agg(_F.avg("h"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    calibration_par = round(time.perf_counter() - t0, 4)

    # fixed small-file IO probe (write 64 tiny parquet files, read them
    # back): the CPU probe above cannot correct IO weather, and the
    # rows that build index structures in-query (many small metadata
    # round-trips) are the ones that move with it — r9's apparent
    # doc_bm25_topk_indexed "regression" was exactly this (isolated
    # A/B of r8 vs r9 code showed r9 equal-or-faster; only the shared
    # bench context differed). Recording both probes lets a reader
    # attribute a mover to CPU vs IO weather before calling it a plan
    # change.
    import shutil
    import tempfile

    _io_dir = tempfile.mkdtemp(prefix="umdp_bench_io_")
    t0 = time.perf_counter()
    (
        spark.range(1_000_000)
        .repartition(64)
        .write.mode("overwrite")
        .parquet(_io_dir + "/probe")
    )
    (
        spark.read.parquet(_io_dir + "/probe")
        .agg(_F.count(_F.lit(1)))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    calibration_io = round(time.perf_counter() - t0, 4)
    shutil.rmtree(_io_dir, ignore_errors=True)

    timings: dict[str, float] = {}
    # build/probe sub-phase split for queries that declare one via
    # llm_ops.PHASE_SECS (VERDICT r9 item 1); kept aligned with the
    # pass that produced the recorded min
    phases: dict[str, dict[str, float]] = {}
    for _ in range(repeats):
        for name in sorted(QUERIES):
            _llm_ops.PHASE_SECS.pop(name, None)
            try:
                t = run_once(name)
            except Exception as exc:  # a broken query must not hide the rest
                print(f"bench: {name} failed: {exc}", file=sys.stderr)
                timings[name] = -1.0
                continue
            prev = timings.get(name)
            if prev is None or (prev > 0 and t < prev):
                timings[name] = round(t, 4)
                fold_phase_min(phases, name, t, _llm_ops.PHASE_SECS.get(name))

    total = round(sum(t for t in timings.values() if t >= 0), 4)

    here = os.path.dirname(os.path.abspath(__file__))
    driver_rounds = [
        int(re.fullmatch(r"BENCH_r(\d+)\.json", f).group(1))
        for f in os.listdir(here)
        if re.fullmatch(r"BENCH_r\d+\.json", f)
    ]
    this_round = (max(driver_rounds) + 1) if driver_rounds else 1

    # regression check against the committed previous-round bench (same
    # sf only): any query >2x its prior time is flagged — visible in the
    # JSON and loudly on stderr, so a slow round can't pass silently.
    # Prefer our own BENCH_LOCAL (complete per-query map) over the
    # driver's BENCH_r (2000-char-truncated tail).
    regressions: dict[str, dict[str, float]] = {}
    gate_stats: dict[str, float | str] = {}
    baseline_path = os.environ.get("SPARK_GRAFT_BENCH_BASELINE")
    if baseline_path is None:
        candidates = sorted(
            f
            for f in os.listdir(here)
            if re.fullmatch(r"BENCH_(LOCAL_)?r\d+\.json", f)
            and f != f"BENCH_LOCAL_r{this_round:02d}.json"
        )
        local = [f for f in candidates if f.startswith("BENCH_LOCAL_")]
        pick = local[-1] if local else (candidates[-1] if candidates else None)
        baseline_path = os.path.join(here, pick) if pick else None
    if baseline_path and os.path.isfile(baseline_path):
        try:
            with open(baseline_path) as f:
                base = json.load(f)
            if base.get("sf") == sf:
                prev_times = base.get("queries") or {}
                if not prev_times and "tail" in base:
                    # driver-recorded BENCH_r{N}.json wraps our JSON line
                    # in a (possibly truncated) "tail" string — recover
                    # the per-query pairs from it
                    prev_times = {
                        k: float(v)
                        for k, v in re.findall(
                            r'"([a-z_0-9]+)": ([0-9.]+)', base["tail"]
                        )
                    }
                base_cal = base.get("calibration_sec") or 0.0
                base_cal_par = base.get("calibration_par_sec") or 0.0
                regressions, gate_stats = gate_regressions(
                    timings,
                    prev_times,
                    calibration,
                    base_cal,
                    calibration_par=calibration_par,
                    base_cal_par=base_cal_par,
                )
                for name, r in regressions.items():
                    print(
                        f"bench: REGRESSION {name}: {r['prev']}s -> "
                        f"{r['now']}s (raw {r['raw_ratio']:.2f}x, "
                        f"normalized {r['norm_ratio']:.2f}x, gate "
                        f"{gate_stats['gate_mode']})",
                        file=sys.stderr,
                    )
                if gate_stats.get("calibration_drift_alert"):
                    print(
                        "bench: CALIBRATION DRIFT "
                        f"{gate_stats['calibration_drift']:.2f}x vs "
                        "baseline — the CPU probe cannot be trusted as "
                        "a corrector this run; gate fell back to "
                        "min(raw, normalized). Any mover this round "
                        "needs an isolated same-host A/B (the bm25 "
                        "protocol) before being called real OR weather.",
                        file=sys.stderr,
                    )
        except Exception as exc:
            print(f"bench: baseline compare failed: {exc}", file=sys.stderr)

    result = {
        "metric": "catalog_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calibration_sec": calibration,
        "calibration_ser_sec": calibration_ser,
        "calibration_par_sec": calibration_par,
        "calibration_io_sec": calibration_io,
        "regressions": regressions,
        "gate": gate_stats,
    }

    # durable, complete artifact (committed per round) — carries BOTH
    # the raw seconds and the calibration-normalized map (t divided by
    # this run's CPU probe), so any two rounds compare in
    # machine-independent units
    local_name = f"BENCH_LOCAL_r{this_round:02d}.json"
    queries_normalized = (
        {
            n: round(t / calibration, 4)
            for n, t in timings.items()
            if t >= 0
        }
        if calibration > 0
        else {}
    )
    with open(os.path.join(here, local_name), "w") as f:
        json.dump(
            dict(
                result,
                round=this_round,
                cpus=int(cpus),
                queries_normalized=queries_normalized,
                phases=phases,
                metric_semantics=METRIC_SEMANTICS,
                notes=NOTES,
            ),
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")

    print(fit_stdout_line(result, local_name))
    spark.stop()


def fold_phase_min(
    phases: dict, name: str, t: float, ph: dict | None
) -> None:
    """Keep the phases map aligned with the pass that produced the
    recorded best-of-N minimum. When the min pass itself recorded
    one-time phases (train/build), probe = wall − one-time. When the
    min pass REUSED an artifact built in an earlier pass (train-once
    rows: the artifact short-circuits, PHASE_SECS stays empty), the
    recorded wall contains NO one-time share — its probe IS the wall;
    the earlier pass's one-time costs are kept for information but
    marked as paid outside the recorded minimum (r12: previously the
    stale first-pass entry could report train+probe sums exceeding the
    recorded wall)."""
    if ph:
        phases[name] = dict(ph)
        phases[name]["probe_sec"] = round(t - sum(ph.values()), 4)
    elif name in phases:
        one_time = {
            k: v
            for k, v in phases[name].items()
            if k not in ("probe_sec", "one_time_outside_min_pass")
        }
        phases[name] = dict(
            one_time,
            probe_sec=round(t, 4),
            one_time_outside_min_pass=True,
        )


#: Calibration-drift trust band (VERDICT r10 item 5): the CPU probe is
#: a valid weather corrector only while its own round-over-round ratio
#: stays inside this band. r10 measured the probe slowing 1.83x while
#: the 32-way workload was FLAT (raw median 1.005x) — a single-core
#: probe tracks frequency/steal weather the parallel workload doesn't
#: feel, and dividing by it would have masked a real regression of up
#: to ~1.8x.
CAL_DRIFT_BAND = (0.7, 1.4)


def gate_regressions(
    timings: dict[str, float],
    prev_times: dict[str, float],
    calibration: float,
    base_cal: float,
    threshold: float = 2.0,
    calibration_par: float = 0.0,
    base_cal_par: float = 0.0,
) -> tuple[dict[str, dict[str, float]], dict]:
    """The regression gate, as a pure function so its logic is
    unit-testable (VERDICT r10 item 5). Returns ``(regressions,
    gate_stats)``.

    Two weather correctors may be available (VERDICT r11 item 4):
    the legacy short-task probe (``calibration``) and the
    concurrency-matched N-way probe (``calibration_par``). r11's
    driver run showed them diverge — single-core 1.86x faster while
    the 32-way workload read 1.14x slower — so the gate picks the
    corrector whose OWN round-over-round drift is inside
    :data:`CAL_DRIFT_BAND`, preferring the legacy probe for continuity
    when both qualify, and forfeits normalization only when every
    available corrector drifted.

    Modes (recorded in ``gate_stats['gate_mode']``):

    - ``normalized`` — the legacy probe's drift is in band: compare in
      machine-independent units (t/probe), the r6 design — a cold VM
      can't fake a regression, a warm re-run can't mask one.
    - ``normalized_par`` — the legacy probe drifted out of band but
      the concurrency-matched probe (present on both sides) stayed in
      band: normalize by ITS drift. This is the r11 inverse-drift case
      recovered — the parallel probe tracks the contention the 32-way
      workload actually feels, so the round keeps a real gate instead
      of agreement-only.
    - ``min_raw_normalized`` — every available probe drifted out of
      band. Flag a query only when BOTH the raw and the normalized
      ratio exceed the threshold (an agreement that survives whichever
      story about the weather is true), and raise a loud
      ``calibration_drift_alert`` so the round gets the isolated
      same-host A/B protocol (the bm25 precedent) — sub-threshold real
      regressions are exactly what a drifted probe can hide, so the
      alert, not the per-query gate, is the catch for those.
    - ``raw`` — no probe on one side (pre-r6 baselines): raw 2x gate.

    ``gate_stats`` also records both medians (raw and normalized
    ratios over the shared queries) so cross-round review reads the
    two stories side by side, plus both drifts.
    """
    regs: dict[str, dict[str, float]] = {}
    normalized = base_cal > 0 and calibration > 0
    drift = (calibration / base_cal) if normalized else 1.0
    in_band = CAL_DRIFT_BAND[0] <= drift <= CAL_DRIFT_BAND[1]
    has_par = base_cal_par > 0 and calibration_par > 0
    drift_par = (calibration_par / base_cal_par) if has_par else 1.0
    par_in_band = has_par and (
        CAL_DRIFT_BAND[0] <= drift_par <= CAL_DRIFT_BAND[1]
    )
    if not normalized and not has_par:
        mode = "raw"
    elif normalized and in_band:
        mode = "normalized"
    elif par_in_band:
        mode = "normalized_par"
    else:
        mode = "min_raw_normalized"
    # the drift the normalized ratios divide by, per mode; in min-mode
    # use the legacy drift when present (records the r11 semantics)
    gate_drift = drift_par if mode == "normalized_par" else (
        drift if normalized else drift_par
    )
    raw_ratios: list[float] = []
    norm_ratios: list[float] = []
    for name, t in timings.items():
        prev = prev_times.get(name, -1.0)
        if prev <= 0.05 or t < 0:
            continue
        raw_ratio = t / prev
        norm_ratio = raw_ratio / gate_drift
        raw_ratios.append(raw_ratio)
        if normalized or has_par:
            norm_ratios.append(norm_ratio)
        if mode in ("normalized", "normalized_par"):
            # the 1s absolute floor is applied in baseline-weather
            # seconds: sub-second drift is host noise, not a plan change
            slow = (
                norm_ratio > threshold
                and (t / gate_drift - prev) > 1.0
            )
        elif mode == "min_raw_normalized":
            slow = (
                min(raw_ratio, norm_ratio) > threshold
                and t - prev > 1.0
            )
        else:
            slow = raw_ratio > threshold and t - prev > 1.0
        if slow:
            regs[name] = {
                "prev": prev,
                "now": t,
                "raw_ratio": round(raw_ratio, 4),
                "norm_ratio": round(norm_ratio, 4),
            }

    def _median(xs: list[float]) -> float:
        if not xs:
            return -1.0
        xs = sorted(xs)
        m = len(xs) // 2
        return round(
            xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2, 4
        )

    gate_stats = {
        "gate_mode": mode,
        "calibration_drift": round(drift, 4),
        "calibration_par_drift": round(drift_par, 4) if has_par else -1.0,
        "calibration_drift_alert": mode == "min_raw_normalized",
        "median_raw_ratio": _median(raw_ratios),
        "median_normalized_ratio": _median(norm_ratios),
    }
    return regs, gate_stats


#: Scoring-semantics versions for rows whose metric definition changed
#: across rounds (advisor r9: a semantics change must be visible in the
#: artifact so cross-round comparisons flag it instead of silently
#: comparing different metrics). doc_retrieval_eval_mrr: r9 dropped
#: query terms matching >10% of the corpus from scoring (df ceiling) —
#: r8-and-earlier MRR/hit values are not comparable.
METRIC_SEMANTICS = {
    "doc_retrieval_eval_mrr": "df_ceiled_0.10 (since r9; r8 values not comparable)",
}

#: Perf notes carried in the committed local artifact (VERDICT r5 #3:
#: commit the explanation next to the numbers it explains).
NOTES = (
    "MACHINE VARIANCE (r6): identical code re-benched on the same VM"
    " moved 72.3s (09:53, driver run) -> 118s -> 142s within the hour;"
    " a fixed single-core Python loop slowed 2.2s -> 2.5s over the same"
    " window (shared-host frequency/steal weather, not a plan change —"
    " per-query ratios were uniform ~1.3-2x across queries untouched"
    " for rounds, e.g. pricing_summary). The committed map is one run's"
    " weather; calibration_sec (fixed CPU-bound xxhash64 avg over"
    " range(200M), no IO) is recorded so cross-run comparisons can"
    " normalize: compare value/calibration_sec, not value."
    " --- r4->r5 embedding-family creep (embedding_near_dup_pairs"
    " 1.24->2.08s, embedding_ann_buckets 0.72->1.06s) was profiled in"
    " r6: isolated sessions time both at r4 levels with unchanged plans"
    " — cached-relation pressure in the 96-query session (staged"
    " persists pinned against clearCache), fixed by cache.py scratch"
    " registry released between queries. embedding_ivf_topk_indexed"
    " includes its one-time index BUILD (corpus assignment + clustered"
    " write) in-query by design — the probe itself reads only nprobe"
    " cells' files."
    " --- r8->r9 doc_bm25_topk_indexed 2.91->4.90s was diagnosed in"
    " r10: isolated same-host A/B (fresh session, 3 warm trials each)"
    " timed r9 code EQUAL-OR-FASTER than r8 (3.3-3.7s vs 4.1-4.5s);"
    " the r9 code diff to the row's path is one refresh-only routing"
    " change it never executes. The mover is the in-query index BUILD"
    " (bucketed 8-file write + manifest + bloom sidecars - dozens of"
    " small-file round trips), which tracks host IO weather that the"
    " CPU-only calibration probe cannot correct; calibration_io_sec"
    " and the phases map (build_sec/probe_sec) now separate it so the"
    " scale-critical probe latency is tracked on its own."
    " --- the committed r10 map (207 queries) was re-run after the"
    " classifier family landed; vs the same-day 201-query run its"
    " normalized per-query median is 1.198x with equal CPU calibration"
    " (0.633 vs 0.658) and calibration_io_sec 2.80 -> 3.41 (1.22x) —"
    " the IO probe attributes the spread to disk weather, the exact"
    " attribution the dual-probe design exists for. Movers are"
    " untouched IO-heavy rows (embedding_pq_topk, ivf_topk_indexed);"
    " regression gate empty in both runs."
    " --- r9->r10 streaming raw movers (streaming_running_profiles"
    " 2.09->3.43s, streaming_user_session_windows 1.79->2.75s,"
    " untouched code) were A/B'd in r11 per the bm25 protocol:"
    " isolated fresh-session trials (3 warm each, sf0.1 local[32])"
    " measured 2.11s and 1.91s — r9 levels exactly. Verdict: host"
    " weather in the r10 shared-bench context (both rows are"
    " micro-batch-scheduling-floor rows, driver-side and"
    " single-threaded — exactly what a slower host inflates),"
    " consistent with the r10 run's own 1.83x CPU-probe drift. No"
    " code change; the r11 calibration-drift gate (gate_regressions)"
    " now alarms on exactly this probe-drift signature instead of"
    " silently normalizing through it."
    " --- the FIRST r11 full run hit exactly that alarm live:"
    " calibration drifted 1.44x (IO probe 2.6x), median raw ratio"
    " 1.35x across 208 untouched shared queries (uniform = weather),"
    " and the min-gate flagged three iterative/driver-loop rows"
    " (trade_network_pagerank raw 6.5x, corpus_bpe_merges 3.9x,"
    " streaming_distinct_user_event_days 3.2x). Isolated same-host"
    " A/B immediately after (fresh sessions, 3 warm trials,"
    " calibration back to 0.77): pagerank 5.6s (FASTER than r10's"
    " 6.9), bpe_merges 4.8s (~r10), and the streaming row at 5.8s on"
    " HEAD vs 7.3s on CHECKED-OUT r10 CODE on the same host — all"
    " three weather; many-job driver-loop rows amplify host"
    " scheduling weather the most. The committed artifact is a"
    " post-A/B re-run on the recovered host."
    " --- the r11 DRIVER re-run (drifted host: probe 0.54x INVERSE"
    " drift, alert fired, min-mode gate) flagged"
    " streaming_distinct_user_event_days 1.76->8.23s and"
    " streaming_hourly_event_counts 1.49->3.35s. Adjudicated r12 per"
    " the bm25 protocol: isolated same-host fresh-session A/B, TWO"
    " alternated passes (1 warmup + 3 warm trials each, sf0.1"
    " local[32]), HEAD vs checked-out r10 code (3089928)."
    " distinct_user_event_days warm trials: HEAD 3.82/2.88/2.65 then"
    " 2.46/2.26/2.39 vs r10 3.76/4.02/5.50 then 3.58/2.81/2.75;"
    " hourly_event_counts: HEAD 2.19/1.94/1.81 then 1.68/1.51/1.59 vs"
    " r10 4.08/3.47/2.64 then 2.33/2.13/1.92. HEAD is equal-or-FASTER"
    " than r10 code on every trial pair; the only r11 diff to these"
    " rows (tempfile.mkdtemp -> cache.scratch_dir, same mkdtemp"
    " underneath) is exonerated, checkpoint-dir placement ruled out."
    " Verdict: WEATHER in the driver's shared-bench context — both"
    " rows are micro-batch-scheduling-floor rows, the exact shape a"
    " degraded host inflates (the A/B host's own CPU probe read"
    " 4.1-4.6s vs the committed run's 0.63, yet warm trials still"
    " landed at r10 levels)."
    " --- the FIRST r12 full run flagged streaming_running_profiles"
    " 3.12->30.4s (raw 9.7x) under a live drift alert (CPU probe"
    " 1.6x, IO probe 2.3x vs the r11 baseline; median raw ratio"
    " across 210 shared queries 0.92 — i.e. the host was FASTER on"
    " everything except the one Python-worker stateful row)."
    " Isolated same-host fresh-session trials immediately after:"
    " 2.45/2.77/2.03s warm — at-or-below the r11 committed 3.12s on"
    " identical code (untouched this round). Verdict: weather —"
    " applyInPandasWithState spawns Python workers per micro-batch,"
    " the shape most sensitive to transient host memory/scheduling"
    " pressure late in a 211-query session. The committed artifact is"
    " a post-A/B re-run; r13 baselines will also carry"
    " calibration_par_sec so the new normalized_par mode can"
    " arbitrate instead of min-mode."
    " --- r13 cross-run weather spread, for anyone comparing r13"
    " normalized medians to r12: two full runs of near-identical HEAD"
    " code on the same recovered host within hours read median"
    " normalized 0.864 (cal 0.653, total 261.8s, regressions empty)"
    " and ~1.0 (cal 0.543 - the single-core probe sped up 17% more"
    " than the 32-way workloads did, the documented inverse-drift"
    " shape; regressions empty both runs). The r13 optimization story"
    " is grounded in isolated alternated A/Bs vs checked-out r12 code"
    " (OPTIMIZATION_r13.md), not in cross-round normalized medians."
    " The r13 first full run also flagged 9 text-family rows >=2x"
    " normalized; all were adjudicated same-host: 8 were the blanket"
    " table-spread taxing aggregation-dominated rows (fixed by making"
    " the spread opt-in per consumer) and corpus_training_manifest_v2"
    " was min-pass accounting (r12's recorded min excluded the"
    " train-once phase; isolated A/B: r12 and HEAD identical, train"
    " 17.5 vs 17.4s, warm 10.6 vs 10.5s). doc_bm25_topk_indexed's"
    " residual 1.59x was REAL - the r13 single-pass build staging"
    " cached token ARRAYS (22s-runtime stage for 3s CPU); reverted,"
    " and the row returned to sub-r12 wall (3.2s vs 4.34s)."
)

#: The driver records only the LAST 2000 chars of stdout; stay inside
#: it with margin so the recorded line is parseable JSON.
STDOUT_BUDGET = 1900


def fit_stdout_line(result: dict, local_name: str) -> str:
    """Trim the stdout JSON line to the driver's tail-capture window:
    slowest queries survive (they're what perf review reads), the rest
    are counted in ``queries_omitted`` and deferred to the committed
    ``local_name`` artifact via the ``full`` pointer."""
    timings = result["queries"]
    payload = dict(result)
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > STDOUT_BUDGET:
        by_cost = sorted(timings, key=lambda n: -timings[n])
        payload["full"] = local_name
        k = len(by_cost)
        while k > 0 and len(line) > STDOUT_BUDGET:
            k -= 1
            payload["queries"] = {
                n: timings[n] for n in sorted(by_cost[:k])
            }
            payload["queries_omitted"] = len(timings) - k
            line = json.dumps(payload, separators=(",", ":"))
    return line


if __name__ == "__main__":
    main()
