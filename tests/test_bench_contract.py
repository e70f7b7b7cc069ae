"""bench.py stdout-line contract: the driver records only the last
2000 chars of stdout, so the printed JSON line must always fit and
always parse — whatever the catalog size (VERDICT r4 item 2)."""

from __future__ import annotations

import json

from bench import STDOUT_BUDGET, fit_stdout_line


def _result(n_queries: int) -> dict:
    return {
        "metric": "catalog_wall_sec",
        "value": 42.0,
        "unit": "sec",
        "queries": {
            f"some_rather_long_query_name_{i:04d}": round(0.1 * i, 4)
            for i in range(n_queries)
        },
        "sf": 0.1,
        "regressions": {},
    }


def test_small_catalog_prints_complete_map():
    line = fit_stdout_line(_result(10), "BENCH_LOCAL_r99.json")
    d = json.loads(line)
    assert len(d["queries"]) == 10
    assert "queries_omitted" not in d
    assert len(line) <= STDOUT_BUDGET


def test_large_catalog_trims_to_budget_keeping_slowest():
    res = _result(300)
    line = fit_stdout_line(res, "BENCH_LOCAL_r99.json")
    assert len(line) <= STDOUT_BUDGET  # fits the driver capture window
    d = json.loads(line)  # and parses
    assert d["full"] == "BENCH_LOCAL_r99.json"
    assert d["queries_omitted"] == 300 - len(d["queries"])
    # the surviving entries are exactly the slowest ones
    kept = set(d["queries"])
    cutoff = min(res["queries"][n] for n in kept)
    dropped_max = max(
        v for n, v in res["queries"].items() if n not in kept
    )
    assert dropped_max <= cutoff
    # headline metrics always survive the trim
    assert d["value"] == 42.0 and d["sf"] == 0.1


def test_pathological_budget_never_loops_forever():
    # even if every single query must go, the line still renders
    res = _result(3)
    res["queries"] = {
        "x" * 3000: 1.0  # one absurd name larger than the whole budget
    }
    line = fit_stdout_line(res, "BENCH_LOCAL_r99.json")
    d = json.loads(line)
    assert d["queries"] == {} and d["queries_omitted"] == 1


def test_catalog_module_names_are_disjoint():
    """catalog.py merges module QUERIES dicts with .update() — a name
    collision would silently shadow one implementation with another and
    the oracle of the loser could be checked against the winner's plan.
    Keep the namespace provably disjoint."""
    from urban_mobility_data_pipeline_spark.plans import (
        analytics,
        functions_q,
        llm_ops,
        parity,
        streaming_q,
    )

    seen: dict[str, str] = {}
    for mod in (parity, llm_ops, analytics, functions_q, streaming_q):
        for name in mod.QUERIES:
            assert name not in seen, (
                f"{name} defined in both {seen[name]} and {mod.__name__}"
            )
            seen[name] = mod.__name__
    # every oracle belongs to a registered query
    from urban_mobility_data_pipeline_spark.plans import catalog

    assert set(catalog.ORACLES) <= set(catalog.QUERIES)


# ---------------------------------------------------------------------------
# regression-gate logic (VERDICT r10 item 5: the calibration-normalized
# gate must not trust a drifted probe)
# ---------------------------------------------------------------------------
from bench import gate_regressions  # noqa: E402


def test_gate_normalized_mode_catches_real_regression():
    """Stable calibration: the r6 normalized gate behaves as before —
    a 3x mover trips, a flat query doesn't."""
    regs, stats = gate_regressions(
        {"q_slow": 9.0, "q_flat": 5.0},
        {"q_slow": 3.0, "q_flat": 5.1},
        calibration=1.0,
        base_cal=1.0,
    )
    assert stats["gate_mode"] == "normalized"
    assert not stats["calibration_drift_alert"]
    assert set(regs) == {"q_slow"}
    assert regs["q_slow"]["raw_ratio"] == 3.0


def test_gate_normalized_mode_forgives_uniform_weather():
    """Host uniformly 1.3x slower WITH the probe tracking it (drift in
    band): nothing trips — the original design intent."""
    regs, stats = gate_regressions(
        {"q": 6.5},
        {"q": 5.0},
        calibration=1.3,
        base_cal=1.0,
    )
    assert stats["gate_mode"] == "normalized"
    assert regs == {}


def test_gate_drifted_probe_cannot_mask_a_big_regression():
    """The r10 failure mode: the single-core probe inflates 2x while
    the workload didn't. Pure normalized gating would read a 4.4x real
    regression as 2.2x-ish... still caught; but a 3x real regression
    as 1.5x — masked. Under the out-of-band fallback BOTH ratios must
    clear the gate, and the drift itself raises a loud alert so
    sub-threshold movers get the isolated A/B protocol."""
    timings = {"q_big": 22.0, "q_mid": 15.0, "q_flat": 5.0}
    prev = {"q_big": 5.0, "q_mid": 10.0, "q_flat": 5.0}
    regs, stats = gate_regressions(
        timings, prev, calibration=2.0, base_cal=1.0
    )
    assert stats["gate_mode"] == "min_raw_normalized"
    assert stats["calibration_drift_alert"] is True
    assert stats["calibration_drift"] == 2.0
    # q_big: raw 4.4x, normalized 2.2x -> both above 2 -> caught even
    # though the old normalized-only gate would also have seen 2.2x;
    # the point is the 2x inflation cannot push it under the bar
    assert "q_big" in regs
    # q_mid: raw 1.5x (a REAL 1.5x regression) is under the 2x gate in
    # any mode — the alert, not a per-query row, is what catches the
    # round: it demands the isolated A/B before trusting either story
    assert "q_mid" not in regs and stats["calibration_drift_alert"]
    assert regs["q_big"]["norm_ratio"] == 2.2


def test_gate_drifted_probe_cannot_fake_a_regression():
    """Drift the OTHER way (baseline probe was the slow one): pure
    normalized ratios read 2.6x on a raw-1.3x query — a false
    positive the min() rule rejects."""
    regs, stats = gate_regressions(
        {"q": 6.5},
        {"q": 5.0},
        calibration=0.5,
        base_cal=1.0,
    )
    assert stats["gate_mode"] == "min_raw_normalized"
    assert regs == {}  # raw 1.3x vetoes the inflated normalized 2.6x


def test_gate_records_both_medians():
    regs, stats = gate_regressions(
        {"a": 2.0, "b": 4.0, "c": 6.0},
        {"a": 1.0, "b": 2.0, "c": 2.0},
        calibration=1.0,
        base_cal=1.0,
    )
    assert stats["median_raw_ratio"] == 2.0
    assert stats["median_normalized_ratio"] == 2.0


# ---------------------------------------------------------------------------
# concurrency-matched calibration probe (VERDICT r11 item 4): when the
# single-core probe diverges from the workload, the N-way probe keeps a
# real normalized gate instead of forfeiting to agreement-only mode
# ---------------------------------------------------------------------------


def test_gate_parallel_probe_rescues_inverse_drift():
    """The r11 driver-run signature: the serial probe ran 1.86x FASTER
    (out of band) while the 32-way workload was uniformly ~1.4x slower
    from contention — which the concurrency-matched probe tracks
    (drift 1.4, in band). The gate must pick the parallel corrector
    (normalized_par), forgive the uniform weather, and NOT raise the
    drift alert, and a real regression must still be caught: q_real is
    raw 2.9x on a contention-1.4x host = normalized 2.07x > 2."""
    regs, stats = gate_regressions(
        {"q_weather": 7.0, "q_real": 14.5},
        {"q_weather": 5.0, "q_real": 5.0},
        calibration=0.54,  # serial probe got FASTER: drift 0.54, out
        base_cal=1.0,
        calibration_par=1.4,  # N-way probe tracked the contention
        base_cal_par=1.0,
    )
    assert stats["gate_mode"] == "normalized_par"
    assert stats["calibration_drift_alert"] is False
    assert stats["calibration_drift"] == 0.54
    assert stats["calibration_par_drift"] == 1.4
    assert "q_weather" not in regs  # uniform contention forgiven
    assert "q_real" in regs  # raw 2.9 / 1.4 = 2.07 -> caught
    # the record rounds to 4dp
    assert abs(regs["q_real"]["norm_ratio"] - 2.9 / 1.4) < 1e-3


def test_gate_parallel_probe_sub2x_raw_regression_caught():
    """A real regression whose RAW ratio is under the 2x bar (1.5x)
    while the parallel probe says the host got FASTER (drift 0.7, in
    band): normalized 1.5/0.7 = 2.14x > 2 — caught in normalized_par
    mode, exactly the sub-threshold mover min-mode would have missed."""
    regs, stats = gate_regressions(
        {"q": 7.5},
        {"q": 5.0},
        calibration=0.5,  # serial out of band
        base_cal=1.0,
        calibration_par=0.7,  # host genuinely faster, in band
        base_cal_par=1.0,
    )
    assert stats["gate_mode"] == "normalized_par"
    assert set(regs) == {"q"}


def test_gate_both_probes_drifted_falls_back_to_min_mode():
    """Every available corrector out of band -> the r11 min-mode with
    the loud alert; the serial-probe drift stays the recorded one."""
    regs, stats = gate_regressions(
        {"q": 22.0},
        {"q": 5.0},
        calibration=2.0,
        base_cal=1.0,
        calibration_par=0.5,
        base_cal_par=1.0,
    )
    assert stats["gate_mode"] == "min_raw_normalized"
    assert stats["calibration_drift_alert"] is True
    assert "q" in regs  # raw 4.4x and normalized both clear the bar


def test_gate_serial_in_band_keeps_legacy_mode():
    """Both probes in band: the legacy normalized mode wins for
    cross-round continuity (same semantics as r11 artifacts)."""
    _, stats = gate_regressions(
        {"q": 5.0},
        {"q": 5.0},
        calibration=1.1,
        base_cal=1.0,
        calibration_par=1.3,
        base_cal_par=1.0,
    )
    assert stats["gate_mode"] == "normalized"


def test_gate_missing_parallel_baseline_preserves_r11_behavior():
    """Pre-r12 baselines carry no calibration_par_sec: the gate must
    behave exactly as r11 (min-mode + alert on serial drift)."""
    regs, stats = gate_regressions(
        {"q": 22.0},
        {"q": 5.0},
        calibration=2.0,
        base_cal=1.0,
        calibration_par=1.8,  # this run HAS one, the baseline doesn't
        base_cal_par=0.0,
    )
    assert stats["gate_mode"] == "min_raw_normalized"
    assert stats["calibration_drift_alert"] is True
    assert stats["calibration_par_drift"] == -1.0
    assert "q" in regs


def test_fold_phase_min_alignment():
    """The phases map must describe the pass that produced the
    recorded minimum: a min pass that reused a train-once artifact
    (no PHASE_SECS) reports its whole wall as probe with the earlier
    one-time costs marked as paid outside it — never a train+probe sum
    exceeding the recorded wall."""
    from bench import fold_phase_min

    phases: dict = {}
    # pass 1: trains in-query (wall 43.3 = 21.65 train + 21.65 probe)
    fold_phase_min(phases, "q", 43.3, {"train_sec": 21.65})
    assert phases["q"] == {"train_sec": 21.65, "probe_sec": 21.65}
    # pass 2: artifact reused, wall 9.46 becomes the recorded min
    fold_phase_min(phases, "q", 9.46, None)
    assert phases["q"]["probe_sec"] == 9.46
    assert phases["q"]["train_sec"] == 21.65  # kept for information
    assert phases["q"]["one_time_outside_min_pass"] is True
    # pass 3: another artifact-reusing min — marker doesn't leak into
    # the one-time keys
    fold_phase_min(phases, "q", 8.0, None)
    assert phases["q"] == {
        "train_sec": 21.65,
        "probe_sec": 8.0,
        "one_time_outside_min_pass": True,
    }
    # a row with no phases at all stays absent
    fold_phase_min(phases, "r", 1.0, None)
    assert "r" not in phases
