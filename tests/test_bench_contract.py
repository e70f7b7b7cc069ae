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
