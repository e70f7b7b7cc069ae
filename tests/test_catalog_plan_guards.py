"""Catalog-wide physical-plan guards: EVERY batch query in the catalog
is planned (at sf0.001) and asserted free of

- ``CartesianProduct`` — an unkeyed pair enumeration is never the right
  plan at 100 TB; every pair pipeline here is bucket/cell/band-keyed;
- ``BatchEvalPython`` — row-at-a-time Python UDFs are banned from the
  hot path (SURVEY §2.11). Arrow-batched kernels (``MapInPandas`` /
  ``ArrowEvalPython`` / ``FlatMapGroupsInPandas``) remain allowed —
  they are the documented escape hatch for media decode and bitset
  folds.

Streaming entries execute a real query inside the callable, so they are
covered by their own pins (test_streaming_*, test_plan_shapes) rather
than re-run here; iterative trainers (BPE, k-means trajectories) run
driver rounds at plan-build time and are planned like any other entry —
their jobs at sf0.001 are cheap.
"""

from __future__ import annotations

import pytest

from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES

_BATCH = sorted(n for n in QUERIES if not n.startswith("streaming_"))


@pytest.mark.parametrize("name", _BATCH)
def test_no_cartesian_no_row_python(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name
