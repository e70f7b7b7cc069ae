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
