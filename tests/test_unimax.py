"""UniMax allocator invariants (corpus_unimax_mixing).

The oracle row pins cross-engine equivalence; these pin the three
contract properties of epoch-capped waterfilling on the real testdata:
budget conservation, the epoch cap, and uniformity off the cap.
"""

from __future__ import annotations

import pytest

from urban_mobility_data_pipeline_spark.plans.llm_ops import (
    UNIMAX_BUDGET_RATIO,
    UNIMAX_EPOCH_CAP,
    corpus_unimax_mixing,
)


@pytest.fixture(scope="module")
def alloc(spark, sf_dir):
    return corpus_unimax_mixing(spark, sf_dir).collect()


def test_budget_conserved(alloc):
    total = sum(r["n_tokens"] for r in alloc)
    spent = sum(r["alloc_tokens"] for r in alloc)
    assert spent == pytest.approx(UNIMAX_BUDGET_RATIO * total, rel=1e-6)


def test_epoch_cap_respected(alloc):
    assert all(r["epochs"] <= UNIMAX_EPOCH_CAP + 1e-6 for r in alloc)
    for r in alloc:
        if r["capped"]:
            assert r["epochs"] == pytest.approx(UNIMAX_EPOCH_CAP, abs=1e-4)


def test_uncapped_sources_fill_uniformly(alloc):
    """Every uncapped source gets the same fill level, and that level
    is at least what any capped source received (caps only bind when
    the uniform share would exceed them)."""
    uncapped = [r["alloc_tokens"] for r in alloc if not r["capped"]]
    capped = [r["alloc_tokens"] for r in alloc if r["capped"]]
    assert uncapped, "constants should leave some sources uncapped"
    assert capped, "constants should cap some sources"
    assert max(uncapped) - min(uncapped) < 1e-3
    assert min(uncapped) >= max(capped) - 1e-3
