"""Version-keyed result cache (extensions/result_cache.py): hit on
unchanged sources, exact invalidation on ANY commit, erasure safety."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.result_cache import (
    ResultCache,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable


@pytest.fixture()
def setup(spark):
    root = tempfile.mkdtemp(prefix="umdp_rc_")
    tbl = MergeTable(spark, tempfile.mkdtemp(prefix="umdp_rc_tbl_"))
    tbl.create(
        spark.createDataFrame(
            [(i, f"user{i % 3}", i * 10) for i in range(30)],
            "id long, owner string, amount long",
        )
    )
    cache = ResultCache(spark, root)
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return tbl.read().groupBy("owner").agg(F.sum("amount").alias("total"))

    return cache, tbl, compute, calls


def test_hit_serves_without_recompute(setup):
    cache, tbl, compute, calls = setup
    first = {(r.owner, r.total) for r in cache.get_or_compute("by_owner", [tbl], compute).collect()}
    again = {(r.owner, r.total) for r in cache.get_or_compute("by_owner", [tbl], compute).collect()}
    assert first == again
    assert calls["n"] == 1
    assert (cache.hits, cache.misses) == (1, 1)
    direct = {(r.owner, r.total) for r in compute().collect()}
    assert first == direct


def test_any_commit_invalidates(spark, setup):
    cache, tbl, compute, calls = setup
    cache.get_or_compute("by_owner", [tbl], compute)
    tbl.append(
        spark.createDataFrame([(100, "user0", 999)], "id long, owner string, amount long")
    )
    fresh = cache.get_or_compute("by_owner", [tbl], compute)
    assert calls["n"] == 2
    assert {(r.owner, r.total) for r in fresh.collect()} == {
        (r.owner, r.total) for r in compute().collect()
    }


def test_erased_rows_never_served_stale(setup):
    """A cached result cannot outlive the erasure commit that removed
    its subject: the delete bumps the version, so the next lookup
    recomputes instead of serving the pre-erasure materialization."""
    cache, tbl, compute, calls = setup
    before = cache.get_or_compute("by_owner", [tbl], compute)
    assert any(r.owner == "user1" for r in before.collect())
    tbl.delete(F.col("owner") == "user1")
    after = cache.get_or_compute("by_owner", [tbl], compute)
    assert all(r.owner != "user1" for r in after.collect())
    assert calls["n"] == 2


def test_multi_source_keying(spark, setup):
    cache, tbl, compute, calls = setup
    other = MergeTable(spark, tempfile.mkdtemp(prefix="umdp_rc_tbl2_"))
    other.create(spark.createDataFrame([(1, 2)], "a long, b long"))

    def joined():
        calls["n"] += 1
        return tbl.read().crossJoin(other.read().select("b"))

    cache.get_or_compute("joined", [tbl, other], joined)
    cache.get_or_compute("joined", [tbl, other], joined)
    assert calls["n"] == 1
    other.append(spark.createDataFrame([(3, 4)], "a long, b long"))
    cache.get_or_compute("joined", [tbl, other], joined)
    assert calls["n"] == 2


def test_distinct_keys_are_independent(setup):
    cache, tbl, compute, calls = setup
    cache.get_or_compute("k1", [tbl], compute)
    cache.get_or_compute("k2", [tbl], compute)
    assert calls["n"] == 2
    cache.invalidate("k1")
    cache.get_or_compute("k2", [tbl], compute)
    assert calls["n"] == 2
    cache.get_or_compute("k1", [tbl], compute)
    assert calls["n"] == 3


def test_corpus_report_cli_serves_from_cache(spark, tmp_path):
    """The corpus_report job: first run computes, second run (unchanged
    corpus) serves the materialized parquet, an ingest invalidates."""
    import json as _json

    from urban_mobility_data_pipeline_spark.run import main

    batch = [
        _json.dumps({
            "doc_id": i,
            "text": f"the quick brown fox {i} jumps over the lazy dog near gate {i * 7} with keys maps notes",
            "lang": "en",
        })
        for i in range(5)
    ]
    (tmp_path / "feed").mkdir()
    (tmp_path / "feed" / "f.jsonl").write_text("\n".join(batch) + "\n")
    lake = str(tmp_path / "lake")
    assert main(["corpus_ingest", "--lake", lake, "--source", str(tmp_path / "feed")], spark=spark) == 0
    assert main(["corpus_report", "--lake", lake], spark=spark) == 0
    # second run must hit: the meta survives on disk, and the report is
    # reproduced without recomputing (observable through the cache dir)
    import os

    cache_dir = os.path.join(lake, "corpus", "_result_cache", "per_source_report")
    meta0 = open(os.path.join(cache_dir, "_cache_meta.json")).read()
    assert main(["corpus_report", "--lake", lake], spark=spark) == 0
    assert open(os.path.join(cache_dir, "_cache_meta.json")).read() == meta0
    # new ingest bumps the corpus version -> next report recomputes
    (tmp_path / "feed2").mkdir()
    (tmp_path / "feed2" / "f.jsonl").write_text(
        _json.dumps({"doc_id": 99, "text": "a genuinely new document body here ok", "lang": "de"}) + "\n"
    )
    assert main(["corpus_ingest", "--lake", lake, "--source", str(tmp_path / "feed2")], spark=spark) == 0
    assert main(["corpus_report", "--lake", lake], spark=spark) == 0
    meta1 = _json.loads(open(os.path.join(cache_dir, "_cache_meta.json")).read())
    assert meta1 != _json.loads(meta0)
