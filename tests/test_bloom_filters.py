"""Per-file bloom-filter sidecar on MergeTable: point-key file
pruning for GDPR erasure / point lookups where zone maps can't help
(uniformly distributed high-cardinality keys straddle every file's
[min,max])."""

from __future__ import annotations

import json
import os
import re
import tempfile

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

N_FILES = 8
N_ROWS = 4000


@pytest.fixture()
def bloom_table(spark):
    path = tempfile.mkdtemp(prefix="umdp_bloom_")
    df = (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 97).alias("grp"),
            F.concat(F.lit("payload-"), F.col("id")).alias("body"),
        )
        # spread keys uniformly over many files: the zone-map-hostile
        # layout (every file's doc_id range is ~[0, N_ROWS])
        .repartition(N_FILES)
    )
    t = MergeTable(spark, path)
    t.create(df)
    return t


def _files_containing(t: MergeTable, keys: list[int]) -> set[str]:
    df = t.read(include_internal=True).filter(
        F.col("doc_id").isin(keys)
    )
    rows = df.select(
        F.col("_metadata.file_path").alias("fp")
    ).distinct().collect()
    local = t._local_path()
    out = set()
    for r in rows:
        p = re.sub(r"^[a-zA-Z0-9+.-]+:/+", "/", r["fp"])
        out.add(os.path.relpath(p, local))
    return out


def test_build_then_prune_no_false_negatives(bloom_table):
    t = bloom_table
    built = t.build_blooms("doc_id", fpp=0.01)
    assert len(built) == N_FILES
    keys = [0, 1234, 3999]
    cands, skipped = t.prune_files_by_keys("doc_id", keys)
    assert set(cands) | set(skipped) == set(built)
    # soundness: every file that actually holds a key is a candidate
    actual = _files_containing(t, keys)
    assert actual <= set(cands)


def test_absent_keys_skip_most_files(bloom_table):
    t = bloom_table
    # fpp 0.001: with 8 files x 3 keys the chance of even ONE
    # false-positive file is ~2% (vs ~21% at 0.01, which would make
    # the >= N-1 gate flaky once in ~40 runs)
    t.build_blooms("doc_id", fpp=0.001)
    cands, skipped = t.prune_files_by_keys(
        "doc_id", [10_000_000 + i for i in range(3)]
    )
    # absent keys: everything should be bloom-skipped modulo fpp
    assert len(skipped) >= N_FILES - 1, (cands, skipped)


def test_read_by_keys_matches_full_scan(bloom_table, spark):
    t = bloom_table
    t.build_blooms("doc_id")
    keys = [7, 77, 777, 10_000_000]
    got = sorted(
        r["doc_id"] for r in t.read_by_keys("doc_id", keys).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in t.read().filter(F.col("doc_id").isin(keys)).collect()
    )
    assert got == want == [7, 77, 777]


def test_delete_by_keys_rewrites_only_candidates(bloom_table):
    t = bloom_table
    t.build_blooms("doc_id", fpp=0.001)
    before, _ = t._load()
    keys = [5, 1500]
    cands, skipped = t.prune_files_by_keys("doc_id", keys)
    stats = t.delete_by_keys("doc_id", keys)
    assert stats["rewritten_files"] == len(cands)
    assert stats["kept_files"] == len(skipped)
    after, _ = t._load()
    # bloom-negative files carry over byte-identical (same rel paths)
    assert set(skipped) <= set(after["files"])
    # deleted keys are gone, everything else survived
    remaining = t.read()
    assert remaining.filter(F.col("doc_id").isin(keys)).count() == 0
    assert remaining.count() == N_ROWS - len(keys)
    # bloom-pruned delete must not have rewritten the whole table
    assert len(cands) < len(before["files"])


def test_delete_by_keys_no_match_is_noop(bloom_table):
    t = bloom_table
    t.build_blooms("doc_id", fpp=0.001)
    _, v_before = t._load()
    stats = t.delete_by_keys("doc_id", [99_999_999])
    assert stats["rewritten_files"] == 0
    _, v_after = t._load()
    assert v_after == v_before  # no commit for a no-op
    assert t.read().count() == N_ROWS


def test_incremental_build_touches_only_new_files(bloom_table, spark):
    t = bloom_table
    first = t.build_blooms("doc_id")
    sig_before = {
        rel: e["doc_id"]["b64"] for rel, e in first.items()
    }
    extra = spark.range(N_ROWS, N_ROWS + 100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("grp"),
        F.concat(F.lit("payload-"), F.col("id")).alias("body"),
    )
    t.append(extra)
    second = t.build_blooms("doc_id")
    assert len(second) > len(first)
    for rel, b64 in sig_before.items():
        assert second[rel]["doc_id"]["b64"] == b64  # untouched entries
    # the appended keys are findable through the refreshed blooms
    got = t.read_by_keys("doc_id", [N_ROWS + 5]).count()
    assert got == 1


def test_vacuum_prunes_bloom_sidecar(bloom_table):
    t = bloom_table
    t.build_blooms("doc_id")
    t.delete_by_keys("doc_id", [1, 2, 3])
    removed = t.vacuum(retain_hours=0.0)
    assert removed > 0
    with open(t._bloom_sidecar_path()) as f:
        sidecar = json.load(f)
    manifest, _ = t._load()
    live = set(manifest["files"])
    assert set(sidecar) <= live | {
        rel for rel in sidecar if os.path.isfile(
            os.path.join(t._local_path(), rel)
        )
    }
    # entries for physically removed files are gone
    for rel in sidecar:
        assert os.path.isfile(os.path.join(t._local_path(), rel))


def test_null_key_file_gets_zero_bloom(spark):
    path = tempfile.mkdtemp(prefix="umdp_bloom_null_")
    df = spark.range(50).select(
        F.lit(None).cast("long").alias("doc_id"),
        F.col("id").alias("payload"),
    )
    t = MergeTable(spark, path)
    t.create(df.coalesce(1))
    built = t.build_blooms("doc_id")
    assert len(built) == 1
    cands, skipped = t.prune_files_by_keys("doc_id", [1, 2, 3])
    assert cands == [] and len(skipped) == 1


def test_gdpr_erase_takes_bloom_fast_path(spark, tmp_path):
    """erase_document_ids routes through delete_by_keys when blooms
    exist: identical logical result, but only bloom-candidate files
    rewritten (file-count proof), including a two-id-column pair
    table."""
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        erase_document_ids,
    )

    docs = (
        spark.range(2000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
        )
        .repartition(6)
    )
    pairs = (
        spark.range(500)
        .select(
            (F.col("id") * 2).alias("doc_a"),
            (F.col("id") * 2 + 1).alias("doc_b"),
        )
        .repartition(4)
    )
    t_docs = MergeTable(spark, str(tmp_path / "docs"))
    t_docs.create(docs)
    t_pairs = MergeTable(spark, str(tmp_path / "pairs"))
    t_pairs.create(pairs)
    t_docs.build_blooms("doc_id", fpp=0.001)
    t_pairs.build_blooms("doc_a", fpp=0.001)
    t_pairs.build_blooms("doc_b", fpp=0.001)
    docs_files_before = set(t_docs._load()[0]["files"])
    pairs_files_before = set(t_pairs._load()[0]["files"])

    victim = 41  # doc_b of pair row 20
    deleted = erase_document_ids(
        spark,
        [victim],
        {"documents": t_docs, "near_dup_pairs": t_pairs},
        vacuum=False,
    )
    assert deleted == {"documents": 1, "near_dup_pairs": 1}
    assert t_docs.read().filter(F.col("doc_id") == victim).count() == 0
    assert (
        t_pairs.read()
        .filter((F.col("doc_a") == victim) | (F.col("doc_b") == victim))
        .count()
        == 0
    )
    # fast-path proof: most original files survived the delete untouched
    docs_files_after = set(t_docs._load()[0]["files"])
    pairs_files_after = set(t_pairs._load()[0]["files"])
    assert len(docs_files_before & docs_files_after) >= 5
    assert len(pairs_files_before & pairs_files_after) >= 3


def test_bloom_soundness_property(spark):
    """Hypothesis-style sweep without per-example Spark jobs: for a
    range of key sets, NO file containing a probed key is ever
    skipped (bloom soundness — false positives allowed, false
    negatives never)."""
    import tempfile

    path = tempfile.mkdtemp(prefix="umdp_bloom_prop_")
    df = spark.range(0, 3000, 7).select(  # sparse keys: 0,7,14,...
        F.col("id").alias("doc_id"),
        (F.col("id") * 13 % 1000).alias("v"),
    )
    t = MergeTable(spark, path)
    t.create(df.repartition(6))
    t.build_blooms("doc_id", fpp=0.01)
    containing = {}
    for probe in ([0], [7, 2989], [700, 701], [2996], [1, 2, 3, 4, 5]):
        cands, skipped = t.prune_files_by_keys("doc_id", probe)
        present = [k for k in probe if k % 7 == 0 and k < 3000]
        if present:
            actual = _files_containing(t, present)
            assert actual <= set(cands), (probe, actual, cands)
        # and the probe finds exactly the present keys
        got = sorted(
            r["doc_id"] for r in t.read_by_keys("doc_id", probe).collect()
        )
        assert got == sorted(present), probe


def test_blooms_on_bucketed_table(spark, tmp_path):
    """The GDPR corpus shape: key-hash-bucketed MergeTable (hive
    __kb=N dirs). Blooms must build per file across partition dirs,
    prune soundly, and delete_by_keys must preserve the bucket
    layout."""
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("body"),
    )
    t = MergeTable(
        spark, str(tmp_path / "bt"), bucket_keys=["doc_id"], num_buckets=8
    )
    t.create(df)
    built = t.build_blooms("doc_id", fpp=0.001)
    assert len(built) == len(t._load()[0]["files"])
    assert all("/" in rel or "=" in rel for rel in built)  # lives in __kb dirs
    keys = [5, 1999]
    got = sorted(r["doc_id"] for r in t.read_by_keys("doc_id", keys).collect())
    assert got == keys
    cands, skipped = t.prune_files_by_keys("doc_id", keys)
    assert skipped  # most buckets' files bloom out
    t.delete_by_keys("doc_id", keys)
    assert t.read().count() == 1998
    m, _ = t._load()
    assert m["bucket_keys"] == ["doc_id"]  # layout preserved
    assert all(f.startswith("__kb=") for f in m["files"])


def test_multi_column_build_matches_sequential(spark):
    """build_blooms(["a","b"]) reads each file ONCE but must produce
    byte-identical sidecars to two sequential single-column builds —
    the single-scan path is an IO optimization, never a content
    change. Also pins NULL handling (null keys are never bitmapped)
    and the per-column incremental contract (a column's existing
    bloom survives a multi-column top-up untouched)."""
    rows = spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 7 != 0, F.concat(F.lit("tok"), F.col("id") % 50))
        .alias("token"),  # 1-in-7 NULL
        (F.col("id") % 97).alias("grp"),
    ).repartition(N_FILES)

    seq_path = tempfile.mkdtemp(prefix="umdp_bloom_seq_")
    t_seq = MergeTable(spark, seq_path)
    t_seq.create(rows)
    t_seq.build_blooms("doc_id")
    t_seq.build_blooms("token")

    multi_path = tempfile.mkdtemp(prefix="umdp_bloom_multi_")
    t_multi = MergeTable(spark, multi_path)
    t_multi.create(rows)
    built = t_multi.build_blooms(["doc_id", "token"])
    assert len(built) == N_FILES

    def sidecar(t):
        with open(t._bloom_sidecar_path()) as f:
            raw = json.load(f)
        # file names differ between the two tables; compare the sorted
        # multiset of per-column entries instead
        return sorted(
            sorted((c, e["m"], e["k"], e["b64"]) for c, e in v.items())
            for v in raw.values()
        )

    assert sidecar(t_multi) == sidecar(t_seq)

    # pruning through the multi-built sidecars behaves per column
    cands, skipped = t_multi.prune_files_by_keys("doc_id", [10_000_000])
    assert len(skipped) >= N_FILES - 1
    cands, _ = t_multi.prune_files_by_keys("token", ["tok1"])
    assert cands  # present key is admitted somewhere

    # incremental: appending new rows then multi-building tops up ONLY
    # the new file; the old files' entries are byte-identical
    before = sidecar(t_multi)
    t_multi.append(
        spark.range(N_ROWS, N_ROWS + 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("tok"), F.col("id") % 50).alias("token"),
            (F.col("id") % 97).alias("grp"),
        ).coalesce(1)
    )
    t_multi.build_blooms(["doc_id", "token"])
    after = sidecar(t_multi)
    assert len(after) == len(before) + 1
    assert [e for e in before if e in after] == before
