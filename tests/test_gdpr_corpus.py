"""GDPR erasure must reach the LLM-corpus extension derivatives
(VERDICT r4 item 7): erasing a doc_id deletes it from the corpus AND
every derived table — signatures, band keys, near-dup pairs, cluster
labels, the dedup'd corpus — with an audit row per table and physical
file-level removal after vacuum."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.dedup import (
    connected_components,
    lsh_band_keys,
    minhash_signatures,
    near_dup_pairs,
)
from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
    erase_document_ids,
)
from urban_mobility_data_pipeline_spark.operators.gdpr import AuditLog
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable


@pytest.fixture(scope="module")
def corpus_store(spark, sf_dir, tmp_path_factory):
    """documents + its four derivative tables, persisted as MergeTables
    the way a corpus pipeline would stage them."""
    root = tmp_path_factory.mktemp("corpus")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = near_dup_pairs(docs, threshold=0.1)
    labels = connected_components(pairs, docs, algorithm="auto")
    clusters = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    dedup_corpus = docs.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
            "doc_id"
        ),
        "doc_id",
    )
    tables = {}
    frames = {
        "documents": docs,
        "minhash_signatures": minhash_signatures(docs),
        "lsh_band_keys": lsh_band_keys(minhash_signatures(docs)),
        "near_dup_pairs": pairs,
        "dup_clusters": clusters,
        "dedup_corpus": dedup_corpus,
    }
    for name, df in frames.items():
        t = MergeTable(spark, str(root / name))
        t.create(df)
        tables[name] = t
    return tables


def _ids_in_table(table, cols, ids):
    df = table.read()
    cond = None
    for c in cols:
        term = F.col(c).isin(list(ids))
        cond = term if cond is None else (cond | term)
    return df.filter(cond).count()


def test_erasure_hits_every_derivative(spark, corpus_store, tmp_path):
    tables = corpus_store
    # pick a subject that actually participates in a dup pair, so the
    # pair/cluster propagation is exercised for real
    a_pair = tables["near_dup_pairs"].read().select("doc_a", "doc_b").first()
    victim = int(a_pair["doc_a"])
    audit = AuditLog(spark, str(tmp_path / "audit"), salt="s3cret")

    deleted = erase_document_ids(
        spark, [victim], tables, audit=audit, vacuum=True
    )

    assert deleted["documents"] == 1
    assert deleted["minhash_signatures"] == 1
    assert deleted["lsh_band_keys"] > 0
    assert deleted["near_dup_pairs"] > 0
    assert deleted["dup_clusters"] == 1
    # logical absence in every table, pair columns included
    id_cols = {
        "documents": ("doc_id",),
        "minhash_signatures": ("doc_id",),
        "lsh_band_keys": ("doc_id",),
        "near_dup_pairs": ("doc_a", "doc_b"),
        "dup_clusters": ("doc_id",),
        "dedup_corpus": ("doc_id",),
    }
    for name, cols in id_cols.items():
        assert _ids_in_table(tables[name], cols, [victim]) == 0, name

    # audit: one row per table, salted fingerprint, never the raw id
    audit_rows = audit.table.read().collect()
    assert len(audit_rows) == len(tables)
    assert {r["entity"] for r in audit_rows} == set(tables)
    import hashlib

    salted = hashlib.sha256(f"s3cret{victim}".encode()).hexdigest()
    unsalted = hashlib.sha256(str(victim).encode()).hexdigest()
    for r in audit_rows:
        assert r["layer"] == "corpus"
        # fingerprint is the SALTED hash — never the bare-id hash, so
        # the audit log can't be joined back to subjects by rainbow table
        assert r["subject_fingerprint"] == salted
        assert r["subject_fingerprint"] != unsalted

    # PHYSICAL erasure: after vacuum, no remaining parquet file under
    # any table dir (current or prior version) contains the victim id
    for name, cols in id_cols.items():
        base = tables[name]._local_path()
        for f in glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True):
            if os.sep + "_" in f[len(base):]:
                continue  # internal log dirs hold no row data
            t = pq.read_table(f, columns=[c for c in cols])
            for c in cols:
                assert victim not in t.column(c).to_pylist(), (name, f)


def test_erasure_is_idempotent_and_counts_zero(spark, corpus_store):
    tables = corpus_store
    # second pass over an already-erased id: all zero, no errors
    a_pair = tables["near_dup_pairs"].read().select("doc_a").first()
    erased_before = erase_document_ids(spark, [10**9], tables, vacuum=False)
    assert set(erased_before.values()) == {0}  # unknown id touches nothing
    assert a_pair is not None  # store still readable


def test_unknown_table_requires_id_cols(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "custom"))
    with pytest.raises(KeyError, match="no id columns"):
        erase_document_ids(spark, [1], {"custom_table": t})
    # registering the id columns makes it legal (table absent -> 0)
    out = erase_document_ids(
        spark, [1], {"custom_table": t}, id_cols={"custom_table": ["doc_id"]}
    )
    assert out == {"custom_table": 0}


def test_erasure_reaches_the_materialized_ivf_index(spark, sf_dir, tmp_path):
    """The IVF index is a corpus derivative like any signature table:
    erasing a vector id must delete its inverted-list row (with the
    dereferenced files physically vacuumed), and search must still work
    — the erased vector can no longer appear in any top-k."""
    import glob as _glob

    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        build_ivf_index,
        ivf_centroids,
        ivf_topk_indexed,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(emb)
    index = MergeTable(spark, str(tmp_path / "ivf"))
    build_ivf_index(emb, cents, index)

    victim = 7
    deleted = erase_document_ids(
        spark,
        [victim],
        {"ivf_index": index},
        id_cols={"ivf_index": ["vec_id"]},
    )
    assert deleted == {"ivf_index": 1}
    assert index.read().filter(F.col("vec_id") == victim).count() == 0
    # physically gone, not just dereferenced
    import pyarrow.parquet as pq

    for f in _glob.glob(str(tmp_path / "ivf" / "**" / "*.parquet"), recursive=True):
        t = pq.read_table(f, columns=["vec_id"])
        assert victim not in set(t["vec_id"].to_pylist())
    # search still functions and never returns the erased vector
    got = ivf_topk_indexed(index, cents, query_vec_id=0, k=10, nprobe=10)
    ids = [r.vec_id for r in got.collect()]
    assert len(ids) == 10 and victim not in ids


def test_erasure_reaches_the_dedup_index_immediately(spark, sf_dir, tmp_path):
    """The maintained LSH band index is a corpus derivative: erasure
    must delete its rows NOW, not at the next refresh cadence."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.dedup_index import (
        refresh_dedup_index,
    )
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    corpus = MergeTable(spark, str(tmp_path / "documents"))
    corpus.create(docs)
    index = MergeTable(spark, str(tmp_path / "dedup_index"))
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))
    refresh_dedup_index(corpus, index, cursor)

    victim = docs.select("doc_id").first()[0]
    deleted = erase_document_ids(
        spark,
        [victim],
        {"documents": corpus, "dedup_index": index},
        vacuum=True,
    )
    assert deleted["documents"] == 1
    assert deleted["dedup_index"] > 0  # the B band rows
    assert index.read().filter(F.col("doc_id") == victim).count() == 0
    assert corpus.read().filter(F.col("doc_id") == victim).count() == 0


def test_mor_erasure_is_logical_then_physical(spark, sf_dir, tmp_path):
    """Two-phase GDPR: mode="mor" stops every read IMMEDIATELY with
    zero file rewrites (deletion vectors); finalize_erasure later
    makes it physical — purge rewrites only covered files, vacuum
    drops the old bytes, and no surviving parquet file contains the
    victim."""
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        finalize_erasure,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t_docs = MergeTable(spark, str(tmp_path / "documents"))
    t_docs.create(docs.repartition(8))
    t_docs.build_blooms("doc_id")
    pairs = near_dup_pairs(docs, threshold=0.1)
    t_pairs = MergeTable(spark, str(tmp_path / "near_dup_pairs"))
    t_pairs.create(pairs)
    tables = {"documents": t_docs, "near_dup_pairs": t_pairs}

    a_pair = t_pairs.read().select("doc_a").first()
    victim = int(a_pair["doc_a"])
    audit = AuditLog(spark, str(tmp_path / "audit"), salt="s3cret")

    files_before = list(t_docs._load()[0]["files"])
    deleted = erase_document_ids(
        spark, [victim], tables, audit=audit, mode="mor"
    )
    assert deleted["documents"] == 1
    assert deleted["near_dup_pairs"] >= 1
    # logical: reads are clean, but NO file was rewritten
    assert t_docs._load()[0]["files"] == files_before
    for name, cols in (("documents", ["doc_id"]),
                       ("near_dup_pairs", ["doc_a", "doc_b"])):
        assert _ids_in_table(tables[name], cols, [victim]) == 0
    assert audit.table.read().count() == 2
    # the bytes are STILL on disk (that is the deferred part)
    on_disk = 0
    base = t_docs._local_path()
    for f in glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True):
        if os.sep + "_" in f[len(base):]:
            continue
        on_disk += pq.read_table(f, columns=["doc_id"]).column(
            "doc_id"
        ).to_pylist().count(victim)
    assert on_disk == 1

    stats = finalize_erasure(tables)
    assert stats["documents"]["rewritten_files"] >= 1
    assert stats["documents"]["kept_files"] >= 1  # only covered files
    for name, cols in (("documents", ["doc_id"]),
                       ("near_dup_pairs", ["doc_a", "doc_b"])):
        assert _ids_in_table(tables[name], cols, [victim]) == 0
        base = tables[name]._local_path()
        for f in glob.glob(
            os.path.join(base, "**", "*.parquet"), recursive=True
        ):
            if os.sep + "_" in f[len(base):]:
                continue
            t = pq.read_table(f, columns=cols)
            for c in cols:
                assert victim not in t.column(c).to_pylist(), (name, f)


def test_sustained_mor_erasure_stays_bounded(spark, tmp_path):
    """The two-phase erasure path under SUSTAINED load (the
    bench_domain --dv soak's committed pin): repeated mode="mor"
    erasure cycles keep pending DV rows bounded by victims ×
    cycles-since-purge, every erased id is logically gone immediately,
    and each batched finalize_erasure purge rewrites only DV-covered
    files and resets the pending count to zero — the cadence that
    keeps the MoR read penalty from compounding."""
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        finalize_erasure,
    )

    corpus = MergeTable(spark, str(tmp_path / "soak_corpus"))
    corpus.create(
        spark.range(20_000).select(
            F.col("id").alias("doc_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("text"),
        ).repartition(8)
    )
    corpus.build_blooms("doc_id", fpp=0.001)
    tables = {"corpus": corpus}
    per, cycles, purge_every = 50, 6, 3
    erased = 0
    for c in range(1, cycles + 1):
        victims = list(range((c - 1) * per * 11, (c - 1) * per * 11 + per))
        erase_document_ids(
            spark, victims, tables, id_cols={"corpus": ["doc_id"]},
            mode="mor",
        )
        erased += per
        assert (
            corpus.read().filter(F.col("doc_id").isin(victims)).count() == 0
        )
        since = c % purge_every or purge_every
        assert corpus.dv_rows() == per * since
        assert corpus.read().count() == 20_000 - erased
        if c % purge_every == 0:
            manifest = corpus._load()[0]
            live = set(manifest["files"])
            covered = {
                f for e in (manifest.get("dvs") or [])
                for f in e["files"] if f in live
            }
            st = finalize_erasure(tables)["corpus"]
            assert st["rewritten_files"] == len(covered), (st, covered)
            assert corpus.dv_rows() == 0
    assert corpus.read().count() == 20_000 - erased
