"""Embedding-feed ingest (extensions/embedding_ingest): the semantic
saturation guard's PRODUCTION consumer (VERDICT r11 item 5). Pins the
door contract the text ingest already holds, vector-shaped:

- semantic near-dups reject at the door (never merged), naming their
  matched corpus vector;
- a planted HOT cell over the cap is skipped AND counted, and a vector
  whose every probed cell saturated diverts to the quarantine as a
  ``sem_dedup_unchecked`` dead letter — never merged silently;
- invalid vectors (null / wrong dim / zero norm) are dead letters, not
  crashes;
- the cycle-end index refresh makes cycle N's vectors visible to cycle
  N+1's probe; the quantizer bootstraps as the train-once artifact the
  GDPR erase job refreshes.
"""

from __future__ import annotations

import json as _json

import pytest
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.embedding_ingest import (
    ingest_embedding_feed,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor


def _write_quantizer(spark, path):
    """Two hand-planted cells: 0 -> x-axis, 1 -> y-axis."""
    spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


@pytest.fixture
def lake(spark, tmp_path):
    """Corpus with a planted hot cell: 10 vectors in cell 0 (over the
    cap of 5), 2 in cell 1 (under it), index built, quantizer written."""
    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        build_ivf_index,
    )

    rows = [(i, [10.0 + i, float(i % 3)]) for i in range(10)]  # cell 0
    rows += [(20, [0.0, 5.0]), (21, [0.5, 8.0])]  # cell 1
    corpus = MergeTable(spark, str(tmp_path / "embeddings"))
    corpus.create(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    )
    qdir = str(tmp_path / "quantizer")
    _write_quantizer(spark, qdir)
    index = MergeTable(spark, str(tmp_path / "emb_index"))
    build_ivf_index(corpus.read(), spark.read.parquet(qdir), index)
    cursor = VersionCursor(spark, str(tmp_path / "emb_index_cursor"))
    # seed the cursor at the corpus head so the cycle-end refresh folds
    # deltas instead of re-bootstrapping (the steady-state shape)
    cursor.upsert("ivf_index", corpus.history()[0]["version"], "OK")
    quarantine = MergeTable(spark, str(tmp_path / "emb_quarantine"))
    return corpus, quarantine, qdir, index, cursor


def _feed(tmp_path, name, lines):
    d = tmp_path / name
    d.mkdir()
    (d / "f.jsonl").write_text("\n".join(lines) + "\n")
    return str(d)


def test_guarded_semantic_door(spark, tmp_path, lake):
    corpus, quarantine, qdir, index, cursor = lake
    feed = _feed(
        tmp_path,
        "feed",
        [
            # near-dup of corpus vec 20 (cosine 1.0) in the UNSATURATED
            # cell -> rejected at the door
            _json.dumps({"vec_id": 100, "embedding": [0.0, 7.0]}),
            # lands in the HOT cell (size 10 > cap 5): with nprobe=1
            # its ONLY probed cell saturated -> NO dedup check ->
            # diverted, never merged silently
            _json.dumps({"vec_id": 101, "embedding": [9.0, 1.0]}),
            # novel vector in the unsaturated cell (cosine vs vec 20 =
            # 0.857, vs 21 = 0.879 -> under the 0.9 bar) -> upserted
            _json.dumps({"vec_id": 102, "embedding": [0.6, 1.0]}),
            "not even json",
            _json.dumps({"vec_id": 103, "embedding": [1.0]}),  # dim
            _json.dumps({"vec_id": 104, "embedding": None}),  # null
            _json.dumps({"vec_id": 105, "embedding": [0.0, 0.0]}),  # norm
        ],
    )
    counts = ingest_embedding_feed(
        spark, feed, corpus, quarantine,
        quantizer_dir=qdir, index=index, index_cursor=cursor,
        nprobe=1, cell_cap=5,
    )
    assert counts["sem_dup_rejected"] == 1
    assert counts["sem_unchecked"] == 1
    assert counts["sem_skipped_cells"] >= 1
    assert counts["invalid"] == 3
    assert counts["quarantined"] == 1  # the malformed line
    assert counts["upserted"] == 1
    ids = {r[0] for r in corpus.read().select("vec_id").collect()}
    assert 102 in ids and 100 not in ids and 101 not in ids

    dead = [r["raw_record"] for r in quarantine.read().collect()]
    assert len(dead) == 6
    reject = next(d for d in dead if "matched_vec_id" in d)
    payload = _json.loads(reject)
    assert payload["vec_id"] == 100 and payload["matched_vec_id"] == 20
    assert payload["matched_cosine"] >= 0.9
    unchecked = next(d for d in dead if "sem_dedup_unchecked" in d)
    u = _json.loads(unchecked)
    assert u["vec_id"] == 101 and u["saturated_cells"] == [0]
    reasons = {
        _json.loads(d).get("reason")
        for d in dead
        if d.startswith("{") and "reason" in d
    }
    assert {"dim_mismatch", "null_embedding", "zero_norm"} <= reasons
    assert any("not even json" in d for d in dead)

    # cycle-end refresh folded vec 102 into the index: re-delivering
    # the same feed is idempotent (same id = update, not a rejection)
    counts2 = ingest_embedding_feed(
        spark, feed, corpus, quarantine,
        quantizer_dir=qdir, index=index, index_cursor=cursor,
        nprobe=1, cell_cap=5,
    )
    assert counts2["upserted"] == 1  # 102 updates in place
    assert corpus.read().filter(F.col("vec_id") == 102).count() == 1
    idx_ids = {r[0] for r in index.read().select("vec_id").collect()}
    assert 102 in idx_ids

    # and a near-dup OF the new vector now bounces off the index
    feed3 = _feed(
        tmp_path, "feed3",
        [_json.dumps({"vec_id": 200, "embedding": [0.6, 1.0]})],
    )
    c3 = ingest_embedding_feed(
        spark, feed3, corpus, quarantine,
        quantizer_dir=qdir, index=index, index_cursor=cursor,
        nprobe=1, cell_cap=5,
    )
    assert c3["sem_dup_rejected"] == 1 and c3["upserted"] == 0


def test_bootstrap_from_empty_lake(spark, tmp_path):
    """First cycle on an empty lake: no quantizer, no index, no corpus
    — vectors land unprobed (nothing to dedup against), the corpus
    table is created; the SECOND cycle trains the quantizer artifact
    from the standing corpus, bootstraps the index at cycle end, and
    the THIRD cycle's probe rejects a near-dup — the self-wiring
    lifecycle the CLI job relies on."""
    import os

    corpus = MergeTable(spark, str(tmp_path / "embeddings"))
    quarantine = MergeTable(spark, str(tmp_path / "emb_quarantine"))
    index = MergeTable(spark, str(tmp_path / "emb_index"))
    cursor = VersionCursor(spark, str(tmp_path / "emb_index_cursor"))
    qdir = str(tmp_path / "quantizer")

    f1 = _feed(
        tmp_path, "f1",
        [
            _json.dumps({"vec_id": i, "embedding": [float(i), 1.0]})
            for i in range(1, 13)
        ],
    )
    c1 = ingest_embedding_feed(
        spark, f1, corpus, quarantine,
        quantizer_dir=qdir, index=index, index_cursor=cursor,
    )
    assert c1["upserted"] == 12 and c1["sem_dup_rejected"] == 0
    assert not os.path.isdir(qdir)  # nothing existed to train on

    f2 = _feed(
        tmp_path, "f2",
        [_json.dumps({"vec_id": 50, "embedding": [100.0, 3.0]})],
    )
    c2 = ingest_embedding_feed(
        spark, f2, corpus, quarantine,
        quantizer_dir=qdir, index=index, index_cursor=cursor,
    )
    assert c2["upserted"] == 1
    from urban_mobility_data_pipeline_spark.extensions.classifier import (
        artifact_exists,
    )

    assert artifact_exists(qdir)  # trained this cycle
    assert index.exists()  # bootstrapped at cycle end

    # third cycle: an exact copy of vec 50 under a new id bounces
    f3 = _feed(
        tmp_path, "f3",
        [_json.dumps({"vec_id": 99, "embedding": [100.0, 3.0]})],
    )
    c3 = ingest_embedding_feed(
        spark, f3, corpus, quarantine,
        quantizer_dir=qdir, index=index, index_cursor=cursor,
    )
    assert c3["sem_dup_rejected"] == 1 and c3["upserted"] == 0
    assert 99 not in {
        r[0] for r in corpus.read().select("vec_id").collect()
    }


def test_duplicate_key_feed_lands_one_row(spark, tmp_path):
    """The MERGE source must be unique-keyed: the same vec_id twice in
    one feed lands exactly one deterministic (content-addressed) row."""
    corpus = MergeTable(spark, str(tmp_path / "embeddings"))
    quarantine = MergeTable(spark, str(tmp_path / "emb_quarantine"))
    feed = _feed(
        tmp_path, "feed",
        [
            _json.dumps({"vec_id": 7, "embedding": [1.0, 2.0]}),
            _json.dumps({"vec_id": 7, "embedding": [3.0, 4.0]}),
        ],
    )
    counts = ingest_embedding_feed(spark, feed, corpus, quarantine)
    assert counts["upserted"] == 1
    rows = corpus.read().collect()
    assert len(rows) == 1
    # md5("1.0,2.0") < md5("3.0,4.0") is arbitrary but FIXED: pin the
    # content-addressed winner so both engines/replays agree
    import hashlib

    a = hashlib.md5(b"1.0,2.0").hexdigest()
    b = hashlib.md5(b"3.0,4.0").hexdigest()
    want = [1.0, 2.0] if a < b else [3.0, 4.0]
    assert [float(x) for x in rows[0]["embedding"]] == want


def test_embedding_ingest_cli(spark, tmp_path):
    """The embedding_ingest job drives the same loop through the CLI
    dispatcher, self-wiring the quantizer/index at the lake's standard
    paths — and corpus_erase reaches the new tables + retrains the
    quantizer artifact against the post-erasure corpus."""
    from urban_mobility_data_pipeline_spark.run import main

    feed = _feed(
        tmp_path, "feed",
        [
            _json.dumps({"vec_id": i, "embedding": [float(i), 1.0]})
            for i in range(1, 13)
        ],
    )
    lake = str(tmp_path / "lake")
    rc = main(
        ["embedding_ingest", "--lake", lake, "--source", feed],
        spark=spark,
    )
    assert rc == 0
    emb = MergeTable(spark, f"{lake}/corpus/embeddings")
    assert emb.read().count() == 12
    # second run: quantizer trains, index bootstraps
    rc = main(
        ["embedding_ingest", "--lake", lake, "--source", feed],
        spark=spark,
    )
    assert rc == 0
    from urban_mobility_data_pipeline_spark.extensions.classifier import (
        artifact_exists,
    )

    qdir = f"{lake}/corpus/quantizer"
    assert artifact_exists(qdir)
    assert MergeTable(spark, f"{lake}/corpus/emb_index").exists()
    import pyarrow.parquet as pq
    import glob

    before = {
        tuple(r)
        for r in spark.read.parquet(qdir).select("cell").collect()
    }
    assert before  # trained

    # GDPR: erase two subjects; embeddings + index rows go NOW and the
    # quantizer artifact retrains against the post-erasure corpus
    rc = main(
        ["corpus_erase", "--lake", lake, "--ids", "3,4"],
        spark=spark,
    )
    assert rc == 0
    assert emb.read().filter(F.col("vec_id").isin([3, 4])).count() == 0
    idx = MergeTable(spark, f"{lake}/corpus/emb_index")
    assert idx.read().filter(F.col("vec_id").isin([3, 4])).count() == 0
    assert artifact_exists(qdir)  # refreshed, not left absent
    # the erased vectors' bytes left the quantizer's training set: the
    # artifact was rewritten after the delete (crash-safe order pinned
    # in gdpr_corpus.propagate_erasure)


def test_corpus_maintenance_folds_emb_index(spark, tmp_path):
    """Nightly corpus_maintenance reaches the vector side (r12): with
    an embeddings table + quantizer artifact present, the tick folds
    the IVF index (so erasures / out-of-band commits land even when no
    embedding_ingest cycle runs), and the emb tables ride the same
    compaction/bloom/vacuum sweep via CORPUS_ID_COLS."""
    from urban_mobility_data_pipeline_spark.run import main

    lake = str(tmp_path / "lake")
    feed = _feed(
        tmp_path, "feed",
        [
            _json.dumps({"vec_id": i, "embedding": [float(i), 1.0]})
            for i in range(1, 13)
        ],
    )
    # two ingest runs: create corpus, then train quantizer + index
    for _ in range(2):
        assert main(
            ["embedding_ingest", "--lake", lake, "--source", feed],
            spark=spark,
        ) == 0
    # a text corpus must exist for the maintenance job to start
    (tmp_path / "tfeed").mkdir()
    (tmp_path / "tfeed" / "f.jsonl").write_text(_json.dumps({
        "doc_id": 1,
        "text": "the quick brown fox jumps over a lazy dog in the park",
        "lang": "en",
    }) + "\n")
    assert main(
        ["corpus_ingest", "--lake", lake,
         "--source", str(tmp_path / "tfeed")],
        spark=spark,
    ) == 0
    # out-of-band commit: append a vector WITHOUT an ingest cycle
    emb = MergeTable(spark, f"{lake}/corpus/embeddings")
    emb.append(spark.createDataFrame(
        [(99, [50.0, 2.0])], "vec_id long, embedding array<float>"
    ))
    assert main(
        ["corpus_maintenance", "--lake", lake], spark=spark
    ) == 0
    idx = MergeTable(spark, f"{lake}/corpus/emb_index")
    assert idx.read().filter(F.col("vec_id") == 99).count() == 1


def test_stream_embedding_door(spark, tmp_path, lake):
    """Streaming twin of the guarded vector door: micro-batches drain
    through the same validation -> guarded probe -> MERGE; a batch
    carrying a near-dup, a hot-cell-unchecked vector, an invalid
    vector AND a malformed line keeps every dead-letter kind (one
    replay-guarded append per batch); a later run of the same stream
    probes against vectors the earlier run merged; a no-new-files run
    is a no-op."""
    from urban_mobility_data_pipeline_spark.extensions.embedding_ingest import (
        stream_ingest_embedding_feed,
    )

    corpus, quarantine, qdir, index, cursor = lake
    feed = tmp_path / "sfeed"
    feed.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # run 1: ONE file -> one micro-batch with all four row kinds
    (feed / "a.jsonl").write_text(
        "\n".join([
            _json.dumps({"vec_id": 100, "embedding": [0.0, 7.0]}),  # dup of 20
            _json.dumps({"vec_id": 101, "embedding": [9.0, 1.0]}),  # hot cell
            _json.dumps({"vec_id": 102, "embedding": [0.6, 1.0]}),  # novel
            "not even json",
            _json.dumps({"vec_id": 103, "embedding": [1.0]}),  # bad dim
        ]) + "\n"
    )
    stream_ingest_embedding_feed(
        spark, str(feed), corpus, quarantine, ckpt,
        quantizer_dir=qdir, index=index, index_cursor=cursor,
        nprobe=1, cell_cap=5,
    )
    ids = {r[0] for r in corpus.read().select("vec_id").collect()}
    assert 102 in ids and 100 not in ids and 101 not in ids
    dead = [r["raw_record"] for r in quarantine.read().collect()]
    assert len(dead) == 4, dead  # every kind survived the ONE append
    assert any("matched_vec_id" in d for d in dead)
    assert any("sem_dedup_unchecked" in d for d in dead)
    assert any("dim_mismatch" in d for d in dead)
    assert any("not even json" in d for d in dead)

    # run 2: a near-dup of run 1's merged vector bounces (in-stream
    # index refresh made it probe-able), and run 1's files are not
    # reprocessed (quarantine count unchanged except the new reject)
    (feed / "b.jsonl").write_text(
        _json.dumps({"vec_id": 200, "embedding": [0.6, 1.0]}) + "\n"
    )
    stream_ingest_embedding_feed(
        spark, str(feed), corpus, quarantine, ckpt,
        quantizer_dir=qdir, index=index, index_cursor=cursor,
        nprobe=1, cell_cap=5,
    )
    assert 200 not in {
        r[0] for r in corpus.read().select("vec_id").collect()
    }
    assert quarantine.read().count() == 5

    # run 3: no new files -> no-op
    stream_ingest_embedding_feed(
        spark, str(feed), corpus, quarantine, ckpt,
        quantizer_dir=qdir, index=index, index_cursor=cursor,
        nprobe=1, cell_cap=5,
    )
    assert quarantine.read().count() == 5
    assert corpus.read().count() == 13
