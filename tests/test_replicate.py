"""Incremental replication: after every refresh the replica's content
must equal the source's, across inserts, updates, deletes, compaction
re-emission, and interleaved cycles — with each delta cycle shipping
only the touched keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.extensions.replicate import (
    replica_lag,
    replicate_table,
)
from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.watermark import VersionCursor


def _rows(t: MergeTable):
    return {
        tuple(r) for r in t.read().select("doc_id", "text", "lang").collect()
    }


def _mk(spark, tmp_path):
    src = MergeTable(spark, str(tmp_path / "src"))
    dst = MergeTable(spark, str(tmp_path / "dst"))
    cursor = VersionCursor(spark, str(tmp_path / "cursor"))
    src.create(
        spark.createDataFrame(
            [(i, f"doc {i} body", "en") for i in range(20)],
            "doc_id long, text string, lang string",
        )
    )
    return src, dst, cursor


def test_replica_tracks_source(spark, tmp_path):
    src, dst, cursor = _mk(spark, tmp_path)

    r = replicate_table(src, dst, cursor, "doc_id")
    assert r["mode"] == "bootstrap"
    assert _rows(dst) == _rows(src)
    assert replica_lag(src, cursor) == 0

    # insert + update on the source
    src.merge(
        spark.createDataFrame(
            [(3, "doc 3 REVISED", "en"), (99, "doc 99 new", "es")],
            "doc_id long, text string, lang string",
        ),
        keys=["doc_id"],
        update_set={"text": F.col("s.text"), "lang": F.col("s.lang")},
        insert=True,
    )
    assert replica_lag(src, cursor) == 1
    r = replicate_table(src, dst, cursor, "doc_id")
    assert r["mode"] == "delta" and r["deleted"] == 0
    # only the touched keys shipped, not the table
    assert 0 < r["upserted"] <= 21
    assert _rows(dst) == _rows(src)

    # delete on the source must propagate
    src.delete(F.col("doc_id").isin(5, 99))
    r = replicate_table(src, dst, cursor, "doc_id")
    assert r["mode"] == "delta" and r["deleted"] >= 2
    assert _rows(dst) == _rows(src)
    assert dst.read().where(F.col("doc_id").isin(5, 99)).count() == 0

    # no-op cycle
    assert replicate_table(src, dst, cursor, "doc_id")["mode"] == "noop"
    assert _rows(dst) == _rows(src)


def test_replica_survives_source_compaction(spark, tmp_path):
    """auto_compact rewrites source files, re-emitting unchanged rows
    through the change feed — the replica must absorb them as no-op
    upserts, never diverge, never resurrect deleted rows."""
    src, dst, cursor = _mk(spark, tmp_path)
    replicate_table(src, dst, cursor, "doc_id")

    src.delete(F.col("doc_id") == 7)
    replicate_table(src, dst, cursor, "doc_id")
    assert _rows(dst) == _rows(src)

    compacted = src.auto_compact(max_files=1)
    if compacted:
        r = replicate_table(src, dst, cursor, "doc_id")
        assert r["mode"] in ("delta", "noop")
    assert _rows(dst) == _rows(src)
    assert dst.read().where(F.col("doc_id") == 7).count() == 0


def test_replica_follows_source_schema_evolution(spark, tmp_path):
    """A column added on the source appears on the replica at the next
    cycle; rows not re-shipped carry NULL, re-shipped rows carry the
    value — the same contract as MERGE schema evolution."""
    src, dst, cursor = _mk(spark, tmp_path)
    replicate_table(src, dst, cursor, "doc_id")

    evolved = spark.createDataFrame(
        [(2, "doc 2 tagged", "en", "crawl-7")],
        "doc_id long, text string, lang string, origin string",
    )
    src.merge(
        evolved,
        keys=["doc_id"],
        update_set={
            "text": F.col("s.text"),
            "lang": F.col("s.lang"),
            "origin": F.col("s.origin"),
        },
        insert=True,
        evolve_schema=True,
    )
    r = replicate_table(src, dst, cursor, "doc_id")
    assert r["mode"] == "delta"
    assert "origin" in dst.read().columns
    got = {
        r["doc_id"]: r["origin"]
        for r in dst.read().select("doc_id", "origin").collect()
    }
    assert got[2] == "crawl-7"
    assert got[1] is None
    src_rows = {
        tuple(r)
        for r in src.read().select("doc_id", "text", "lang", "origin").collect()
    }
    dst_rows = {
        tuple(r)
        for r in dst.read().select("doc_id", "text", "lang", "origin").collect()
    }
    assert dst_rows == src_rows


def test_multiple_commits_between_refreshes_ship_latest(spark, tmp_path):
    """Two updates to one key plus an update-then-delete of another,
    all inside one refresh window: the replica must land on the LATEST
    state (one current row, no resurrection, no duplicate-key fanout
    from the stacked after-images)."""
    src, dst, cursor = _mk(spark, tmp_path)
    replicate_table(src, dst, cursor, "doc_id")

    def upd(doc_id, text):
        src.merge(
            spark.createDataFrame(
                [(doc_id, text, "en")],
                "doc_id long, text string, lang string",
            ),
            keys=["doc_id"],
            update_set={"text": F.col("s.text"), "lang": F.col("s.lang")},
            insert=True,
        )

    upd(4, "doc 4 v1")
    upd(4, "doc 4 v2 FINAL")
    upd(6, "doc 6 doomed")
    src.delete(F.col("doc_id") == 6)

    r = replicate_table(src, dst, cursor, "doc_id")
    assert r["mode"] == "delta"
    assert _rows(dst) == _rows(src)
    got = {r["doc_id"]: r["text"] for r in dst.read().collect()}
    assert got[4] == "doc 4 v2 FINAL"
    assert 6 not in got
    assert dst.read().groupBy("doc_id").count().where("count > 1").count() == 0


def test_corpus_replicate_cli(spark, tmp_path):
    """corpus_replicate drives row-delta replication through the CLI
    dispatcher after corpus_ingest cycles."""
    from urban_mobility_data_pipeline_spark.run import main

    feed = [
        '{"doc_id": 1, "text": "the data engine runs the merge in a batch", "lang": "en"}',
        '{"doc_id": 2, "text": "a stream is a log of batches in the engine", "lang": "en"}',
    ]
    (tmp_path / "feed").mkdir()
    (tmp_path / "feed" / "f.jsonl").write_text("\n".join(feed) + "\n")
    lake = str(tmp_path / "lake")
    assert main(
        ["corpus_ingest", "--lake", lake, "--source", str(tmp_path / "feed")],
        spark=spark,
    ) == 0
    assert main(["corpus_replicate", "--lake", lake], spark=spark) == 0
    src = MergeTable(spark, str(tmp_path / "lake" / "corpus" / "documents"))
    dst = MergeTable(spark, str(tmp_path / "lake" / "replica" / "documents"))
    assert _rows(dst) == _rows(src)
    # idempotent second run
    assert main(["corpus_replicate", "--lake", lake], spark=spark) == 0
    assert _rows(dst) == _rows(src)
