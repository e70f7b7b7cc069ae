"""CLI job runner — the analogue of the reference's 30+
``scripts/run/*.sh`` spark-submit entry points (e.g.
``scripts/run/run_trips_bronze.sh:6-10``,
``scripts/run/gdpr/run_gdpr_propagate_erasure.sh``,
``scripts/run/retention/run_bronze_retention_cleanup.sh``), collapsed
into one parameterized dispatcher over :mod:`.domain.jobs`:

    python -m urban_mobility_data_pipeline_spark.run --list
    python -m urban_mobility_data_pipeline_spark.run trips_bronze \\
        --lake /data/lake --source /staging/trips.parquet
    python -m urban_mobility_data_pipeline_spark.run trips_silver --lake /data/lake
    python -m urban_mobility_data_pipeline_spark.run fact_trips --lake /data/lake
    python -m urban_mobility_data_pipeline_spark.run gdpr_propagate_erasure \\
        --lake /data/lake --requests /staging/requests.parquet --salt s3cret
    python -m urban_mobility_data_pipeline_spark.run retention_cleanup \\
        --lake /data/lake --bronze-days 30 --silver-days 365

Where the reference wires one hard-coded script per table per layer,
jobs here are config-driven (``domain.config.ALL_TABLES``): the
``<table>_bronze`` / ``<table>_silver`` / ``<table>_silver_cdf`` names
are generated from the same registry the engine uses, so a new table
needs a TableConfig, not a new script.
"""

from __future__ import annotations

import argparse
import os
import sys

from urban_mobility_data_pipeline_spark.domain import config as C
from urban_mobility_data_pipeline_spark.domain import jobs as J

#: entity -> (dim flavor builders) mirrored from the reference's
#: gold/_conformed {snapshot,hist,scd3} script tree; tracked SCD3
#: columns follow each entity's reference dim (scd3/dim_passenger.py).
_SCD3_TRACKED = {
    "passengers": ["full_name", "email", "city"],
    "drivers": ["full_name", "status"],
    "vehicles": ["make", "status"],
}


def _bronze_job(cfg: C.TableConfig):
    def run(lake: J.Lakehouse, args) -> str:
        if not args.source:
            raise SystemExit(f"{cfg.name}_bronze requires --source PATH")
        src = lake.spark.read.format(args.source_format).load(args.source)
        n = J.bronze_ingest(lake, cfg, src)
        return f"ingested {n} rows into bronze/{cfg.name}"

    return run


def _silver_job(cfg: C.TableConfig, cdf: bool):
    def run(lake: J.Lakehouse, args) -> str:
        n = (
            J.silver_apply_changes(lake, cfg)
            if cdf
            else J.silver_apply(lake, cfg)
        )
        mode = "change-feed" if cdf else "watermark"
        return f"applied {n} rows to silver/{cfg.name} ({mode})"

    return run


def _gold_jobs() -> dict:
    jobs = {
        "dim_date": lambda lake, a: (J.build_dim_date(lake), "built dim_date")[1],
        "dim_payment_method": lambda lake, a: (
            J.build_dim_payment_method(lake),
            "built dim_payment_method",
        )[1],
        "dim_zone": lambda lake, a: (
            J.build_static_dim(
                lake,
                "dim_zone",
                J.silver_current(lake, "zones").select(
                    "zone_id", "zone_name", "city", "region"
                ),
            ),
            "built dim_zone",
        )[1],
        "fact_trips": lambda lake, a: (J.build_fact_trips(lake), "built fact_trips")[1],
        "fact_payments": lambda lake, a: (
            J.build_fact_payments(lake),
            "built fact_payments",
        )[1],
        "agg_trips_daily": lambda lake, a: (
            J.build_agg_trips_daily(lake),
            "built agg_trips_daily",
        )[1],
        "agg_driver_daily": lambda lake, a: (
            J.build_agg_driver_daily(lake),
            "built agg_driver_daily",
        )[1],
    }
    for ent_tbl, tracked in _SCD3_TRACKED.items():
        cfg = C.ALL_TABLES[ent_tbl]
        ent = ent_tbl[:-1]
        jobs[f"dim_{ent}"] = (
            lambda lake, a, c=cfg, e=ent: (
                J.build_snapshot_dim(lake, c, f"dim_{e}"),
                f"built dim_{e} (snapshot)",
            )[1]
        )
        jobs[f"dim_{ent}_hist"] = (
            lambda lake, a, c=cfg, e=ent: (
                J.build_hist_dim(lake, c, f"dim_{e}_hist"),
                f"built dim_{e}_hist (scd2)",
            )[1]
        )
        jobs[f"dim_{ent}_scd3"] = (
            lambda lake, a, c=cfg, e=ent, t=tracked: (
                J.build_scd3_dim(lake, c, f"dim_{e}_scd3", t),
                f"built dim_{e}_scd3",
            )[1]
        )
    return jobs


def _gdpr_job(lake: J.Lakehouse, args) -> str:
    if not args.requests or not args.salt:
        raise SystemExit("gdpr_propagate_erasure requires --requests and --salt")
    reqs = lake.spark.read.format(args.source_format).load(args.requests)
    counts = J.run_gdpr(lake, reqs, salt=args.salt, vacuum_pii=not args.no_vacuum)
    return f"erasure propagated: {counts}"


def _corpus_erase_job(lake: J.Lakehouse, args) -> str:
    """GDPR erasure over the LLM-corpus derivative tables (the
    extension analogue of gdpr_propagate_erasure): doc ids come from
    --ids or a --requests parquet with a doc_id column; tables live
    under --corpus (default <lake>/corpus) by their canonical names."""
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        CORPUS_ID_COLS,
        erase_document_ids,
    )
    from urban_mobility_data_pipeline_spark.operators.gdpr import AuditLog
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    if not args.ids and not args.requests:
        raise SystemExit("corpus_erase requires --ids N,N,... or --requests")
    spark = lake.spark
    if args.ids:
        ids = [int(x) for x in args.ids.split(",") if x]
    else:
        ids = [
            r[0]
            for r in spark.read.format(args.source_format)
            .load(args.requests)
            .select("doc_id")
            .distinct()
            .collect()
        ]
    root = args.corpus or os.path.join(args.lake, "corpus")
    tables = {
        name: MergeTable(spark, os.path.join(root, name))
        for name in CORPUS_ID_COLS
    }
    audit = (
        AuditLog(spark, os.path.join(root, "gdpr_audit"), salt=args.salt)
        if args.salt
        else None
    )
    # model-artifact tier: corpus-derived artifacts at the lake's
    # standard paths are derived personal data too. The quality model
    # REFRESHES (retrains against the post-erasure corpus — erasure
    # must not wait for the PSI trigger); anything without a retrain
    # closure is invalidated outright, never left stale.
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        ModelArtifact,
    )

    model_dir = os.path.join(root, "quality_model")
    corpus_tbl = tables["documents"]

    def _retrain_quality() -> None:
        from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
            rebuild_quality_classifier,
        )
        from urban_mobility_data_pipeline_spark.operators.watermark import (
            VersionCursor,
        )
        from urban_mobility_data_pipeline_spark.plans.llm_ops import (
            _LOGREG_FEATURE_COLS,
        )

        # the rebuild reseeds the maintained histogram from the
        # post-erasure HEAD; advancing the cursor with it keeps the
        # next quality_model_refresh tick from re-folding the
        # erasure's delta into the already-reseeded state (ADVICE r11)
        rebuild_quality_classifier(
            corpus_tbl,
            model_dir,
            MergeTable(spark, os.path.join(root, "quality_clf_hist")),
            _quality_feature_frame,
            _LOGREG_FEATURE_COLS,
            cursor=VersionCursor(
                spark, os.path.join(root, "quality_clf_cursor")
            ),
        )

    quantizer_dir = os.path.join(root, "quantizer")
    emb_tbl = tables.get("embeddings")

    def _retrain_quantizer() -> None:
        from urban_mobility_data_pipeline_spark.extensions.similarity import (
            train_adaptive_quantizer,
        )

        if not emb_tbl.read().limit(1).count():
            return  # erasure emptied the corpus: stay invalidated
        train_adaptive_quantizer(
            emb_tbl.read().select("vec_id", "embedding"),
            materialize_dir=quantizer_dir,
        )

    artifacts = {
        "quality_classifier": ModelArtifact(
            model_dir, model_dir + "_train_hist", retrain=_retrain_quality
        ),
        # the semantic-dedup quantizer: embedding_ingest is its
        # standing CLI trainer (r12), so when a post-erasure embeddings
        # corpus exists it REFRESHES against it; with no corpus left to
        # train on it is invalidated so the next ingest retrains
        "quantizer": ModelArtifact(
            quantizer_dir,
            retrain=(
                _retrain_quantizer
                if emb_tbl is not None and emb_tbl.exists()
                else None
            ),
        ),
    }
    deleted = erase_document_ids(
        spark, ids, tables, audit=audit, vacuum=not args.no_vacuum,
        artifacts=artifacts,
    )
    return f"corpus erasure ({len(ids)} subjects): {deleted}"


def _corpus_ingest_job(lake: J.Lakehouse, args) -> str:
    """Crawl-feed ingest into the corpus lakehouse: quarantine split →
    quality gates + PII redaction → MERGE upsert (idempotent under feed
    re-delivery). The corpus analogue of the <table>_bronze jobs."""
    from urban_mobility_data_pipeline_spark.extensions.corpus_ingest import (
        ingest_feed,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    if not args.source:
        raise SystemExit("corpus_ingest requires --source FEED_DIR")
    root = args.corpus or os.path.join(args.lake, "corpus")
    # dedup-at-ingest wires itself when the maintained index exists at
    # the lake's standard path (dedup_index_refresh / the nightly
    # maintenance job create it) — and then the saturation guard comes
    # WITH it by default (VERDICT r10 item 1): the sizes table rides
    # the same refresh, saturated buckets are skipped and reported,
    # fully-unchecked docs divert to the quarantine.
    index = MergeTable(
        lake.spark, os.path.join(root, "dedup_index"),
        bucket_keys=["doc_id"], num_buckets=32,
    )
    kw = {}
    if index.exists():
        kw = dict(
            dedup_index=index,
            dedup_cursor=VersionCursor(
                lake.spark, os.path.join(root, "dedup_index_cursor")
            ),
            dedup_sizes=MergeTable(
                lake.spark, os.path.join(root, "dedup_index_sizes")
            ),
        )
    # the MODEL quality tier wires itself the same way: once
    # quality_model_refresh has trained the artifact at the standard
    # path, every later ingest scores against it map-side (CCNet's
    # heuristics-then-classifier recipe, live at the door)
    from urban_mobility_data_pipeline_spark.extensions.classifier import (
        artifact_exists,
    )

    qm = os.path.join(root, "quality_model")
    if artifact_exists(qm):
        kw["quality_model_dir"] = qm
    counts = ingest_feed(
        lake.spark,
        args.source,
        corpus=MergeTable(lake.spark, os.path.join(root, "documents")),
        quarantine=MergeTable(lake.spark, os.path.join(root, "quarantine")),
        fmt=args.feed_format,
        **kw,
    )
    return (
        f"corpus ingest: {counts['upserted']} upserted, "
        f"{counts['quarantined']} quarantined, "
        f"{counts['near_dup_rejected']} near-dup rejected, "
        f"{counts['dedup_skipped_bands']} saturated bands skipped, "
        f"{counts['dedup_unchecked']} unchecked docs diverted, "
        f"{counts['model_gated']} model-gated"
    )


def _embedding_ingest_job(lake: J.Lakehouse, args) -> str:
    """Embedding-feed ingest into the vector lakehouse — the vector
    twin of corpus_ingest (VERDICT r11 #5: the semantic guard's
    production consumer). Guarded semantic dedup-at-ingest wires
    itself BY DEFAULT: the adaptive quantizer trains once at the
    lake's standard path (<corpus>/quantizer — the artifact
    corpus_erase already invalidates/refreshes) the first time a
    corpus exists to train on, the IVF index bootstraps at cycle end,
    and every later feed probes it with the cell-cap guard (skips
    counted, fully-unchecked vectors diverted as dead letters)."""
    from urban_mobility_data_pipeline_spark.extensions.embedding_ingest import (
        ingest_embedding_feed,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    if not args.source:
        raise SystemExit("embedding_ingest requires --source FEED_DIR")
    root = args.corpus or os.path.join(args.lake, "corpus")
    fmt = args.feed_format if args.feed_format in ("jsonl", "parquet") else "jsonl"
    counts = ingest_embedding_feed(
        lake.spark,
        args.source,
        corpus=MergeTable(lake.spark, os.path.join(root, "embeddings")),
        quarantine=MergeTable(
            lake.spark, os.path.join(root, "emb_quarantine")
        ),
        quantizer_dir=os.path.join(root, "quantizer"),
        index=MergeTable(lake.spark, os.path.join(root, "emb_index")),
        index_cursor=VersionCursor(
            lake.spark, os.path.join(root, "emb_index_cursor")
        ),
        fmt=fmt,
    )
    return (
        f"embedding ingest: {counts['upserted']} upserted, "
        f"{counts['quarantined']} quarantined, "
        f"{counts['invalid']} invalid vectors, "
        f"{counts['sem_dup_rejected']} semantic-dup rejected, "
        f"{counts['sem_skipped_cells']} saturated cells skipped, "
        f"{counts['sem_unchecked']} unchecked vectors diverted"
    )


def _vocab_refresh_job(lake: J.Lakehouse, args) -> str:
    """Incrementally maintained corpus vocabulary: fold the corpus
    commits since the version cursor into the token-bucketed vocab
    table (delta maintenance — O(changed docs), not O(corpus)). Run
    after corpus_ingest cycles; a no-op when the corpus is unchanged."""
    from urban_mobility_data_pipeline_spark.extensions.vocab import (
        refresh_vocabulary,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    root = args.corpus or os.path.join(args.lake, "corpus")
    corpus = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not corpus.exists():
        raise SystemExit("vocab_refresh: no corpus at " + root)
    vocab = MergeTable(
        lake.spark,
        os.path.join(root, "vocab"),
        bucket_keys=["token"],
        num_buckets=32,
    )
    cursor = VersionCursor(lake.spark, os.path.join(root, "vocab_cursor"))
    n = refresh_vocabulary(corpus, vocab, cursor)
    return f"vocab refresh: folded {n} changed docs"


def _dsir_model_refresh_job(lake: J.Lakehouse, args) -> str:
    """Incrementally maintained DSIR bucket model: fold the corpus
    commits since the version cursor into the <=256-row (bucket, r, t)
    model table (delta maintenance — O(changed docs), not O(corpus)),
    so the ingest gate's importance-weight model stays current without
    retraining. Target slice: English documents (the corpus tables
    this CLI manages carry ``lang``, not ``source``)."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.dsir_model import (
        refresh_dsir_model,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    root = args.corpus or os.path.join(args.lake, "corpus")
    corpus = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not corpus.exists():
        raise SystemExit("dsir_model_refresh: no corpus at " + root)
    model = MergeTable(lake.spark, os.path.join(root, "dsir_model"))
    cursor = VersionCursor(
        lake.spark, os.path.join(root, "dsir_model_cursor")
    )
    n = refresh_dsir_model(
        corpus, model, cursor, F.col("lang") == "en"
    )
    return f"dsir model refresh: folded {n} changed docs"


def _quality_feature_frame(docs):
    """CLI-corpus adapter for the classifier feature builder: the
    managed corpus tables carry ``lang``, not ``source`` — inject a
    constant so the one feature/label definition (shared with the
    catalog rows and their oracles) applies unchanged."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        _logreg_feature_frame,
    )

    if "source" not in docs.columns:
        docs = docs.withColumn("source", F.lit("corpus"))
    return _logreg_feature_frame(docs)


def _quality_model_refresh_job(lake: J.Lakehouse, args) -> str:
    """Maintained model-based quality classifier (the distilled Gopher
    gate): full-batch GD has no exact delta fold, so the maintenance
    contract is RETRAIN-ON-TRIGGER — each run folds the changed docs'
    weak-label/feature histogram O(changed), PSIs it against the
    training-time snapshot, and retrains the parquet weights artifact
    only when the input mix moved (psi >= 0.25). Run after ingest
    cycles like vocab_refresh; the artifact lives at
    <corpus>/quality_model for scoring jobs and streaming gates to
    read."""
    from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
        refresh_quality_classifier,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        _LOGREG_FEATURE_COLS,
    )

    root = args.corpus or os.path.join(args.lake, "corpus")
    corpus = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not corpus.exists():
        raise SystemExit("quality_model_refresh: no corpus at " + root)
    r = refresh_quality_classifier(
        corpus,
        os.path.join(root, "quality_model"),
        MergeTable(lake.spark, os.path.join(root, "quality_clf_hist")),
        VersionCursor(
            lake.spark, os.path.join(root, "quality_clf_cursor")
        ),
        _quality_feature_frame,
        _LOGREG_FEATURE_COLS,
    )
    verdict = "RETRAINED" if r["retrained"] else "model kept"
    feat = r["psi_feature"] or "-"
    return (
        f"quality model: {r['changed']} changed docs folded, "
        f"psi {r['psi']} ({feat}), {verdict}"
    )


def _quality_scores_refresh_job(lake: J.Lakehouse, args) -> str:
    """Maintained per-doc quality-score table: scoring is a pure
    per-doc function of the frozen weights, so changed docs rescore
    O(changed) and erased ids leave the table; a model retrain (new
    artifact fingerprint) forces one full rescore so rows never mix
    model versions. Run after quality_model_refresh; the table lives
    at <corpus>/quality_scores for sampling/mixing jobs to read."""
    from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
        refresh_quality_scores,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        _LOGREG_FEATURE_COLS,
    )

    root = args.corpus or os.path.join(args.lake, "corpus")
    corpus = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not corpus.exists():
        raise SystemExit("quality_scores_refresh: no corpus at " + root)
    r = refresh_quality_scores(
        corpus,
        os.path.join(root, "quality_model"),
        MergeTable(lake.spark, os.path.join(root, "quality_scores")),
        VersionCursor(
            lake.spark, os.path.join(root, "quality_scores_cursor")
        ),
        _quality_feature_frame,
        _LOGREG_FEATURE_COLS,
    )
    return (
        f"quality scores: {r['mode']} refresh, {r['changed']} docs"
    )


def _corpus_replicate_job(lake: J.Lakehouse, args) -> str:
    """Keep a replica of the corpus documents table current: row-delta
    replication driven by the change feed (extensions/replicate.py).
    --table names the replica root (default <lake>/replica); run after
    ingest/erasure cycles like the other maintenance jobs."""
    from urban_mobility_data_pipeline_spark.extensions.replicate import (
        replicate_table,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    root = args.corpus or os.path.join(args.lake, "corpus")
    src = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not src.exists():
        raise SystemExit("corpus_replicate: no corpus at " + root)
    replica_root = args.table or os.path.join(args.lake, "replica")
    dst = MergeTable(lake.spark, os.path.join(replica_root, "documents"))
    cursor = VersionCursor(
        lake.spark, os.path.join(replica_root, "replicate_cursor")
    )
    r = replicate_table(src, dst, cursor, "doc_id")
    return (
        f"replicate ({r['mode']}): {r['upserted']} upserted, "
        f"{r['deleted']} deleted -> {replica_root}"
    )


def _dataset_card_job(lake: J.Lakehouse, args) -> str:
    """Publish a dataset card for the corpus: one JSON document with
    the numbers a consumer needs before training on it — volume, token
    count, language mix, exact-duplicate rate, length stats — keyed to
    the corpus txn-log VERSION it describes (re-running on an
    unchanged corpus reproduces the card byte-for-byte; no wall-clock
    fields). Two small aggregation passes; written atomically beside
    the corpus."""
    import json as _json

    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.functions import text as T
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    root = args.corpus or os.path.join(args.lake, "corpus")
    corpus = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not corpus.exists():
        raise SystemExit("dataset_card: no corpus at " + root)
    hist = corpus.history()
    version = hist[0]["version"] if hist else 0
    feats = corpus.read().select(
        "lang",
        F.md5("text").alias("h"),
        F.size(T.words("text")).alias("n_words"),
    )
    g = feats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_tokens"),
        F.countDistinct("h").alias("n_distinct"),
        F.round(F.avg("n_words"), 2).alias("avg_words"),
        F.min("n_words").alias("min_words"),
        F.max("n_words").alias("max_words"),
    ).collect()[0]
    langs = {
        r["lang"]: {"n_docs": r["n"], "n_tokens": r["t"]}
        for r in feats.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_words").alias("t"))
        .collect()
    }
    # corpus-level n-gram novelty (the ingest-order freshness signal of
    # plans/llm_ops.corpus_ngram_novelty): share of 3-gram shingles
    # first seen in the final 10% of the ingest order — a collapsing
    # tail means new data is re-reading old content
    from urban_mobility_data_pipeline_spark.extensions.dedup import (
        shingles_df,
    )

    sh = shingles_df(corpus.read()).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    fo = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    cut = corpus.read().select(
        F.expr("approx_percentile(doc_id, 0.9)").alias("c")
    ).collect()[0]["c"]
    nov = fo.agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum((F.col("first_doc") > F.lit(cut)).cast("long")).alias(
            "n_tail_first"
        ),
    ).collect()[0]
    card = {
        "corpus_version": version,
        "n_docs": g["n_docs"],
        "n_tokens": g["n_tokens"],
        "exact_dup_rate": round(
            1.0 - g["n_distinct"] / g["n_docs"], 6
        )
        if g["n_docs"]
        else 0.0,
        "avg_words": g["avg_words"],
        "min_words": g["min_words"],
        "max_words": g["max_words"],
        "languages": langs,
        "distinct_shingles": nov["n_shingles"],
        "tail_novelty_share": round(
            (nov["n_tail_first"] or 0) / nov["n_shingles"], 6
        )
        if nov["n_shingles"]
        else 0.0,
    }
    path = os.path.join(root, "dataset_card.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(card, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)
    return f"dataset card: v{version}, {g['n_docs']} docs -> {path}"


def _dedup_index_job(lake: J.Lakehouse, args) -> str:
    """Incrementally maintained MinHash-LSH band index: fold the corpus
    commits since the version cursor into the index MergeTable, so the
    next ingest batch can be near-dup-probed against the whole corpus
    at O(batch) cost. Run after corpus_ingest cycles, like
    vocab_refresh."""
    from urban_mobility_data_pipeline_spark.extensions.dedup_index import (
        refresh_dedup_index,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    root = args.corpus or os.path.join(args.lake, "corpus")
    corpus = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not corpus.exists():
        raise SystemExit("dedup_index_refresh: no corpus at " + root)
    index = MergeTable(
        lake.spark,
        os.path.join(root, "dedup_index"),
        bucket_keys=["doc_id"],
        num_buckets=32,
    )
    cursor = VersionCursor(
        lake.spark, os.path.join(root, "dedup_index_cursor")
    )
    sizes = MergeTable(
        lake.spark, os.path.join(root, "dedup_index_sizes")
    )
    n = refresh_dedup_index(corpus, index, cursor, sizes=sizes)
    return f"dedup index refresh: folded {n} changed docs"


def _corpus_index_job(lake: J.Lakehouse, args) -> str:
    """Maintain the file-skipping sidecars over the corpus tables:
    per-file bloom filters on every registered id column (the GDPR
    point-erase fast path) plus zone maps on the same columns. Both are
    incremental — immutable data files mean only files missing an entry
    are touched — so this runs cheaply after every ingest cycle."""
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        CORPUS_ID_COLS,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    root = args.corpus or os.path.join(args.lake, "corpus")
    built: dict[str, int] = {}
    for name, cols in CORPUS_ID_COLS.items():
        t = MergeTable(lake.spark, os.path.join(root, name))
        if not t.exists():
            continue
        n_files = 0
        for c in cols:
            n_files = len(t.build_blooms(c, fpp=args.bloom_fpp))
        t.analyze(list(cols))
        built[name] = n_files
    if not built:
        raise SystemExit("corpus_index_build: no corpus tables at " + root)
    return f"corpus indexes built (blooms + zone maps): {built}"


def _explain_job(lake: J.Lakehouse, args) -> str:
    """Print the formatted physical plan of any catalog query — the
    plan-audit loop (pushdown reached the scan? join broadcast? python
    in the hot path?) as a first-class command:

        python -m ..._spark.run explain --query pricing_summary
    """
    from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES

    if not args.query:
        raise SystemExit(
            "explain requires --query NAME; names: "
            + " ".join(sorted(QUERIES)[:8])
            + " ... (see plans/catalog.py)"
        )
    if args.query not in QUERIES:
        raise SystemExit(f"unknown query {args.query!r}")
    sf_dir = args.sf_dir or "/root/testdata/sf0.001"
    df = QUERIES[args.query](lake.spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        lake.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            args.explain_mode
        )
    )


def _corpus_maintenance_job(lake: J.Lakehouse, args) -> str:
    """One-pass corpus housekeeping — the nightly job an operator
    schedules after ingest cycles: auto-compact every corpus table
    past the small-file threshold, refresh the maintained indexes
    (vocabulary + LSH dedup index) from the txn log, top up the
    bloom/zone-map sidecars, and vacuum dereferenced files outside
    the retention window. Every step is incremental/no-op-cheap, so
    running it often is safe."""
    from urban_mobility_data_pipeline_spark.extensions.dedup_index import (
        refresh_dedup_index,
    )
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        CORPUS_ID_COLS,
    )
    from urban_mobility_data_pipeline_spark.extensions.vocab import (
        refresh_vocabulary,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    root = args.corpus or os.path.join(args.lake, "corpus")
    corpus = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not corpus.exists():
        raise SystemExit("corpus_maintenance: no corpus at " + root)
    report: list[str] = []
    compacted = 0
    for name in CORPUS_ID_COLS:
        t = MergeTable(lake.spark, os.path.join(root, name))
        if t.exists() and t.auto_compact(max_files=64):
            compacted += 1
    report.append(f"compacted {compacted} tables")
    vocab = MergeTable(
        lake.spark, os.path.join(root, "vocab"),
        bucket_keys=["token"], num_buckets=32,
    )
    n_vocab = refresh_vocabulary(
        corpus, vocab, VersionCursor(
            lake.spark, os.path.join(root, "vocab_cursor")
        )
    )
    report.append(f"vocab folded {n_vocab} docs")
    index = MergeTable(
        lake.spark, os.path.join(root, "dedup_index"),
        bucket_keys=["doc_id"], num_buckets=32,
    )
    n_idx = refresh_dedup_index(
        corpus, index, VersionCursor(
            lake.spark, os.path.join(root, "dedup_index_cursor")
        ),
        sizes=MergeTable(
            lake.spark, os.path.join(root, "dedup_index_sizes")
        ),
    )
    report.append(f"dedup index folded {n_idx} docs")
    from urban_mobility_data_pipeline_spark.extensions.classifier_model import (
        refresh_quality_classifier,
    )
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        _LOGREG_FEATURE_COLS,
    )

    rq = refresh_quality_classifier(
        corpus,
        os.path.join(root, "quality_model"),
        MergeTable(lake.spark, os.path.join(root, "quality_clf_hist")),
        VersionCursor(
            lake.spark, os.path.join(root, "quality_clf_cursor")
        ),
        _quality_feature_frame,
        _LOGREG_FEATURE_COLS,
    )
    report.append(
        f"quality model psi {rq['psi']}"
        + (" RETRAINED" if rq["retrained"] else " kept")
    )
    # vector side (r12): fold the maintained IVF index when the
    # embeddings table and the quantizer artifact exist — erasures and
    # out-of-band commits land here even if no embedding_ingest cycle
    # runs tonight; compaction/blooms/vacuum below already reach the
    # emb tables through CORPUS_ID_COLS
    from urban_mobility_data_pipeline_spark.extensions.classifier import (
        artifact_exists,
    )

    emb = MergeTable(lake.spark, os.path.join(root, "embeddings"))
    qdir = os.path.join(root, "quantizer")
    if emb.exists() and artifact_exists(qdir):
        from urban_mobility_data_pipeline_spark.extensions.similarity import (
            refresh_ivf_index,
        )

        n_emb = refresh_ivf_index(
            emb,
            MergeTable(lake.spark, os.path.join(root, "emb_index")),
            lake.spark.read.parquet(qdir),
            VersionCursor(
                lake.spark, os.path.join(root, "emb_index_cursor")
            ),
        )
        report.append(f"emb index folded {n_emb} vectors")
    n_blooms = 0
    for name, cols in CORPUS_ID_COLS.items():
        t = MergeTable(lake.spark, os.path.join(root, name))
        if not t.exists():
            continue
        for c in cols:
            t.build_blooms(c, fpp=args.bloom_fpp)
            n_blooms += 1
        t.analyze(list(cols))
    report.append(f"sidecars refreshed ({n_blooms} bloom cols)")
    vacuumed = 0
    for name in CORPUS_ID_COLS:
        t = MergeTable(lake.spark, os.path.join(root, name))
        if t.exists():
            vacuumed += t.vacuum(retain_hours=args.retain_hours)
    report.append(f"vacuumed {vacuumed} files")
    return "corpus maintenance: " + "; ".join(report)


def _optimize_job(lake: J.Lakehouse, args) -> str:
    """Delta OPTIMIZE [ZORDER BY] as a first-class command: compact any
    MergeTable's small files, optionally clustering output files by a
    sort key (row-group skipping) or a multi-column Z-ORDER
    (file-level hyper-box skipping on every listed column)."""
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    if not args.table:
        raise SystemExit("optimize requires --table PATH")
    t = MergeTable(lake.spark, args.table)
    if not t.exists():
        raise SystemExit(f"optimize: no table at {args.table}")
    before = len(t.live_files())
    zorder = [c for c in (args.zorder or "").split(",") if c]
    sort = [c for c in (args.sort or "").split(",") if c]
    t.compact(
        target_partitions=args.target_files,
        zorder_by=zorder,
        sort_by=sort,
    )
    after = len(t.live_files())
    how = (
        f"zorder by {zorder}" if zorder
        else (f"sorted by {sort}" if sort else "bin-packed")
    )
    return f"optimized {args.table}: {before} -> {after} files ({how})"


def _profile_job(lake: J.Lakehouse, args) -> str:
    """Profile a table in one aggregate pass (null counts, distinct
    cardinalities, min/max per column — operators/profiling.py):

        python -m ..._spark.run profile --source /path/to/table

    ``--source-format`` picks the reader (parquet default);
    ``--approx-distinct`` swaps exact countDistinct for HLL partials —
    the large-table mode that drops the Expand from the plan."""
    from urban_mobility_data_pipeline_spark.operators import profiling

    if not args.source:
        raise SystemExit("profile requires --source PATH")
    df = lake.spark.read.format(args.source_format).load(args.source)
    cols = profiling.infer_columns(df)
    if not cols:
        raise SystemExit("profile: no atomic columns to profile")
    prof = profiling.profile(
        df, cols, exact_distinct=not args.approx_distinct
    )
    lines = []
    for r in prof.collect():
        mn = r["min_num"] if r["min_num"] is not None else r["min_str"]
        mx = r["max_num"] if r["max_num"] is not None else r["max_str"]
        lines.append(
            f"{r['col_name']}: rows={r['n_rows']} nulls={r['n_nulls']} "
            f"distinct={r['n_distinct']} min={mn} max={mx}"
        )
    return "\n".join(lines)


def _retention_job(lake: J.Lakehouse, args) -> str:
    J.run_retention(
        lake, bronze_days=args.bronze_days, silver_days=args.silver_days
    )
    return (
        f"retention applied (bronze>{args.bronze_days}d, "
        f"closed silver>{args.silver_days}d)"
    )


def _control_tables_job(lake: J.Lakehouse, args) -> str:
    """Migration 000 analogue (reference
    migrations/000_create_control_tables.py): materialize the control
    stores so first-run jobs find them."""
    lake.control._ensure()
    lake.cursor._ensure()
    return "control tables ready (etl_control, etl_cursor)"


def build_registry() -> dict:
    registry: dict = {}
    for name, cfg in C.ALL_TABLES.items():
        registry[f"{name}_bronze"] = _bronze_job(cfg)
        registry[f"{name}_silver"] = _silver_job(cfg, cdf=False)
        registry[f"{name}_silver_cdf"] = _silver_job(cfg, cdf=True)
    registry.update(_gold_jobs())
    registry["gdpr_propagate_erasure"] = _gdpr_job
    registry["corpus_erase"] = _corpus_erase_job
    registry["corpus_ingest"] = _corpus_ingest_job
    registry["embedding_ingest"] = _embedding_ingest_job
    registry["vocab_refresh"] = _vocab_refresh_job
    registry["dsir_model_refresh"] = _dsir_model_refresh_job
    registry["quality_model_refresh"] = _quality_model_refresh_job
    registry["quality_scores_refresh"] = _quality_scores_refresh_job
    registry["dataset_card"] = _dataset_card_job
    registry["corpus_report"] = _corpus_report_job
    registry["drift_refresh"] = _drift_refresh_job
    registry["corpus_replicate"] = _corpus_replicate_job
    registry["corpus_index_build"] = _corpus_index_job
    registry["dedup_index_refresh"] = _dedup_index_job
    registry["optimize"] = _optimize_job
    registry["corpus_maintenance"] = _corpus_maintenance_job
    registry["explain"] = _explain_job
    registry["profile"] = _profile_job
    registry["retention_cleanup"] = _retention_job
    registry["create_control_tables"] = _control_tables_job
    return registry


def _corpus_report_job(lake: J.Lakehouse, args) -> str:
    """Per-language corpus health report served through the
    version-keyed result cache (extensions/result_cache.py):

        python -m ..._spark.run corpus_report --corpus /path/corpus

    First run computes and materializes the per-language rollup; re-runs
    on an UNCHANGED corpus serve the parquet back without touching the
    documents table (the cache key is the corpus txn version, so any
    ingest/erase/compaction invalidates exactly)."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.result_cache import (
        ResultCache,
    )
    from urban_mobility_data_pipeline_spark.functions import text as T
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    root = args.corpus or os.path.join(args.lake, "corpus")
    corpus = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not corpus.exists():
        raise SystemExit("corpus_report: no corpus at " + root)
    cache = ResultCache(lake.spark, os.path.join(root, "_result_cache"))

    def compute():
        docs = corpus.read()
        return docs.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(T.words("text"))).alias("n_tokens"),
            F.round(
                1.0 - F.countDistinct(F.md5("text")) / F.count(F.lit(1)), 6
            ).alias("exact_dup_rate"),
            F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
        )

    result = cache.get_or_compute("per_source_report", [corpus], compute)
    lines = [
        f"{r['lang']}: docs={r['n_docs']} tokens={r['n_tokens']} "
        f"dup_rate={r['exact_dup_rate']} avg_chars={r['avg_chars']}"
        for r in sorted(result.collect(), key=lambda r: r["lang"])
    ]
    served = "cache_hit" if cache.hits else "computed"
    return f"corpus report v{corpus.detail()['version']} ({served})\n" + "\n".join(lines)


def _drift_refresh_job(lake: J.Lakehouse, args) -> str:
    """Maintain the corpus drift histogram O(changed) and print the
    per-language PSI report:

        python -m ..._spark.run drift_refresh --corpus /path/corpus

    First run bootstraps the (lang, octave) histogram MergeTable; later
    runs fold only the docs committed since the cursor (change feed +
    time travel), then report PSI off the histogram — the corpus is
    never rescanned for monitoring."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.drift_model import (
        current_histogram,
        psi_from_counts,
        refresh_drift_hist,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    root = args.corpus or os.path.join(args.lake, "corpus")
    corpus = MergeTable(lake.spark, os.path.join(root, "documents"))
    if not corpus.exists():
        raise SystemExit("drift_refresh: no corpus at " + root)
    hist = MergeTable(lake.spark, os.path.join(root, "drift_hist"))
    cursor = VersionCursor(lake.spark, os.path.join(root, "_drift_cursor"))
    n = refresh_drift_hist(
        corpus, hist, cursor, group_col="lang", size_col=F.length("text")
    )
    rows = sorted(
        psi_from_counts(current_histogram(hist)).collect(),
        key=lambda r: r["source"],
    )
    report = "\n".join(
        f"{r['source']}: n={r['n_docs']} psi={r['psi']} {r['drift_tier']}"
        for r in rows
    )
    return f"drift histogram folded {n} changed docs\n" + report


def main(argv: list[str] | None = None, spark=None) -> int:
    """``spark=None`` (the CLI path) builds and owns a session; an
    injected session (tests, notebooks) is left running."""
    registry = build_registry()
    p = argparse.ArgumentParser(
        prog="python -m urban_mobility_data_pipeline_spark.run",
        description=__doc__.split("\n\n")[0],
    )
    p.add_argument("job", nargs="?", help="job name (see --list)")
    p.add_argument("--lake", default=os.environ.get("UMDP_LAKE", "./lake"))
    p.add_argument("--source", help="input path for *_bronze / gdpr jobs")
    p.add_argument("--source-format", default="parquet")
    p.add_argument("--requests", help="erasure requests path (gdpr)")
    p.add_argument("--salt", help="fingerprint salt (gdpr)")
    p.add_argument("--ids", help="comma-separated doc ids (corpus_erase)")
    p.add_argument("--corpus", help="corpus tables root (corpus_erase/_ingest)")
    p.add_argument("--feed-format", default="jsonl", choices=["jsonl", "csv", "text"])
    p.add_argument(
        "--bloom-fpp", type=float, default=0.01,
        help="bloom false-positive rate (corpus_index_build)",
    )
    p.add_argument("--table", help="MergeTable path (optimize)")
    p.add_argument(
        "--retain-hours", type=float, default=168.0,
        help="vacuum retention window (corpus_maintenance); default 7d",
    )
    p.add_argument("--query", help="catalog query name (explain)")
    p.add_argument("--sf-dir", help="testdata dir (explain)")
    p.add_argument(
        "--explain-mode", default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
    )
    p.add_argument(
        "--approx-distinct", action="store_true",
        help="profile: HLL distinct counts instead of exact",
    )
    p.add_argument("--zorder", help="comma-separated Z-ORDER columns (optimize)")
    p.add_argument("--sort", help="comma-separated sort columns (optimize)")
    p.add_argument(
        "--target-files", type=int, default=None,
        help="output file target (optimize); default = live files / 8",
    )
    p.add_argument("--no-vacuum", action="store_true")
    p.add_argument("--bronze-days", type=int, default=30)
    p.add_argument("--silver-days", type=int, default=365)
    p.add_argument("--master", default=os.environ.get("UMDP_MASTER", "local[*]"))
    p.add_argument("--list", action="store_true", help="list jobs and exit")
    args = p.parse_args(argv)

    if args.list or not args.job:
        for name in sorted(registry):
            print(name)
        return 0
    if args.job not in registry:
        print(f"unknown job {args.job!r}; --list shows all", file=sys.stderr)
        return 2

    owns_session = spark is None
    if owns_session:
        from urban_mobility_data_pipeline_spark.session import get_spark

        spark = get_spark(app_name=f"umdp-{args.job}", master=args.master)
    try:
        print(registry[args.job](J.Lakehouse(spark, args.lake), args))
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
