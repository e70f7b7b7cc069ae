"""Scale-curvature proof (VERDICT r7 item 3): measure the 25 most
expensive catalog queries at sf0.1 AND sf1 and report each query's
empirical scaling exponent.

Every scale claim so far was measured at one size; two points a decade
apart expose the curvature: ``exponent = log10(wall_sf1 / wall_sf0.1)``
is ~0 for overhead-dominated queries, ~1 for linear scans/aggregations,
and anything well above 1 means a plan whose cost grows faster than its
input — the thing that kills a 100 TB run.

sf1 data: the driver testdata is read-only and capped at sf0.1, so sf1
(~6M lineitem) is DERIVED from sf0.1, 10 FK-consistent replicas with
per-table key offsets:

- TPC-H tables + events: keys shift by ``replica × keyspace``
  (customer 15k, orders 150k, part 20k, supplier 1k, users 1.5k,
  events 100k). Dates/attributes repeat per replica — exactly TPC-H's
  own behavior, where a bigger SF packs more orders into the same date
  range.
- documents: replica 0 keeps the original text; replicas 1-9 carry a
  DETERMINISTIC word permutation (xxhash64-keyed sort of the word
  array, seeded by replica and doc_id). Length, vocabulary and unigram
  statistics are preserved, but shingle sets diverge — without this,
  every doc would have 9 near-identical twins and the LSH/dedup pair
  queries would measure a 45×-pair data artifact instead of plan
  curvature. The corpus's own exact-dup rate carries over within each
  replica (identical originals permute identically).
- embeddings: replica 0 keeps the originals; the other 9 are fresh
  draws from per-label gaussians FIT to the originals (mean/std per
  label per dimension, numpy seed 42), preserving the cluster
  structure ANN/kmeans queries key on while avoiding 10 exact copies
  of every vector (which would blow up semantic-dedup pairs the same
  way).

Usage: python bench_scaling.py [--regen]  (data cached in _scratch/sf1)
Emits one JSON line: {"metric": "bench_scaling", "queries": {...}}.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_scratch", "sf1")
REPS = 10

#: the 25 most expensive catalog queries by BENCH_LOCAL_r07 wall time
#: (frozen so the measurement is comparable across rounds)
TOP_QUERIES = [
    "streaming_purchase_attribution",
    "trade_network_pagerank",
    "documents_fuzzy_dedup_keep_best",
    "documents_fuzzy_dedup_corpus",
    "embedding_dedup_corpus",
    "doc_dup_clusters",
    "embedding_semantic_dedup",
    "streaming_dsir_gate",
    "documents_bpe_token_counts",
    "embedding_kmeans_cells",
    "cross_modal_dedup_agreement",
    "doc_bm25_topk_indexed",
    "embedding_ivfpq_topk",
    "corpus_bpe_merges",
    "corpus_dsir_sample",
    "documents_contamination_report",
    "documents_dedup_ngram_scrub",
    "corpus_dedup_rate_by_source",
    "doc_edit_similarity_pairs",
    "doc_retrieval_eval_mrr",
    "doc_simhash_near_dup_pairs",
    "documents_fold_leakage",
    "embedding_semantic_dedup_ingest",
    "doc_near_dup_pairs",
    "embedding_pq_topk",
    # r9 additions: the self-bounding variants of the two measured
    # super-linear families (VERDICT r8 item 1 done-criteria) — their
    # exponents are compared against the fixed-k / uncapped originals
    "embedding_semantic_dedup_adaptive",
    "doc_near_dup_pairs_capped",
    # r10 additions (VERDICT r9 item 2): the capped COMPOSED end
    # products — the jobs a real corpus dedup actually runs — measured
    # against their uncapped originals
    "documents_fuzzy_dedup_corpus_capped",
    "documents_fuzzy_dedup_keep_best_capped",
    # r12 additions: the modern composed manifest (model gate + capped
    # fuzzy dedup + packing, VERDICT r11 #1) measured against the r5
    # heuristics-only original
    "corpus_training_manifest",
    "corpus_training_manifest_v2",
]

#: per-query exponent bound: 1.3 covers linear + n·log(n) + measured
#: noise at these wall times; pair/graph pipelines whose candidate sets
#: legitimately grow with corpus density get an explicit higher bound.
DEFAULT_BOUND = 1.3
EXPONENT_BOUNDS = {
    # LSH pair pipelines: pairs per bucket grow with bucket occupancy,
    # O(Σ bucket²) by design — bounded, but superlinear in row count
    # when density rises within a fixed band space.
    "documents_fuzzy_dedup_keep_best": 1.6,
    "documents_fuzzy_dedup_corpus": 1.6,
    "doc_dup_clusters": 1.6,
    "doc_near_dup_pairs": 1.6,
    "doc_simhash_near_dup_pairs": 1.6,
    "embedding_dedup_corpus": 1.6,
    "embedding_semantic_dedup": 1.6,
    "cross_modal_dedup_agreement": 1.6,
    "doc_edit_similarity_pairs": 1.6,
    # iterative: rounds × per-round cost; per-round is linear but round
    # count can shift with data
    "trade_network_pagerank": 1.6,
    # batch self-retrieval scores |queries| × |matching docs|; the
    # testdata's 17-word vocabulary makes EVERY doc match every query,
    # so both factors grow with N here (real Zipfian text keeps the
    # match set a small corpus fraction) — the pair-pipeline bound
    # applies, not the linear one
    "doc_retrieval_eval_mrr": 1.6,
    # adaptive-k SemDeDup: sampled training is O(N), the one full
    # assignment is N·k ~ N^1.5 in flops but constant-dominated at
    # these sizes — measured 0.92 post-optimization (r9); 1.1 is the
    # regression tripwire, not the theoretical asymptote
    "embedding_semantic_dedup_adaptive": 1.1,
    "doc_near_dup_pairs_capped": 1.3,
    # capped composed end products: candidate join is cap-bounded, the
    # residual growth is connected-components rounds over fewer pairs
    "documents_fuzzy_dedup_corpus_capped": 1.3,
    "documents_fuzzy_dedup_keep_best_capped": 1.3,
    # manifest v2 composes the capped path + the model gate (training
    # reads the shared train-once artifact, so only scoring scales);
    # same cap-bounded budget as the capped composed rows
    "corpus_training_manifest_v2": 1.3,
}


def _replicate(df: DataFrame, offsets: dict[str, int]) -> DataFrame:
    out = None
    for i in range(REPS):
        p = df
        for c, space in offsets.items():
            p = p.withColumn(c, (F.col(c) + F.lit(i * space)).cast("long"))
        out = p if out is None else out.unionByName(p)
    return out


def _permuted_documents(docs: DataFrame) -> DataFrame:
    out = None
    for i in range(REPS):
        p = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * 5000)).cast("long")
        )
        if i > 0:
            ws = F.split(F.col("text"), " ")
            # seeded by (word, position, replica) but NOT doc_id:
            # identical texts permute identically within a replica, so
            # the corpus's exact-dup rate carries over 10× instead of
            # collapsing to replica 0's pairs
            keyed = F.transform(
                ws,
                lambda w, pos: F.struct(
                    F.xxhash64(w, pos, F.lit(i)).alias("h"),
                    w.alias("w"),
                ),
            )
            newtext = F.array_join(
                F.transform(F.array_sort(keyed), lambda s: s["w"]), " "
            )
            p = p.withColumn("text", newtext).withColumn(
                "n_chars", F.length("text").cast("long")
            )
        out = p if out is None else out.unionByName(p)
    return out


def _refit_embeddings(spark: SparkSession, src_path: str) -> DataFrame:
    import numpy as np

    pdf = spark.read.parquet(src_path).toPandas()
    rng = np.random.RandomState(42)
    rows = list(
        zip(
            pdf["vec_id"].astype(int),
            [[float(x) for x in v] for v in pdf["embedding"]],
            pdf["label"].astype(int),
        )
    )
    base_n = len(pdf)
    by_label: dict[int, list] = {}
    for _vid, vec, lab in rows:
        by_label.setdefault(lab, []).append(vec)
    stats = {
        lab: (
            np.mean(np.array(vs), axis=0),
            np.std(np.array(vs), axis=0) + 1e-6,
        )
        for lab, vs in by_label.items()
    }
    out = list(rows)
    next_id = base_n
    for _rep in range(1, REPS):
        for lab, vs in sorted(by_label.items()):
            mu, sd = stats[lab]
            draws = rng.normal(mu, sd, size=(len(vs), len(mu)))
            for d in draws:
                out.append(
                    (next_id, [float(x) for x in d.astype(np.float32)], lab)
                )
                next_id += 1
    return spark.createDataFrame(
        out, "vec_id long, embedding array<float>, label int"
    )


def ensure_sf1(spark: SparkSession, regen: bool = False) -> str:
    marker = os.path.join(DST, "_COMPLETE")
    if os.path.isfile(marker) and not regen:
        return DST
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    rd = lambda n: spark.read.parquet(f"{SRC}/{n}.parquet")  # noqa: E731

    def wr(df: DataFrame, n: str, parts: int) -> None:
        # the driver's testdata ships each table as ONE parquet FILE
        # (not a directory); match that layout exactly — the streaming
        # sources glob on the literal file name, and single large files
        # still split by row group on read
        tmp = f"{DST}/_tmp_{n}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.replace(os.path.join(tmp, part), f"{DST}/{n}.parquet")
        shutil.rmtree(tmp, ignore_errors=True)

    for n in ("region", "nation"):
        wr(rd(n), n, 1)
    wr(_replicate(rd("customer"), {"c_custkey": 15_000}), "customer", 4)
    wr(_replicate(rd("supplier"), {"s_suppkey": 1_000}), "supplier", 1)
    wr(_replicate(rd("part"), {"p_partkey": 20_000}), "part", 4)
    wr(
        _replicate(
            rd("orders"), {"o_orderkey": 150_000, "o_custkey": 15_000}
        ),
        "orders",
        8,
    )
    wr(
        _replicate(
            rd("lineitem"),
            {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
        ),
        "lineitem",
        16,
    )
    wr(
        _replicate(rd("events"), {"event_id": 100_000, "user_id": 1_500}),
        "events",
        8,
    )
    wr(_permuted_documents(rd("documents")), "documents", 8)
    wr(_refit_embeddings(spark, f"{SRC}/embeddings.parquet"), "embeddings", 8)
    with open(marker, "w") as f:
        f.write("ok")
    return DST


# ---------------------------------------------------------------------------
# Zipfian corpus (VERDICT r8 item 4): the driver's 17-word vocabulary
# saturates every lexical bucket ~100× faster than web text, so the
# pair-pipeline exponents above are upper bounds measured under
# unrealistic density. This section re-measures them on a corpus with
# REALISTIC lexical statistics: 20k-word vocabulary, ranks drawn
# log-uniformly (rank = floor(exp(U·lnV)) gives P(rank=r) ∝ 1/r —
# Zipf s=1, the empirical law for natural text), deterministic via
# xxhash64 so both scales regenerate bit-identically. 2% exact
# duplicates and 2% one-word-perturbed near-duplicates are injected so
# the dedup pipelines have true positives to find, as in a real crawl.
# ---------------------------------------------------------------------------
ZIPF_V = 20_000
ZIPF_DOCS_SMALL = 5_000  # matches sf0.1's documents row count
ZIPF_DST = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_scratch"
)

#: the text-pair pipelines whose exponents the synthetic vocab inflates
ZIPF_QUERIES = [
    "doc_near_dup_pairs",
    "doc_near_dup_pairs_capped",
    "doc_simhash_near_dup_pairs",
    "doc_simhash_capped_pairs",
    "documents_fuzzy_dedup_keep_best",
    "documents_fuzzy_dedup_corpus_capped",
    "documents_fuzzy_dedup_keep_best_capped",
    "doc_edit_similarity_pairs",
    "doc_edit_similarity_pairs_capped",
    "doc_retrieval_eval_mrr",
    "doc_containment_pairs",
]


def _zipf_documents(spark: SparkSession, n_docs: int) -> DataFrame:
    """Deterministic Zipf-text documents table, pure Catalyst (no UDF,
    no driver loop) — generating 100× more would be the same one-stage
    map job."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # dup injection: every 50th doc copies its predecessor verbatim,
    # the next one copies with a one-word perturbation
    seed = (
        F.when(F.col("doc_id") % 50 == 1, F.col("doc_id") - 1)
        .when(F.col("doc_id") % 50 == 2, F.col("doc_id") - 2)
        .otherwise(F.col("doc_id"))
    )
    df = base.withColumn("__seed", seed)
    length = (F.pmod(F.xxhash64(F.col("__seed"), F.lit("len")), F.lit(50)) + 30).cast("int")
    u = lambda i: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("__seed"), i), F.lit(1_000_003))
        / F.lit(1_000_003.0)
    )
    rank = lambda i: F.greatest(  # noqa: E731
        F.lit(1),
        F.floor(F.exp(u(i) * F.lit(math.log(float(ZIPF_V))))).cast("int"),
    )
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.concat(F.lit("w"), rank(i).cast("string")),
    )
    words = F.when(
        F.col("doc_id") % 50 == 2,
        F.concat(words, F.array(F.lit("wperturb"))),
    ).otherwise(words)
    h = F.xxhash64(F.col("__seed"), F.lit("meta"))
    return df.select(
        "doc_id",
        F.array_join(words, " ").alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "it")]),
            (F.pmod(h, F.lit(5)) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src_"), F.pmod(h, F.lit(20)).cast("string")).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))


def ensure_zipf(spark: SparkSession, regen: bool = False) -> tuple[str, str]:
    dirs = []
    for tag, n_docs in (("zipf_small", ZIPF_DOCS_SMALL),
                        ("zipf_big", ZIPF_DOCS_SMALL * REPS)):
        dst = os.path.join(ZIPF_DST, tag)
        marker = os.path.join(dst, "_COMPLETE")
        dirs.append(dst)
        if os.path.isfile(marker) and not regen:
            continue
        shutil.rmtree(dst, ignore_errors=True)
        os.makedirs(dst, exist_ok=True)
        # documents is directory-shaped here on purpose — the loaders
        # are layout-agnostic (tests/test_layout_agnostic.py) and this
        # is what a distributed writer produces
        _zipf_documents(spark, n_docs).repartition(8).write.parquet(
            os.path.join(dst, "documents.parquet")
        )
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
        with open(marker, "w") as f:
            f.write("ok")
    return dirs[0], dirs[1]


def run_zipf(spark: SparkSession, regen: bool) -> dict:
    from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES

    small, big = ensure_zipf(spark, regen=regen)
    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name in ZIPF_QUERIES:
        fn = QUERIES[name]
        fn(spark, small).write.format("noop").mode("overwrite").save()

        def run(sf_dir: str) -> float:
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            return best

        t_small = run(small)
        t_big = run(big)
        exponent = math.log10(max(t_big, 1e-3) / max(t_small, 1e-3))
        bound = EXPONENT_BOUNDS.get(name, DEFAULT_BOUND)
        ok = exponent <= bound
        if not ok:
            flagged.append(name)
        results[name] = {
            "t_small": round(t_small, 2),
            "t_big": round(t_big, 2),
            "ratio": round(t_big / max(t_small, 1e-3), 2),
            "exponent": round(exponent, 3),
            "bound": bound,
            "ok": ok,
        }
        print(
            f"  zipf {name}: {t_small:.2f}s -> {t_big:.2f}s "
            f"(exp {exponent:.2f}, bound {bound})",
            file=sys.stderr,
        )
    return {
        "metric": "bench_scaling_zipf",
        "vocab": ZIPF_V,
        "docs_small": ZIPF_DOCS_SMALL,
        "docs_big": ZIPF_DOCS_SMALL * REPS,
        "queries": results,
        "flagged_superlinear": flagged,
    }


# ---------------------------------------------------------------------------
# Zipf-clustered EMBEDDING corpus (VERDICT r9 item 4): the sf1 refit
# vectors are a gaussian blob whose uniform cell density flatters every
# probe; real embedding corpora are mixtures with heavily skewed
# cluster occupancy (boilerplate/templated content). This generates a
# deterministic mixture — EMB_C cluster directions, cluster membership
# drawn log-uniform (Zipf-ish pmf: the top cluster holds ~1/ln(C) ≈
# 20-25%% of the corpus), point = center + id-keyed jitter — at two
# scales, and re-measures the embedding decade's exponents under
# skewed cell occupancy, the regime where per-cell caps / nprobe are
# actually stressed. Pure Catalyst generation (no UDF, no driver loop).
# ---------------------------------------------------------------------------
EMB_DIM = 64
EMB_C = 32  # true mixture components
EMB_SMALL = 10_000
EMB_REPS = 4  # big = 4x small -> exponent in log4, same as t4x corpus

EMB_ZIPF_QUERIES = [
    "embedding_semantic_dedup_adaptive",
    "embedding_semantic_dedup_ingest",
    # the mitigation twin (now an oracle-backed catalog row): same
    # split/index/probe, quantizer trained at k=ceil(sqrt(cN)) — the
    # artifact carries the diagnosis AND the fix side by side
    "embedding_semantic_dedup_ingest_adaptive",
    "embedding_ivf_topk_indexed",
    "embedding_bq_hamming_topk",
]

#: log4(t_big/t_small) tripwires under skewed occupancy — measured r10
#: (see BENCH_SCALING.md) plus margin; NOT theoretical asymptotes
EMB_EXPONENT_BOUNDS = {
    # adaptive k grows sqrt(N) but a dense true cluster keeps its cells
    # denser than uniform; pair probe inside the dense region dominates
    "embedding_semantic_dedup_adaptive": 1.45,
    # nprobe=2 probe against per-label cells; the hot cell holds ~25%
    "embedding_semantic_dedup_ingest": 1.3,
    # index build is O(N); probe reads 3 cells incl. possibly the hot one
    "embedding_ivf_topk_indexed": 1.3,
    # linear Hamming scan + O(candidates) rerank
    "embedding_bq_hamming_topk": 1.3,
    # adaptive-quantizer ingest: training O(N) on the residue sample,
    # one N*k assignment, probe cells bounded by k growth
    "embedding_semantic_dedup_ingest_adaptive": 1.3,
    # per-label probe with the cell cap: hot cells skipped+reported,
    # residual work is unsaturated cells (linear) + the sizing pass
    "embedding_semantic_dedup_ingest_cellcapped": 1.3,
}


def _mixture_embeddings(spark: SparkSession, n: int) -> DataFrame:
    u = (
        F.pmod(F.xxhash64(F.col("vec_id"), F.lit("cl")), F.lit(1_000_003))
        / F.lit(1_000_003.0)
    )
    # log-uniform rank draw over 1..C  ->  Zipf-skewed cluster sizes
    cluster = (
        F.floor(F.exp(u * F.lit(math.log(float(EMB_C))))) - 1
    ).cast("int")
    base = spark.range(n).select(F.col("id").alias("vec_id")).withColumn(
        "label", cluster
    )
    # center component d: deterministic +-1 pattern per (cluster, d),
    # scaled so clusters are well separated relative to jitter
    center = lambda i: (  # noqa: E731
        F.when(
            F.pmod(F.xxhash64(F.col("label"), i, F.lit("c")), F.lit(2)) == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
    )
    jitter = lambda i: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit("j")), F.lit(997))
        .cast("double")
        / 997.0
        - 0.5
    )
    return base.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(1), F.lit(EMB_DIM)),
            lambda i: (center(i) + jitter(i) * 0.6).cast("float"),
        ).alias("embedding"),
        "label",
    )


def ensure_emb_zipf(
    spark: SparkSession, regen: bool = False
) -> tuple[str, str]:
    dirs = []
    for tag, n in (("emb_zipf_small", EMB_SMALL),
                   ("emb_zipf_big", EMB_SMALL * EMB_REPS)):
        dst = os.path.join(ZIPF_DST, tag)
        marker = os.path.join(dst, "_COMPLETE")
        dirs.append(dst)
        if os.path.isfile(marker) and not regen:
            continue
        shutil.rmtree(dst, ignore_errors=True)
        os.makedirs(dst, exist_ok=True)
        _mixture_embeddings(spark, n).repartition(8).write.parquet(
            os.path.join(dst, "embeddings.parquet")
        )
        open(marker, "w").close()
    return dirs[0], dirs[1]


def _ingest_per_label_capped(spark: SparkSession, sf_dir: str):
    """The per-label ingest probe with the r10 cell cap: hot cells
    (occupancy > cap) are dropped from the verify join and REPORTED —
    the mitigation for when the quantizer is not yours to retrain.
    Returns the pairs frame (the skipped report is counted but the
    noop sink measures the pair path, matching the other rows)."""
    import tempfile

    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        build_ivf_index,
        incremental_semantic_dups_with_report,
        ivf_centroids,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id", "embedding"
    )
    cents = ivf_centroids(corpus).select(
        "cell",
        F.transform("centroid", lambda x: F.round(x, 6)).alias("centroid"),
    )
    index = MergeTable(spark, tempfile.mkdtemp(prefix="umdp_semcap_"))
    build_ivf_index(corpus, cents, index)
    pairs, _skipped = incremental_semantic_dups_with_report(
        batch, index, cents, cell_cap=EMB_INGEST_CELL_CAP,
        threshold=0.35, nprobe=2,
    )
    return pairs


#: cell-occupancy cap for the capped per-label runner: sized so the
#: Zipf mixture's hot clusters saturate at BOTH scales (uniform share
#: would be ~3% of corpus; the top log-uniform cluster holds ~20%)
EMB_INGEST_CELL_CAP = 600


def run_emb_zipf(spark: SparkSession, regen: bool) -> dict:
    from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES

    small, big = ensure_emb_zipf(spark, regen=regen)
    # cluster-occupancy profile of the corpus actually measured —
    # committed next to the exponents so "skewed" is a number, not a
    # claim
    occ = (
        spark.read.parquet(os.path.join(big, "embeddings.parquet"))
        .groupBy("label")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    )
    n_big = EMB_SMALL * EMB_REPS
    top_share = round(occ[0]["count"] / n_big, 3)
    results: dict[str, dict] = {}
    flagged: list[str] = []
    runners = {n: QUERIES[n] for n in EMB_ZIPF_QUERIES}
    # second mitigation, for quantizers that are not ours to retrain:
    # the same per-label probe with the r10 cell-occupancy cap
    runners["embedding_semantic_dedup_ingest_cellcapped"] = (
        _ingest_per_label_capped
    )
    for name, fn in runners.items():
        fn(spark, small).write.format("noop").mode("overwrite").save()

        def run(sf_dir: str) -> float:
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            return best

        t_small = run(small)
        t_big = run(big)
        exponent = math.log(max(t_big, 1e-3) / max(t_small, 1e-3)) / math.log(
            EMB_REPS
        )
        bound = EMB_EXPONENT_BOUNDS.get(name, DEFAULT_BOUND)
        ok = exponent <= bound
        if not ok:
            flagged.append(name)
        results[name] = {
            "t_small": round(t_small, 2),
            "t_big": round(t_big, 2),
            "ratio": round(t_big / max(t_small, 1e-3), 2),
            "exponent": round(exponent, 3),
            "bound": bound,
            "ok": ok,
        }
        print(
            f"  emb-zipf {name}: {t_small:.2f}s -> {t_big:.2f}s "
            f"(exp {exponent:.2f}, bound {bound})",
            file=sys.stderr,
        )
    return {
        "metric": "bench_scaling_emb_zipf",
        "dim": EMB_DIM,
        "mixture_components": EMB_C,
        "vectors_small": EMB_SMALL,
        "vectors_big": n_big,
        "top_cluster_share_big": top_share,
        "top5_cluster_counts_big": [r["count"] for r in occ],
        "queries": results,
        "flagged_superlinear": flagged,
    }


def main() -> int:
    regen = "--regen" in sys.argv[1:]
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    from urban_mobility_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="umdp-bench-scaling",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("WARN")
    if "--zipf" in sys.argv[1:]:
        print(json.dumps(run_zipf(spark, regen)))
        spark.stop()
        return 0
    if "--emb-zipf" in sys.argv[1:]:
        print(json.dumps(run_emb_zipf(spark, regen)))
        spark.stop()
        return 0
    sf1 = ensure_sf1(spark, regen=regen)

    from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES

    names = only or TOP_QUERIES
    results: dict[str, dict] = {}
    flagged: list[str] = []
    for name in names:
        fn = QUERIES[name]
        # JIT/scan warmup at the small scale, then best-of-2 per point
        fn(spark, SRC).write.format("noop").mode("overwrite").save()

        def run(sf_dir: str) -> float:
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            return best

        t_small = run(SRC)
        t_big = run(sf1)
        exponent = math.log10(max(t_big, 1e-3) / max(t_small, 1e-3))
        bound = EXPONENT_BOUNDS.get(name, DEFAULT_BOUND)
        ok = exponent <= bound
        if not ok:
            flagged.append(name)
        results[name] = {
            "t_sf01": round(t_small, 2),
            "t_sf1": round(t_big, 2),
            "ratio": round(t_big / max(t_small, 1e-3), 2),
            "exponent": round(exponent, 3),
            "bound": bound,
            "ok": ok,
        }
        print(
            f"  {name}: {t_small:.2f}s -> {t_big:.2f}s "
            f"(exp {exponent:.2f}, bound {bound})",
            file=sys.stderr,
        )
    out = {
        "metric": "bench_scaling",
        "sf_small": 0.1,
        "sf_big": 1.0,
        "reps": REPS,
        "queries": results,
        "flagged_superlinear": flagged,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
