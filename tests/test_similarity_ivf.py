"""IVF similarity search: assignment, pruning, recall vs brute force."""

from __future__ import annotations

from urban_mobility_data_pipeline_spark.extensions.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_centroids,
    ivf_topk,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_assignment_covers_all_vectors(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    assert cents.count() == 10  # one per label
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()  # every vector in exactly one cell
    assert assigned.select("cell").distinct().count() <= 10


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    exact = {r["vec_id"] for r in cosine_topk(emb, 0, k=10).collect()}
    probe_all = {
        r["vec_id"]
        for r in ivf_topk(emb, cents, 0, k=10, nprobe=10).collect()
    }
    assert probe_all == exact  # nprobe = all cells ⇒ exhaustive ⇒ exact
    probe1 = ivf_topk(emb, cents, 0, k=10, nprobe=3).collect()
    assert len(probe1) == 10
    recall = len({r["vec_id"] for r in probe1} & exact) / 10
    assert recall >= 0.3  # pruned search still finds a meaningful fraction


def _recall_curve(spark, emb, query_ids, nprobes, k=10):
    cents = ivf_centroids(emb)
    curve = []
    for np_ in nprobes:
        hits = total = 0
        for qid in query_ids:
            exact = {r["vec_id"] for r in cosine_topk(emb, qid, k=k).collect()}
            got = {
                r["vec_id"]
                for r in ivf_topk(emb, cents, qid, k=k, nprobe=np_).collect()
            }
            hits += len(got & exact)
            total += k
        curve.append(hits / total)
    return curve


def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    """The recall/latency dial (VERDICT r4 item 4): recall@10 averaged
    over 3 queries must be non-decreasing in nprobe and exact at
    nprobe=ncells. The driver fixture's labels carry no cosine-cluster
    structure (vectors are unclustered ⇒ expected recall ≈
    nprobe/ncells), so the ≥0.9 floor lives in the clustered test
    below, where IVF's contract actually applies."""
    emb = _emb(spark, sf_dir)
    curve = _recall_curve(spark, emb, [0, 7, 42], [1, 2, 4, 8, 10])
    assert all(a <= b + 1e-9 for a, b in zip(curve, curve[1:])), curve
    assert curve[-1] == 1.0  # nprobe = all cells ⇒ brute force
    assert curve[2] >= 0.3  # nprobe=4/10 cells ⇒ well above floor


def test_ivf_recall_high_on_clustered_corpus(spark):
    """On a corpus with genuine cluster structure — the workload IVF is
    for — nprobe=1 already recovers the neighborhood and recall@10 is
    ≥0.9 by nprobe=4. Deterministic synthetic: 10 well-separated
    centers, 60 points each, noise ≪ center separation."""
    import numpy as np

    rng = np.random.default_rng(42)
    dim, n_cells, per_cell = 16, 10, 60
    centers = rng.normal(size=(n_cells, dim)) * 10.0
    rows = []
    vec_id = 0
    for cell in range(n_cells):
        for _ in range(per_cell):
            v = centers[cell] + rng.normal(size=dim)
            rows.append((vec_id, [float(x) for x in v], cell))
            vec_id += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    curve = _recall_curve(spark, emb, [0, 61, 305], [1, 2, 4])
    assert all(a <= b + 1e-9 for a, b in zip(curve, curve[1:])), curve
    assert curve[0] >= 0.8, curve  # right cell found at nprobe=1
    assert curve[2] >= 0.9, curve  # ≥0.9 by nprobe=4


def test_indexed_ivf_matches_on_the_fly_and_prunes_cells(spark, sf_dir, tmp_path):
    """VERDICT r5 item 2: the materialized index must (a) return exactly
    what the on-the-fly ``ivf_topk`` returns, (b) lay the table out one
    hive partition per cell, and (c) plan the probe scan with a
    ``PartitionFilters`` entry on cell — file-level pruning, no corpus
    re-assignment per query."""
    import glob

    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
        probe_cells,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    index = MergeTable(spark, str(tmp_path / "ivf_index"))
    build_ivf_index(emb, cents, index)

    # (a) identical results, several queries and nprobes
    for qid, nprobe in [(0, 1), (0, 3), (7, 2), (42, 10)]:
        fly = [tuple(r) for r in ivf_topk(emb, cents, qid, k=10, nprobe=nprobe).collect()]
        idx = [tuple(r) for r in ivf_topk_indexed(index, cents, qid, k=10, nprobe=nprobe).collect()]
        assert idx == fly, (qid, nprobe)

    # (b) one directory per cell: the layout IS the inverted index
    cells = {r.cell for r in index.read().select("cell").distinct().collect()}
    dirs = {
        int(d.rsplit("=", 1)[1])
        for d in glob.glob(str(tmp_path / "ivf_index" / "cell=*"))
    }
    assert dirs == cells

    # (c) the probe read partition-prunes on cell
    q_vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    probed = probe_cells(cents, q_vec, 3)
    assert len(probed) == 3
    cand = index.read().filter(F.col("cell").isin(probed))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]

    # (d) refresh path: re-building on the existing table upserts, not
    # duplicates, and search still matches
    build_ivf_index(emb, cents, index)
    assert index.read().count() == emb.count()
    fly = [tuple(r) for r in ivf_topk(emb, cents, 0, k=10, nprobe=3).collect()]
    idx = [tuple(r) for r in ivf_topk_indexed(index, cents, 0, k=10, nprobe=3).collect()]
    assert idx == fly


def test_kmeans_centroids_train_and_search(spark, sf_dir):
    """The real k-means training path: k cells, deterministic under the
    same seed, and ivf_topk over the trained quantizer reaches the exact
    top-1 at moderate nprobe."""
    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        cosine_topk,
        ivf_topk,
        train_kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_kmeans_centroids(emb, k=8, seed=7)
    assert cents.count() == 8
    again = train_kmeans_centroids(emb, k=8, seed=7)
    a = sorted(map(tuple, (r.centroid for r in cents.collect())))
    b = sorted(map(tuple, (r.centroid for r in again.collect())))
    assert a == b  # same data + seed -> same model

    # nprobe == k cells -> exhaustive: must equal the exact top-k
    exact = [r.vec_id for r in cosine_topk(emb, query_vec_id=3, k=5).collect()]
    full = [
        r.vec_id
        for r in ivf_topk(emb, cents, query_vec_id=3, k=5, nprobe=8).collect()
    ]
    assert full == exact
    # probing fewer cells returns at most k results drawn from the
    # probed cells; exact ranking within the candidate set is already
    # pinned by the exhaustive case and the recall-curve test
    part = [
        r.vec_id
        for r in ivf_topk(emb, cents, query_vec_id=3, k=5, nprobe=2).collect()
    ]
    assert len(part) <= 5 and 3 not in part


def test_refresh_ivf_index_incremental_and_erasure(spark, sf_dir, tmp_path):
    """Cursor-driven IVF maintenance: bootstrap == full build; vector
    updates re-assign only the changed ids; erased vectors leave the
    index; the maintained index equals a from-scratch rebuild."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        ivf_assign,
        ivf_centroids,
        refresh_ivf_index,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    source = MergeTable(spark, str(tmp_path / "emb"))
    source.create(emb)
    index = MergeTable(spark, str(tmp_path / "ivf"))
    cursor = VersionCursor(spark, str(tmp_path / "cur"))

    n0 = refresh_ivf_index(source, index, cents, cursor)
    assert n0 == emb.count()
    assert index.read().count() == emb.count()
    assert refresh_ivf_index(source, index, cents, cursor) == 0

    # move one vector to (approximately) another cell and erase another
    victim, erased = 0, 1
    moved = (
        source.read()
        .filter(F.col("vec_id") == victim)
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: -x),  # flip direction
        )
    )
    source.merge(
        moved, keys=["vec_id"],
        update_set={"embedding": F.col("s.embedding")},
    )
    source.delete(F.col("vec_id") == erased)
    n1 = refresh_ivf_index(source, index, cents, cursor)
    assert n1 >= 2
    idx = index.read()
    assert idx.filter(F.col("vec_id") == erased).count() == 0
    # maintained == rebuilt, row for row (vec_id, cell)
    rebuilt = ivf_assign(source.read(), cents).select("vec_id", "cell")
    live = idx.select("vec_id", "cell")
    assert (
        live.exceptAll(rebuilt).count() == 0
        and rebuilt.exceptAll(live).count() == 0
    )


def test_semantic_dedup_keeps_farthest_from_centroid(spark):
    """SemDeDup representative rule on a hand-built cluster: two
    near-identical vectors plus one oddball. The near-dup pair resolves
    to ONE keeper — the member with the LOWER centroid similarity — and
    the oddball survives untouched."""
    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        ivf_centroids,
        semantic_dedup,
    )

    rows = [
        # cluster 0: 1 and 2 are near-identical; 3 points elsewhere
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.05, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.2, 0.0], 0),
        # cluster 1: far away so assignment never mixes
        (4, [0.0, 0.0, -1.0, -1.0], 1),
        (5, [0.0, 0.0, -1.0, -0.9], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = ivf_centroids(emb)
    out = semantic_dedup(emb, cents, threshold=0.95)
    verdicts = {r["vec_id"]: r for r in out.collect()}
    assert len(verdicts) == 5  # one verdict row per input vector
    # pair (1,2): exactly one kept, and it's the lower-centroid-sim one
    pair = [verdicts[1], verdicts[2]]
    kept = [r for r in pair if r["kept"]]
    assert len(kept) == 1
    dropped = [r for r in pair if not r["kept"]][0]
    assert kept[0]["centroid_sim"] <= dropped["centroid_sim"]
    # the oddball in the same cell and the other cluster's pair resolve
    # on their own merits
    assert verdicts[3]["kept"]
    kept_45 = [v for v in (verdicts[4], verdicts[5]) if v["kept"]]
    assert len(kept_45) == 1


def test_semantic_dedup_identical_corpus_keeps_one(spark):
    """Degenerate all-duplicates cell collapses to a single keeper —
    the lowest id at equal centroid similarity."""
    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        ivf_centroids,
        semantic_dedup,
    )

    rows = [(i, [1.0, 1.0, 0.0, 0.0], 0) for i in range(10, 16)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = semantic_dedup(emb, ivf_centroids(emb), threshold=0.99)
    kept = [r["vec_id"] for r in out.collect() if r["kept"]]
    assert kept == [10]


def test_incremental_semantic_dups_matches_bruteforce(spark, sf_dir, tmp_path):
    """Probe with nprobe = all cells must equal the brute-force
    batch × corpus cosine cross-check; nprobe=1 must be a subset of it
    and still catch the same-cell twin."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        build_ivf_index,
        incremental_semantic_dups,
    )
    from urban_mobility_data_pipeline_spark.functions.vectors import cosine
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    index = MergeTable(spark, str(tmp_path / "ivf_index"))
    build_ivf_index(emb, cents, index)

    # incoming batch: two existing corpus vectors re-submitted under new
    # ids (guaranteed near-dups at cosine 1.0) plus their negations
    # (guaranteed misses)
    base = emb.filter(F.col("vec_id").isin([3, 17])).select("embedding")
    batch = base.select(
        (F.monotonically_increasing_id() + 100000).alias("vec_id"),
        "embedding",
    ).unionByName(
        base.select(
            (F.monotonically_increasing_id() + 200000).alias("vec_id"),
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )

    threshold = 0.9
    brute = {
        (r["new_id"], r["corpus_id"])
        for r in batch.select(
            F.col("vec_id").alias("new_id"),
            F.col("embedding").alias("__nv"),
        )
        .crossJoin(
            emb.select(
                F.col("vec_id").alias("corpus_id"),
                F.col("embedding").alias("__iv"),
            )
        )
        .filter(F.round(cosine("__nv", "__iv"), 6) >= threshold)
        .collect()
    }
    assert brute  # the resubmitted twins must be in there

    all_cells = cents.count()
    got_full = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_semantic_dups(
            batch, index, cents, threshold=threshold, nprobe=all_cells
        ).collect()
    }
    assert got_full == brute

    got_1 = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_semantic_dups(
            batch, index, cents, threshold=threshold, nprobe=1
        ).collect()
    }
    assert got_1 <= brute
    # an exact twin lands in its original's cell — nprobe=1 finds it
    corpus_hits = {c for _, c in got_1}
    assert {3, 17} <= corpus_hits


def test_capped_ingest_probe_skips_and_reports_hot_cells(
    spark, sf_dir, tmp_path
):
    """incremental_semantic_dups_with_report (r10): huge cap == plain
    probe; a cap below a hot cell's occupancy drops that cell from the
    verify join AND reports every (new_id, cell, cell_size) skipped —
    the guard for fixed/user-managed quantizers whose hot cell grows
    with the corpus."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        build_ivf_index,
        incremental_semantic_dups,
        incremental_semantic_dups_with_report,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable

    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    index = MergeTable(spark, str(tmp_path / "ivf_index_cap"))
    build_ivf_index(emb, cents, index)

    batch = emb.filter(F.col("vec_id").isin([3, 17])).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    threshold, nprobe = 0.9, 2
    plain = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_semantic_dups(
            batch, index, cents, threshold=threshold, nprobe=nprobe
        ).collect()
    }
    assert plain

    pairs, skipped = incremental_semantic_dups_with_report(
        batch, index, cents, cell_cap=10**9,
        threshold=threshold, nprobe=nprobe,
    )
    assert {
        (r["new_id"], r["corpus_id"]) for r in pairs.collect()
    } == plain
    assert skipped.count() == 0

    # cap below every cell's occupancy: all probes skipped, reported
    # with the measured size, and no pair leaks through
    pairs0, skipped0 = incremental_semantic_dups_with_report(
        batch, index, cents, cell_cap=1,
        threshold=threshold, nprobe=nprobe,
    )
    assert pairs0.count() == 0
    sk = skipped0.collect()
    assert {r["new_id"] for r in sk} == {100003, 100017}
    cell_counts = {
        r["cell"]: r["cnt"]
        for r in index.read()
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in sk:
        assert r["cell_size"] == cell_counts[r["cell"]], r


def test_refresh_ivf_folds_only_truly_changed(spark, sf_dir, tmp_path):
    """Change-feed over-report cancellation (r12): a CoW MERGE rewrites
    whole files, so read_changes re-emits every row of a rewritten
    file. The refresh must null-safe-diff after vs before images and
    fold ONLY vectors whose embedding actually changed — re-assigning
    and re-merging the re-emissions would grow the per-cycle refresh
    with the corpus instead of the delta (measured 18->51s in the r12
    embedding-ingest soak before the fix)."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        ivf_centroids,
        refresh_ivf_index,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )

    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    # ONE file -> any upsert rewrites it -> the change feed re-emits
    # every row: the worst-case over-report layout
    source = MergeTable(spark, str(tmp_path / "emb"))
    source.create(emb.coalesce(1))
    index = MergeTable(spark, str(tmp_path / "ivf"))
    cursor = VersionCursor(spark, str(tmp_path / "cur"))
    total = source.read().count()
    assert refresh_ivf_index(source, index, cents, cursor) == total

    two = [r[0] for r in source.read().select("vec_id").limit(2).collect()]
    moved = (
        source.read()
        .filter(F.col("vec_id").isin(two))
        .withColumn("embedding", F.transform("embedding", lambda x: -x))
    )
    source.merge(
        moved.localCheckpoint(), keys=["vec_id"],
        update_set={"embedding": F.col("s.embedding")},
    )
    n = refresh_ivf_index(source, index, cents, cursor)
    assert n == 2, f"folded {n} rows for a 2-row upsert (over-report)"


def test_refresh_survives_vacuumed_cursor(spark, sf_dir, tmp_path):
    """Vacuum-outran-cursor fallback (found by the r12 quality-
    lifecycle soak): a GDPR erase physically vacuums files that older
    manifests still reference; a maintenance job whose cursor predates
    the purge must detect it (MergeTable.snapshot_readable) and fall
    back to a full rebuild instead of crashing on the time-travel
    read. Pinned for both the IVF index and the LSH dedup index."""
    from pyspark.sql import functions as F

    from urban_mobility_data_pipeline_spark.extensions.dedup_index import (
        band_rows,
        refresh_dedup_index,
    )
    from urban_mobility_data_pipeline_spark.extensions.gdpr_corpus import (
        erase_document_ids,
    )
    from urban_mobility_data_pipeline_spark.extensions.similarity import (
        ivf_assign,
        ivf_centroids,
        refresh_ivf_index,
    )
    from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
    from urban_mobility_data_pipeline_spark.operators.watermark import (
        VersionCursor,
    )
    from urban_mobility_data_pipeline_spark.plans._helpers import table

    # --- IVF side ---
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb)
    source = MergeTable(spark, str(tmp_path / "emb"))
    source.create(emb)
    index = MergeTable(spark, str(tmp_path / "ivf"))
    cursor = VersionCursor(spark, str(tmp_path / "cur"))
    refresh_ivf_index(source, index, cents, cursor)
    head = source.history()[0]["version"]
    assert source.snapshot_readable(head)

    victims = [r[0] for r in source.read().select("vec_id").limit(3).collect()]
    erase_document_ids(
        spark, victims, {"embeddings": source}, vacuum=True
    )
    # the purge dropped files version `head` still references
    assert not source.snapshot_readable(head)
    n = refresh_ivf_index(source, index, cents, cursor)  # must not raise
    assert n == source.read().count()  # full-rebuild fallback
    rebuilt = ivf_assign(source.read(), cents).select("vec_id", "cell")
    live = index.read().select("vec_id", "cell")
    assert (
        live.exceptAll(rebuilt).count() == 0
        and rebuilt.exceptAll(live).count() == 0
    )

    # --- LSH dedup-index side ---
    docs = table(spark, sf_dir, "documents").limit(200)
    corpus = MergeTable(spark, str(tmp_path / "docs"))
    corpus.create(docs)
    didx = MergeTable(spark, str(tmp_path / "didx"))
    dcur = VersionCursor(spark, str(tmp_path / "dcur"))
    refresh_dedup_index(corpus, didx, dcur)
    dvictims = [r[0] for r in corpus.read().select("doc_id").limit(3).collect()]
    erase_document_ids(
        spark, dvictims, {"documents": corpus}, vacuum=True
    )
    n = refresh_dedup_index(corpus, didx, dcur)  # must not raise
    assert n == corpus.read().count()
    rebuilt = band_rows(corpus.read())
    live = didx.read()
    assert (
        live.exceptAll(rebuilt).count() == 0
        and rebuilt.exceptAll(live).count() == 0
    )
