"""Similarity search over embedding columns (SURVEY.md §7 phase 6).

Two tiers:

- **Brute-force cosine top-k** (`cosine_topk`): a broadcast of the query
  vector into the plan + one linear scan + TakeOrderedAndProject. The
  exactness baseline; at 100 TB it's one pass, no shuffle of the corpus.
- **LSH-bucketed ANN** (`hyperplane_buckets` + `bucketed_topk`): random
  hyperplane signs give every vector a small integer bucket; search
  touches only the query's bucket (optionally Hamming-adjacent buckets).
  Bucketing is a map; the bucket column is a natural partition/cluster
  key for the corpus table, so the scan prunes at the file level.

Hyperplanes are deterministic (seeded from md5 in Python), embedded as
literals — reproducible in any engine, no RNG at runtime.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.functions.vectors import (
    cosine,
    dot,
    hyperplane_sign_bucket,
    norm,
)

ANN_PLANES = 8


def deterministic_hyperplanes(dim: int, n_planes: int = ANN_PLANES) -> list[list[float]]:
    """±1 hyperplane components seeded from md5(plane,dim) — stable across
    runs, processes, and engines."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the vector with id ``query_vec_id``.

    The 1-row query side is broadcast; ranking is on the *rounded*
    cosine with an id tiebreaker so results are deterministic and
    engine-portable. Plans as BroadcastNestedLoopJoin (1 row) +
    TakeOrderedAndProject — no corpus shuffle.
    """
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__qv")
    )
    scored = embeddings.filter(F.col(id_col) != query_vec_id).join(
        F.broadcast(q)
    )
    return (
        scored.select(
            F.col(id_col),
            F.round(cosine(vec_col, "__qv"), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_buckets(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = ANN_PLANES,
) -> DataFrame:
    """Assign every vector its hyperplane-sign LSH bucket (map-only)."""
    planes = deterministic_hyperplanes(dim, n_planes)
    return embeddings.select(
        F.col(id_col),
        hyperplane_sign_bucket(vec_col, planes).alias("bucket"),
    )


def bucketed_topk(
    embeddings: DataFrame,
    dim: int,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict the cosine scan to the query's LSH bucket. Recall is
    tunable via n_planes (fewer planes → bigger buckets → higher recall,
    more compute)."""
    # bucket is a pure map expression — project it inline; joining the
    # corpus to hyperplane_buckets(corpus) would shuffle the whole
    # table to recompute what one select produces for free
    planes = deterministic_hyperplanes(dim, ANN_PLANES)
    with_buckets = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_sign_bucket(vec_col, planes).alias("bucket"),
    )
    q_bucket = with_buckets.filter(F.col(id_col) == query_vec_id).select(
        F.col("bucket").alias("__qb")
    )
    candidates = with_buckets.join(F.broadcast(q_bucket)).filter(
        F.col("bucket") == F.col("__qb")
    )
    return cosine_topk(
        candidates.select(id_col, vec_col), query_vec_id, k, id_col, vec_col
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = ANN_PLANES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the corpus, pair
    only within buckets (a<b), keep pairs with cosine ≥ threshold.

    The self-join key is the bucket int, so pair generation is
    O(Σ bucket²) — with P planes buckets shrink geometrically, making
    this the corpus-scale path (vs O(n²) all-pairs). Cosine is the same
    ordered-fold recipe as cosine_topk, rounded for engine portability.
    The bucket is projected inline (map-only) — no corpus self-join.
    """
    from urban_mobility_data_pipeline_spark.cache import scratch_persist

    planes = deterministic_hyperplanes(dim, n_planes)
    # stage the bucket projection once (same pattern as near_dup_pairs'
    # shingle stage): the P-plane sign computation and the source scan
    # run a single time and the cached frame serves both join sides,
    # instead of each side re-scanning and re-projecting the corpus.
    # Registered with the scratch-cache registry so a long-lived
    # session (bench, catalog driver) releases it between queries
    # instead of leaking one cached relation per invocation (ADVICE r5).
    # Each vector's norm is folded ONCE here and reused across every
    # pair it participates in — per-pair cosine() would redo both
    # self-dots for all O(bucket²) candidates. dot/(na*nb) is
    # IEEE-identical to cosine(): same doubles, same fold order.
    with_buckets = scratch_persist(
        embeddings.select(
            F.col(id_col),
            F.col(vec_col),
            hyperplane_sign_bucket(vec_col, planes).alias("bucket"),
            norm(F.col(vec_col)).alias("__nrm"),
        )
    )
    a = with_buckets.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.col("bucket"),
        F.col("__nrm").alias("__na"),
    )
    b = with_buckets.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.col("bucket"),
        F.col("__nrm").alias("__nb"),
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    pair_cos = dot("va", "vb") / (F.col("__na") * F.col("__nb"))
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(pair_cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_centroids(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF coarse quantizer centroids as per-partition-key mean vectors.

    The oracle-friendly deterministic quantizer: the mean per existing
    label (or any clustering column) — the IVF *mechanics* (cell
    assignment, inverted-list pruning) are identical either way. The
    production training path is :func:`train_kmeans_centroids` (Spark
    ML k-means); both emit the same (cell, centroid) contract.
    """
    dim_probe = F.size(F.col(vec_col))
    exploded = embeddings.select(
        F.col(label_col).alias("cell"),
        F.posexplode(F.col(vec_col)).alias("pos", "component"),
    )
    means = exploded.groupBy("cell", "pos").agg(
        F.avg("component").alias("m")
    )
    return (
        means.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pm")
        )
        .select(
            "cell",
            F.transform("pm", lambda x: x["m"]).alias("centroid"),
        )
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid cell (max cosine).
    Centroids are broadcast (they're tiny); assignment is a map over the
    corpus. The cell column is the IVF partition key — persist the
    corpus partitioned/bucketed by it and a query scans one cell.

    Cost shape (this is the N·k hot loop of every quantizer): each
    side's norm is computed ONCE per row — dot(v,c)/(|v|·|c|) with the
    norms factored out is the SAME doubles in the SAME fold order as a
    per-pair cosine(), so assignments are bit-identical to the oracles,
    but the N·k candidate rows cost one zip_with dot instead of three
    array folds. The candidate rows are also SKINNY — (id, cell, sim),
    never the vector — so the argmax aggregate's input stream does not
    copy a 64-double array per candidate (measured: the full-vector
    variant spent its time in GC at N·k ≈ 9e7). Vectors rejoin by id
    afterwards."""
    nv = embeddings.select(
        F.col(id_col), F.col(vec_col), norm(vec_col).alias("__vn")
    )
    nc = centroids.select(
        "cell", F.col("centroid"), norm("centroid").alias("__cn")
    )
    scored = nv.join(F.broadcast(nc)).select(
        F.col(id_col),
        F.col("cell"),
        (dot(vec_col, "centroid") / (F.col("__vn") * F.col("__cn"))).alias(
            "__sim"
        ),
    )
    # argmax by (similarity, then smallest cell id) as a map-side-
    # combined aggregate: the shuffle carries one partial row per
    # vector per partition, where a row_number window would sort and
    # shuffle the full corpus × cells expansion. The negated cell in
    # the ordering struct reproduces the ASC tiebreak of the
    # equivalent (sim DESC, cell ASC) rank.
    order = F.struct(F.col("__sim").alias("s"), (-F.col("cell")).alias("c"))
    best = scored.groupBy(id_col).agg(
        F.max_by(F.col("cell"), order).alias("cell")
    )
    return embeddings.select(id_col, vec_col).join(best, id_col)


def ivf_topk(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: rank cells by centroid similarity to the query, scan
    the nprobe best cells, exact cosine inside. Recall/latency dial is
    nprobe — the standard IVF contract."""
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    q = assigned.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__qv")
    )
    cell_rank = (
        centroids.join(F.broadcast(q))
        .select("cell", cosine("centroid", "__qv").alias("__sim"))
        .orderBy(F.col("__sim").desc(), "cell")
        .limit(nprobe)
        .select("cell")
    )
    candidates = assigned.join(F.broadcast(cell_rank), "cell").select(
        id_col, vec_col
    )
    return cosine_topk(candidates, query_vec_id, k, id_col, vec_col)


def build_ivf_index(
    embeddings: DataFrame,
    centroids: DataFrame,
    index_table,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF inverted lists: persist ``ivf_assign`` output
    as a **cell-partitioned** MergeTable, so a search reads ONLY the
    probed cells' files (VERDICT r5 item 2 — previously ``ivf_topk``
    re-assigned the whole corpus on every query).

    ``cell`` is a low-cardinality physical key, so hive partitioning
    (``partition_by=["cell"]``) is the right layout — a ``cell IN
    (probes)`` filter prunes at the FileIndex level before any byte of
    parquet is read. (``bucket_keys`` hash-bucketing exists for
    high-cardinality merge keys; for k≈100-65k cells the directory
    layout IS the inverted index.) Refresh is an upsert on ``id_col``:
    new/changed vectors rewrite only the cells they land in, because the
    MERGE prunes untouched partitions via the txn-log manifest.
    """
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    # cluster the write by cell so each inverted list lands in O(1)
    # files instead of (shuffle.partitions × cells) small files — a
    # probe then opens ~nprobe files. (At 100 TB you'd raise the
    # partition count per cell; the clustering, not the count, is the
    # point.)
    assigned = assigned.repartition("cell")
    if index_table.exists():
        index_table.merge(
            assigned,
            keys=[id_col],
            update_set={
                vec_col: F.col(f"s.{vec_col}"),
                "cell": F.col("s.cell"),
            },
            insert=True,
        )
    else:
        index_table.create(assigned, partition_by=["cell"])


def probe_cells(
    centroids: DataFrame, query_vec: list[float], nprobe: int
) -> list[int]:
    """Rank cells by centroid-to-query cosine; return the nprobe best.
    Centroids are k tiny rows — collecting nprobe ints is bounded
    metadata, the same class as the MERGE log's partition collects."""
    from urban_mobility_data_pipeline_spark.functions.vectors import (
        literal_vector,
    )

    qv = literal_vector(query_vec)
    ranked = (
        centroids.select(
            "cell", cosine("centroid", qv).alias("__sim")
        )
        .orderBy(F.col("__sim").desc(), "cell")
        .limit(nprobe)
    )
    return [r["cell"] for r in ranked.collect()]


def ivf_topk_indexed(
    index_table,
    centroids: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec: list[float] | None = None,
) -> DataFrame:
    """IVF search against the *materialized* index: rank cells by
    centroid similarity, then read only the probed cells from the
    cell-partitioned table (file-level pruning — ``.explain`` shows
    ``PartitionFilters: [cell IN (...)]``; unprobed cells' files are
    never opened). Identical results to :func:`ivf_topk`; the corpus is
    neither re-assigned nor re-scanned per query.

    Pass ``query_vec`` to skip the lookup scan (the production shape —
    the caller usually has the query embedding in hand); with only
    ``query_vec_id`` the vector is fetched from the index first.
    """
    from urban_mobility_data_pipeline_spark.functions.vectors import (
        literal_vector,
    )

    if query_vec is None:
        row = (
            index_table.read()
            .filter(F.col(id_col) == query_vec_id)
            .select(vec_col)
            .first()
        )
        if row is None:
            raise KeyError(f"{id_col}={query_vec_id} not in index")
        query_vec = [float(x) for x in row[0]]
    cells = probe_cells(centroids, query_vec, nprobe)
    qv = literal_vector(query_vec)
    candidates = index_table.read().filter(F.col("cell").isin(cells))
    return (
        candidates.filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.round(cosine(vec_col, qv), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def train_kmeans_centroids(
    embeddings: DataFrame,
    k: int = 10,
    seed: int = 7,
    max_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """REAL IVF coarse-quantizer training: Spark ML k-means over the
    embedding column (``ivf_centroids``'s label-mean stand-in documents
    the mechanics; this is the production path its docstring promises).

    ``array_to_vector`` bridges the ``array<float>`` storage layout to
    ML's vector type without leaving the JVM; training is MLlib's
    distributed Lloyd's (k-means|| init, seeded — same data + seed
    reproduces the same model). Output matches :func:`ivf_centroids`:
    ``(cell, centroid array<double>)``, directly consumable by
    ``ivf_assign`` / ``ivf_topk``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        F.col(id_col),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("__features"),
    )
    model = KMeans(
        k=k, seed=seed, maxIter=max_iter, featuresCol="__features"
    ).fit(feats)
    spark = embeddings.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, "cell int, centroid array<double>")


def refresh_ivf_index(
    source,
    index_table,
    centroids: DataFrame,
    cursor,
    job: str = "ivf_index",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Cursor-driven incremental maintenance of the materialized IVF
    index — the embedding twin of ``dedup_index.refresh_dedup_index``
    and ``vocab.refresh_vocabulary``: fold the ``source`` MergeTable's
    commits since the cursor into the cell-partitioned index, paying
    O(changed vectors), never O(corpus). New/changed vectors re-assign
    and upsert (rewriting only their cells); erased vectors delete
    their index rows (GDPR reach-through). Returns changed-vector
    count (0 = current)."""
    head_hist = source.history()
    head = head_hist[0]["version"] if head_hist else 0
    cur = cursor.read_version(job)
    if cur > 0 and not source.snapshot_readable(cur):
        # a physical vacuum (e.g. a GDPR erase's purge) outran this
        # cursor: time travel / the change feed back to `cur` would
        # read deleted files — fall back to the full rebuild branch
        cur = 0
    if not index_table.exists() or cur == 0:
        live = source.read()
        existed = index_table.exists()
        build_ivf_index(live, centroids, index_table, id_col, vec_col)
        if existed:
            # a re-bootstrap over a standing index (fresh cursor, or
            # the vacuum-outran-cursor fallback above) upserts live
            # rows but must also purge ids the source no longer has —
            # the MERGE alone would leave erased vectors searchable
            stale = (
                index_table.read()
                .select(id_col)
                .join(live.select(id_col), id_col, "left_anti")
            )
            if stale.limit(1).count():
                index_table.delete_keys_in(id_col, stale)
        n = live.count()
        cursor.upsert(job, head, "OK")
        return n
    if head <= cur:
        cursor.upsert(job, None, "OK")
        return 0
    try:
        changed_ids = (
            source.read_changes(cur)
            .select(id_col)
            .unionByName(source.read_removed(cur).select(id_col))
            .distinct()
        )
        live = source.read()
        current_changed = live.join(changed_ids, id_col)
        # change-feed over-report cancellation (r12): a CoW MERGE
        # rewrites whole files, so the change feed re-emits every row
        # of a rewritten file — on a big corpus a 200-row upsert can
        # "change" tens of thousands of ids. The histogram folds cancel
        # those automatically (after − before = 0); the index MERGE
        # does not — re-assigning and re-merging unchanged vectors
        # rewrites their cells for nothing, and the per-cycle refresh
        # cost grows with the corpus instead of the delta (measured:
        # the embedding-ingest soak's cycle wall climbed 18→51s before
        # this). Null-safe-compare the after image against the before
        # image and fold only rows whose vector actually differs (or
        # whose id is new).
        before = (
            source.read(version=cur)
            .join(changed_ids, id_col)
            .select(id_col, F.col(vec_col).alias("__before"))
        )
        current_changed = (
            current_changed.join(before, id_col, "left_outer")
            .filter(~F.col(vec_col).eqNullSafe(F.col("__before")))
            .drop("__before")
        )
        n = current_changed.count()
        if n:
            build_ivf_index(
                current_changed, centroids, index_table, id_col, vec_col
            )
        erased = changed_ids.join(live.select(id_col), id_col, "left_anti")
        n_erased = erased.count()
        if n_erased:
            # DataFrame-native keyed delete: a GDPR-request-sized set
            # routes through the pruned point-delete, a mass takedown
            # anti-joins — the erased ids never become a driver-side
            # IN-list (VERDICT r6 item 3).
            index_table.delete_keys_in(id_col, erased.select(id_col))
        cursor.upsert(job, head, "OK")
        return n + n_erased
    except Exception:
        cursor.upsert(job, None, "FAIL")
        raise


#: quantizer training-sample budget per centroid (faiss uses 39-256)
TRAIN_PER_CENTROID = 40
#: adaptive quantizer k clamps (oracles interpolate these — advisor r9:
#: a constant the oracle hardcodes can silently diverge from the engine)
QUANTIZER_K_MIN = 8
QUANTIZER_K_MAX = 65536


def adaptive_quantizer_k(
    n_vectors: int,
    pair_cost_ratio: float = 4.0,
    k_min: int = QUANTIZER_K_MIN,
    k_max: int = QUANTIZER_K_MAX,
) -> int:
    """Corpus-size-scaled cluster count for the SemDeDup coarse
    quantizer.

    Cost model (uniform cells): assignment costs ``N * k`` centroid
    dots; the within-cell pair probe costs ``c * N^2 / k`` pair
    cosines, where ``c = pair_cost_ratio`` is the measured cost of one
    pair cosine relative to one assignment dot. The total
    ``N*k + c*N^2/k`` is minimized at ``k* = sqrt(c * N)`` — so k MUST
    grow with the corpus or cell density grows ~N^2/k and the probe
    turns super-linear (the measured sf1 exponent 1.08 with k fixed at
    10). At web scale this lands near SemDeDup's published ~50k
    clusters (N=1e9, c=4 -> k~63k, clamped by ``k_max``).
    """
    import math

    k = math.ceil(math.sqrt(pair_cost_ratio * max(1, n_vectors)))
    return max(k_min, min(k_max, k, max(1, n_vectors)))


def train_adaptive_quantizer(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_cost_ratio: float = 4.0,
    iters: int = 3,
    materialize_dir: str | None = None,
) -> DataFrame:
    """Train the corpus-size-scaled coarse quantizer ONCE and return
    its ``(cell, centroid)`` frame — the production shape: train here,
    then reuse the centroids across :func:`semantic_dedup`,
    :func:`build_ivf_index`, and every :func:`incremental_semantic_dups`
    ingest probe (a fixed-k or per-label quantizer lets the hottest
    cell grow with the corpus, and any within-cell probe turns
    quadratic — measured: the per-label ingest probe hit exponent 1.8
    at 4x on a Zipf-clustered mixture, bench_scaling --emb-zipf).

    k = :func:`adaptive_quantizer_k` (``ceil(sqrt(c·N))`` clamped);
    training runs on a deterministic HASH-RESIDUE SAMPLE of
    ~``TRAIN_PER_CENTROID`` vectors per centroid (faiss trains IVF
    lists on 39-256 points per centroid for the same reason):
    full-corpus Lloyd's costs iters·N·k dots, which at k = sqrt(c·N)
    is N^1.5; the sample bounds training at O(N). The residue is
    md5-fingerprint-based, NOT ``id % stride`` (advisor r9): a raw-id
    stride assumes dense contiguous ids — on a sparse or
    residue-correlated id space (any upstream filter) it silently
    skews or empties the sample. md5 of the id decorrelates from
    id-space structure, stays deterministic, and is engine-portable
    (same recipe as sampling.fingerprint_bucket), so oracles replay
    the exact trajectory. Ceiling division keeps the sample AT MOST
    ~TRAIN_PER_CENTROID·k; belt-and-braces: if the sampled count still
    lands below k (pathological id distribution), fall back to
    full-corpus training — a quantizer with fewer training points than
    centroids is degenerate. Centroids are 6dp-rounded per iteration
    (spherical_kmeans), so they replay bit-for-bit cross-engine.

    ``materialize_dir``: when set, the k trained centroids (√(cN)
    tiny rows, never the corpus) are written there as parquet ONCE and
    the returned frame reads them back. Without it the return value is
    a LAZY plan holding the whole iters-deep k-means trajectory, and
    every downstream consumer (index build, probe scoring, the
    probed-cells collect) re-executes training from scratch — at scale
    an unmaterialized quantizer re-trains per query. Parquet
    round-trips the 6dp-rounded doubles exactly, so results are
    bit-identical either way; this is also the production shape (the
    quantizer is an artifact you version next to the index, not a
    subplan)."""
    n = embeddings.count()
    k = adaptive_quantizer_k(n, pair_cost_ratio=pair_cost_ratio)
    stride = max(1, -(-n // (TRAIN_PER_CENTROID * k)))
    fp = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    train = (
        embeddings if stride == 1 else embeddings.filter(fp % stride == 0)
    )
    if stride > 1 and train.count() < k:
        train = embeddings
    # Spread the bounded sample across the cluster before the Lloyd's
    # loop: per-row training work is k centroid dots — compute-dense
    # on a byte-tiny frame — so the scan's byte-sized splits (often
    # ONE task locally, since ~40·k sampled vectors fit one parquet
    # split) starve every trajectory stage of parallelism (measured:
    # 3 consecutive 2-3.5 s single-task jobs per iteration at sf0.1
    # local[32]). Hash-repartitioning ≤40·k rows on the id is a
    # negligible shuffle at any scale and deterministic row->partition
    # placement; per-(cell,pos) means are 6dp-rounded each iteration,
    # which is the same order-robustness contract the cross-engine
    # oracle replay already relies on.
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    train = train.repartition(par, F.col(id_col))
    _assign, centroids = spherical_kmeans(
        train, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    if materialize_dir is not None:
        # k rows × dim doubles — a metadata-class write, one file
        centroids.coalesce(1).write.mode("overwrite").parquet(
            materialize_dir
        )
        centroids = embeddings.sparkSession.read.parquet(materialize_dir)
    return centroids


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame | None = None,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_cost_ratio: float = 4.0,
    quantizer_iters: int = 3,
    quantizer_dir: str | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with a coarse quantizer, then
    prune semantic duplicates *within* each cluster — a pair is a
    duplicate when its cosine exceeds ``threshold``, and the kept
    representative is the member FARTHEST from the cluster centroid
    (the paper's keep-low-centroid-similarity rule, which retains the
    most "marginal" — informative — example of each neighborhood).

    Deterministic pairwise rule (engine-portable, no greedy iteration):
    a vector is ``kept = false`` iff some same-cell vector with higher
    keep priority — lower rounded centroid-similarity, ties broken by
    lower id — is within ``threshold`` cosine of it.

    Scale shape: assignment is a broadcast-join map over the corpus;
    the duplicate probe is a self-join co-partitioned on ``cell``, so
    the pair space is O(Σ cell²) — bounded by the quantizer's cluster
    granularity (the paper uses ~50k clusters at web scale precisely so
    cells stay small), never |corpus|². Nothing collects to the driver;
    output is one row per input vector with the verdict, so the kept
    corpus is a ``kept`` filter away.

    ``centroids=None`` (the DEFAULT path) trains the quantizer here
    with :func:`spherical_kmeans` at ``k =``
    :func:`adaptive_quantizer_k```(N)`` — so cell density, and with it
    the O(Σ cell²) probe, stays bounded as the corpus grows instead of
    densifying ~N²/k under a fixed k. Training runs on a deterministic
    stride sample of ~``TRAIN_PER_CENTROID`` vectors per centroid
    (full-corpus Lloyd's at k=√(cN) is N^1.5 — it dominated the sf1
    wall before sampling); the single full-corpus assignment is the
    only N·k pass. Passing explicit centroids keeps working for
    callers that manage their own quantizer.
    """
    if centroids is None:
        centroids = train_adaptive_quantizer(
            embeddings,
            id_col=id_col,
            vec_col=vec_col,
            pair_cost_ratio=pair_cost_ratio,
            iters=quantizer_iters,
            # the trained frame is consumed TWICE below (assignment +
            # the broadcast centroid-sim join); materializing stops the
            # k-means trajectory re-executing per consumer
            materialize_dir=quantizer_dir,
        )
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    # each vector's norm is computed ONCE here and reused across every
    # pair it participates in — the naive per-pair cosine would redo
    # both self-dots for all O(cell²) pairs (measured 5.7 → ~2 s at
    # sf0.1); IEEE-identical to the oracle's sqrt(dot(x,x)) because the
    # operands are the same doubles in the same fold order
    withc = assigned.join(F.broadcast(centroids), "cell").select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cell"),
        norm(F.col(vec_col)).alias("__nrm"),
        F.round(cosine(vec_col, "centroid"), 6).alias("centroid_sim"),
    )
    a = withc.select(
        F.col(id_col).alias("__aid"),
        F.col(vec_col).alias("__avec"),
        F.col("cell"),
        F.col("__nrm").alias("__anrm"),
        F.col("centroid_sim").alias("__acsim"),
    )
    b = withc.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bvec"),
        F.col("cell"),
        F.col("__nrm").alias("__bnrm"),
        F.col("centroid_sim").alias("__bcsim"),
    )
    higher_priority = (F.col("__acsim") < F.col("__bcsim")) | (
        (F.col("__acsim") == F.col("__bcsim"))
        & (F.col("__aid") < F.col("__bid"))
    )
    pair_cos = dot("__avec", "__bvec") / (
        F.col("__anrm") * F.col("__bnrm")
    )
    removed = (
        a.join(b, "cell")
        .filter(higher_priority)
        .filter(F.round(pair_cos, 6) >= F.lit(threshold))
        .select(F.col("__bid").alias(id_col))
        .distinct()
        .withColumn("__removed", F.lit(True))
    )
    return (
        withc.join(removed, id_col, "left")
        .select(
            id_col,
            "cell",
            "centroid_sim",
            F.coalesce(~F.col("__removed"), F.lit(True)).alias("kept"),
        )
    )


def incremental_semantic_dups(
    new_vecs: DataFrame,
    index_table,
    centroids: DataFrame,
    threshold: float = 0.9,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    emit_cell_size: bool = False,
) -> DataFrame:
    """Semantic near-dup probe for an INCOMING batch against the
    materialized IVF index — the embedding twin of
    ``dedup_index.incremental_near_dups``: "does this morning's crawl
    semantically duplicate anything we already have?" without touching
    the corpus. Returns ``(new_id, corpus_id, cosine)`` with cosine ≥
    ``threshold``. Run BEFORE merging the batch into the index, or
    every vector matches itself.

    Shape: each new vector ranks the broadcast centroids and probes its
    ``nprobe`` nearest cells (nprobe > 1 buys back the recall lost to
    near-boundary twins landing one cell apart — the standard IVF
    dial); the batch's distinct probed cells — bounded by k, metadata-
    class — collect into a static ``cell IN (...)`` filter so the index
    scan file-prunes to exactly those inverted lists, and the batch
    side broadcasts into a within-cell pair probe. Work is
    O(|batch| × probed-cell size), never O(corpus).

    ``emit_cell_size=True`` appends the matched corpus cell's
    occupancy (``cell_size``) to every pair — the hazard metric for a
    FIXED or user-managed quantizer, where the hottest cell grows with
    the corpus and the within-cell verify is quadratic in its
    occupancy (measured exponent 1.59–1.85 at 4x on a Zipf-clustered
    mixture: BENCH_SCALING_EMB_ZIPF_r10, the tripwire table). A
    consumer gates on it exactly like the capped dedup rows'
    ``truncated_members``: occupancy at ~cap means re-route through
    :func:`train_adaptive_quantizer` (the structural fix, measured
    exp 0.68) or :func:`incremental_semantic_dups_with_report` (the
    operational guard, exp 0.55). The sizing is one count over the
    already-pruned nprobe cells — the scan of those cells is paid by
    the probe regardless; no extra corpus work.
    """
    from pyspark.sql import Window

    scored = new_vecs.join(F.broadcast(centroids)).select(
        F.col(id_col).alias("new_id"),
        F.col(vec_col).alias("__nv"),
        F.col("cell"),
        cosine(vec_col, "centroid").alias("__sim"),
    )
    w = Window.partitionBy("new_id").orderBy(
        F.col("__sim").desc(), F.col("cell")
    )
    # norms fold once per side: a corpus vector meets every probe in
    # its cell (and a probe meets every corpus vector), so per-pair
    # cosine() would redo both self-dots |pairs| times. dot/(nn*ni)
    # is IEEE-identical (same doubles, same fold order).
    probes = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select(
            "new_id", "__nv", "cell", norm(F.col("__nv")).alias("__nn")
        )
    )
    cells = [
        r["cell"] for r in probes.select("cell").distinct().collect()
    ]
    idx = index_table.read().filter(F.col("cell").isin(cells)).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__iv"),
        "cell",
        norm(F.col(vec_col)).alias("__ni"),
    )
    pair_cos = dot("__nv", "__iv") / (F.col("__nn") * F.col("__ni"))
    pairs = (
        F.broadcast(probes)
        .join(idx, "cell")
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select(
            "new_id",
            "corpus_id",
            F.round(pair_cos, 6).alias("cosine"),
            "cell",
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        # no distinct needed: the index holds each corpus vector in
        # exactly one cell, so a (new, corpus) pair can join only once
        # even when the new vector probes several cells
    )
    if not emit_cell_size:
        return pairs.drop("cell")
    sizes = idx.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("cell_size")
    )
    return pairs.join(F.broadcast(sizes), "cell").select(
        "new_id", "corpus_id", "cosine", "cell_size"
    )


def incremental_semantic_dups_with_report(
    new_vecs: DataFrame,
    index_table,
    centroids: DataFrame,
    cell_cap: int,
    threshold: float = 0.9,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Saturation-aware variant of :func:`incremental_semantic_dups` —
    the embedding twin of
    ``dedup_index.incremental_near_dups_with_report``.

    The plain probe's hazard: under a FIXED or user-managed quantizer
    a hot cell grows with the corpus and the within-cell verify turns
    quadratic in its occupancy (measured exponent 1.85 at 4x on a
    Zipf-clustered mixture, bench_scaling --emb-zipf). The structural
    fix is the adaptive quantizer (:func:`train_adaptive_quantizer`);
    this is the guard for when the quantizer is NOT yours to retrain:
    the probed index slice is sized per cell (one linear pass over the
    already-pruned nprobe cells — the SCAN of a hot cell is linear and
    unavoidable; it is the pair-join OUTPUT this bounds), cells above
    ``cell_cap`` are dropped from the verify join, and the skip is
    never silent — the second frame reports every
    ``(new_id, cell, cell_size)`` skipped so ingest gates on it: a
    batch vector whose every probed cell saturated got NO dedup check
    and must be re-routed (retrain the quantizer, exact-hash fallback,
    quarantine).

    Returns ``(pairs, skipped)``; pairs as the plain probe, restricted
    to unsaturated cells.
    """
    from pyspark.sql import Window

    from urban_mobility_data_pipeline_spark.cache import scratch_persist

    scored = new_vecs.join(F.broadcast(centroids)).select(
        F.col(id_col).alias("new_id"),
        F.col(vec_col).alias("__nv"),
        F.col("cell"),
        cosine(vec_col, "centroid").alias("__sim"),
    )
    w = Window.partitionBy("new_id").orderBy(
        F.col("__sim").desc(), F.col("cell")
    )
    probes = scratch_persist(
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select(
            "new_id", "__nv", "cell", norm(F.col("__nv")).alias("__nn")
        )
    )
    cells = [
        r["cell"] for r in probes.select("cell").distinct().collect()
    ]
    idx = index_table.read().filter(F.col("cell").isin(cells)).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("__iv"),
        "cell",
        norm(F.col(vec_col)).alias("__ni"),
    )
    sizes = scratch_persist(
        idx.groupBy("cell").agg(
            F.count(F.lit(1)).cast("long").alias("cell_size")
        )
    )
    skipped = probes.join(
        F.broadcast(sizes.filter(F.col("cell_size") > cell_cap)), "cell"
    ).select("new_id", "cell", "cell_size")
    ok_idx = idx.join(
        F.broadcast(sizes.filter(F.col("cell_size") <= cell_cap)).select(
            "cell"
        ),
        "cell",
    )
    pair_cos = dot("__nv", "__iv") / (F.col("__nn") * F.col("__ni"))
    pairs = (
        F.broadcast(probes)
        .join(ok_idx, "cell")
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select(
            "new_id",
            "corpus_id",
            F.round(pair_cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )
    return pairs, skipped


# ---------------------------------------------------------------------------
# Product quantization (PQ): sub-vector codebooks + asymmetric search
# ---------------------------------------------------------------------------
#: subspaces for the catalog queries: a 64-dim embedding splits into
#: 4 x 16-dim subvectors, each encoded as one small int — 4 bytes per
#: vector against 256 for the raw floats, the compression that makes
#: a 100 TB vector corpus searchable from memory (IVF prunes WHICH
#: vectors to score; PQ shrinks WHAT is scored).
PQ_M = 4


def pq_codebooks(
    embeddings: DataFrame,
    *,
    subdim: int,
    vec_col: str = "embedding",
    label_col: str = "label",
    quantize: int = 6,
) -> DataFrame:
    """Per-subspace PQ codebooks → ``(code, j, codeword)``.

    Deterministic oracle-friendly quantizer, same contract as
    :func:`ivf_centroids`: the codeword for ``(label, subspace j)`` is
    the mean of that label's j-th subvector, components rounded to
    ``quantize`` decimals in BOTH engines so the codebook cannot
    drift. (A production path would k-means each subspace exactly like
    :func:`train_kmeans_centroids`; the PQ mechanics — encode, LUT,
    ADC — are identical either way.) One posexplode + two tiny
    aggregations; the result is codes x subspaces rows, always
    broadcastable."""
    exploded = embeddings.select(
        F.col(label_col).alias("code"),
        F.posexplode(F.col(vec_col)).alias("pos", "component"),
    )
    means = exploded.select(
        "code",
        (F.col("pos") / F.lit(subdim)).cast("int").alias("j"),
        (F.col("pos") % F.lit(subdim)).alias("subpos"),
        "component",
    ).groupBy("code", "j", "subpos").agg(
        F.round(F.avg("component"), quantize).alias("m")
    )
    return (
        means.groupBy("code", "j")
        .agg(
            F.array_sort(F.collect_list(F.struct("subpos", "m"))).alias(
                "pm"
            )
        )
        .select(
            "code",
            "j",
            F.transform("pm", lambda x: x["m"]).alias("codeword"),
        )
    )


def _subvectors(vec_col: str, m: int, subdim: int):
    """Explodable (j, subvector) structs; components cast to double so
    downstream dot products match the oracle's DOUBLE lists."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.transform(
                        F.slice(F.col(vec_col), j * subdim + 1, subdim),
                        lambda x: x.cast("double"),
                    ).alias("sv"),
                )
                for j in range(m)
            ]
        )
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    *,
    m: int = PQ_M,
    subdim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` codebook indices →
    ``(vec_id, j, code)``, one row per subspace.

    The codebooks broadcast (codes x subspaces rows); scoring each
    subvector against each codeword is map-side, and the per-(vector,
    subspace) argmax is the same max_by partial-aggregate shape as
    :func:`ivf_assign` — the shuffle carries one partial row per
    (vector, subspace) per partition, never the expanded candidate
    scores. Ties break toward the smallest code in both engines."""
    from urban_mobility_data_pipeline_spark.functions.vectors import dot

    sv = embeddings.select(
        F.col(id_col), _subvectors(vec_col, m, subdim).alias("s")
    ).select(id_col, F.col("s.j").alias("j"), F.col("s.sv").alias("sv"))
    scored = sv.join(F.broadcast(codebooks), "j").select(
        id_col,
        "j",
        "code",
        dot("sv", "codeword").alias("__sim"),
    )
    order = F.struct(F.col("__sim").alias("s"), (-F.col("code")).alias("c"))
    return scored.groupBy(id_col, "j").agg(
        F.max_by("code", order).alias("code")
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    query_subvectors: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric distance computation: rank encoded vectors against
    an UNencoded query. The per-subspace lookup table (query subvector
    x each codeword, codes x subspaces rows) is computed once and
    broadcast; each database vector's score is then the sum of m table
    lookups — no float arithmetic per vector at query time, which is
    the entire point of PQ at scale. Top-k is a
    TakeOrderedAndProject on the rounded score with an id tiebreak."""
    from urban_mobility_data_pipeline_spark.functions.vectors import dot

    lut = codebooks.join(F.broadcast(query_subvectors), "j").select(
        "j", "code", dot("sv", "codeword").alias("d")
    )
    return (
        codes.join(F.broadcast(lut), ["j", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("d"), 6).alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# binary quantization (sign-bit codes + Hamming candidate generation)
# ---------------------------------------------------------------------------
#: Bits per packed word. 32 keeps every fold value strictly inside a
#: signed 64-bit range (max 2^32-1), so the identical integer arithmetic
#: runs overflow-free in Spark and in any SQL oracle engine — packing
#: all 64 sign bits into one word would hit the signed-overflow edge at
#: bit 63, where engines disagree (wrap vs error).
BQ_WORD_BITS = 32


def bq_pack_word(vec_col: str, lo_dim: int, hi_dim: int):
    """Fold dims [lo_dim, hi_dim) (0-based) of an array column into one
    integer word: bit = 1 iff component > 0, MSB-first fold
    ``acc*2 + bit``. JVM-side `aggregate` over an index sequence — no
    UDF, and the same fold is one `list_reduce` in SQL engines."""
    return F.aggregate(
        F.sequence(F.lit(lo_dim + 1), F.lit(hi_dim)),  # 1-based element_at
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2
        + F.when(
            F.element_at(F.col(vec_col), i).cast("double") > 0.0, F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )


def bq_codes(
    embeddings: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit binary quantization: 64-d float vector -> two 32-bit
    words (64x storage cut vs float32 x dim). A map-only projection;
    the words are what ships to the candidate-generation scan."""
    assert dim == 2 * BQ_WORD_BITS, "bq_codes packs exactly 2 words"
    return embeddings.select(
        F.col(id_col),
        bq_pack_word(vec_col, 0, BQ_WORD_BITS).alias("bq_lo"),
        bq_pack_word(vec_col, BQ_WORD_BITS, dim).alias("bq_hi"),
    )


def bq_hamming_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    *,
    dim: int,
    k: int = 10,
    candidates: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized search with codes computed inline (the
    one-shot form; a deployment stores the codes once and queries them
    via :func:`bq_topk_from_codes`)."""
    codes = bq_codes(embeddings, dim=dim, id_col=id_col, vec_col=vec_col)
    return bq_topk_from_codes(
        codes,
        embeddings,
        query_vec_id,
        k=k,
        candidates=candidates,
        id_col=id_col,
        vec_col=vec_col,
    )


def bq_topk_from_codes(
    codes: DataFrame,
    embeddings: DataFrame,
    query_vec_id: int,
    *,
    k: int = 10,
    candidates: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized search over STORED sign-bit codes: Hamming
    distance generates a candidate set, exact cosine reranks it.

    Scale shape: the candidate scan touches only the two 8-byte words
    per vector — at 100 TB of float embeddings the codes table is
    ~1.5 TB, and the float vectors stay in their files until the
    rerank; candidate generation is a TakeOrderedAndProject on
    ``bit_count(xor)`` — each partition forwards at most ``candidates``
    rows. The rerank joins the tiny candidate id set (broadcast) back
    to the corpus to fetch just those float vectors, then scores
    against the broadcast query. Ordering uses the integer Hamming
    distance and the ROUNDED cosine with id tiebreaks, so the result
    is engine-portable."""
    q = codes.filter(F.col(id_col) == query_vec_id).select(
        F.col("bq_lo").alias("__qlo"), F.col("bq_hi").alias("__qhi")
    )
    hamming = F.bit_count(
        F.col("bq_lo").bitwiseXOR(F.col("__qlo"))
    ) + F.bit_count(F.col("bq_hi").bitwiseXOR(F.col("__qhi")))
    cand = (
        codes.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q))
        .select(F.col(id_col), hamming.cast("int").alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(candidates)
    )
    qv = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__qv")
    )
    return (
        embeddings.join(F.broadcast(cand), id_col)
        .join(F.broadcast(qv))
        .select(
            F.col(id_col),
            "hamming",
            F.round(cosine(vec_col, "__qv"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Lloyd's k-means as pure DataFrame operations (spherical variant)
# ---------------------------------------------------------------------------


def _positional_mean_centroids(assigned: DataFrame, vec_col: str) -> DataFrame:
    """Per-cell positional mean vector, components rounded to 6dp.

    The rounding is the cross-engine determinism contract (same as the
    IVF quantizer): every iteration's centroids are identical doubles in
    Spark and any SQL oracle, so assignment argmaxes can't drift.
    """
    exploded = assigned.select(
        "cell", F.posexplode(F.col(vec_col)).alias("pos", "component")
    )
    means = exploded.groupBy("cell", "pos").agg(
        F.round(F.avg("component"), 6).alias("m")
    )
    return (
        means.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda x: x["m"]).alias("centroid"))
    )


def _assign_cells(
    embeddings: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment by max cosine, ties to the lower cell.

    Same contract as :func:`ivf_assign`'s window argmax, but computed as
    ``max(struct(sim, -cell))`` under a groupBy — max is
    partial-aggregable, so each partition combines its k candidate rows
    per vector MAP-SIDE and the shuffle carries at most one row per
    vector instead of the window's k*n sorted rows. The negated cell
    makes the struct ordering break similarity ties toward the LOWER
    cell, exactly like the window's ``ORDER BY sim DESC, cell ASC``.
    Like :func:`ivf_assign`, the N·k candidate rows are SKINNY (id,
    cell, sim) with both sides' norms factored out — bit-identical
    similarities (same doubles, same fold order as cosine()) at one
    array fold per candidate instead of three, and no per-candidate
    vector copies; vectors rejoin by id.
    """
    nv = embeddings.select(
        F.col(id_col), F.col(vec_col), norm(vec_col).alias("__vn")
    )
    nc = centroids.select(
        "cell", F.col("centroid"), norm("centroid").alias("__cn")
    )
    scored = nv.join(F.broadcast(nc)).select(
        F.col(id_col),
        F.col("cell"),
        (dot(vec_col, "centroid") / (F.col("__vn") * F.col("__cn"))).alias(
            "__sim"
        ),
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("__sim").alias("s"),
                (-F.col("cell")).alias("negcell"),
            )
        ).alias("__best")
    )
    return embeddings.select(id_col, vec_col).join(best, id_col).select(
        F.col(id_col),
        F.col(vec_col),
        (-F.col("__best.negcell")).cast("int").alias("cell"),
        F.col("__best.s").alias("__sim"),
    )


def spherical_kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means, spherical variant (Dhillon & Modha 2001), as pure
    Catalyst operations — no Spark ML, no RNG, no driver collects.

    - **init**: the ``k`` vectors with the lowest ids become cells
      ``0..k-1`` (deterministic, engine-replayable — no random seeds).
    - **assign**: argmax cosine to the current centroids, ties to the
      lower cell (cosine is scale-invariant, so the unnormalized mean
      gives the same assignment as the normalized spherical centroid).
    - **update**: per-cell positional mean, rounded to 6dp in every
      engine so iterations can't drift cross-engine.

    Returns ``(assignments, centroids)`` where assignments carries
    ``(id_col, cell, centroid_cos)`` for the FINAL centroids. Each
    iteration is one broadcast join (k rows broadcast) + one shuffle
    (the per-cell mean); at 100 TB the corpus is scanned ``iters + 1``
    times and never shuffled on anything wider than (cell, pos).
    Empty cells drop out (both engines identically).
    """
    from pyspark.sql import Window

    dbl = embeddings.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias(vec_col),
    )
    w_init = Window.orderBy(id_col)
    cents = (
        dbl.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(w_init) - 1).alias("cell"),
            F.col(vec_col).alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = _assign_cells(dbl, cents, id_col, vec_col)
        cents = _positional_mean_centroids(assigned, vec_col)
    final = _assign_cells(dbl, cents, id_col, vec_col).select(
        id_col,
        "cell",
        F.round("__sim", 6).alias("centroid_cos"),
    )
    return final, cents
