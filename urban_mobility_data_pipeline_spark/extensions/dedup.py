"""Document deduplication at pre-training-corpus scale (SURVEY.md §7
phase 6 — additive beyond the reference's surface).

Strategies, cheapest first:

- **Exact**: hash-groupBy on a content digest. One shuffle on the digest;
  at 100 TB the digest (16 bytes) shuffles, not the text.
- **MinHash + LSH**: per-doc signature of K minhashes over word-shingle
  sets, banded into B buckets; only docs sharing a band bucket become
  candidate pairs, verified with exact Jaccard. Shuffle volume is
  O(docs × B) band keys + O(candidate pairs), never O(docs²).
- **SimHash**: 32-bit locality-sensitive fingerprint; near-dups share
  fingerprints (or differ in few bits). One map + one groupBy.

All pure built-in expressions (split/transform/aggregate/md5) — no UDFs,
no driver collects. MinHash uses md5-hex string minima (a valid uniform
permutation approximation) so signatures are bit-reproducible in any
engine with md5 — the DuckDB oracles replay them exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: MinHash configuration: K hashes, banded B bands × R rows (K = B*R).
MINHASH_K = 8
LSH_BANDS = 4
LSH_ROWS = 2

SIMHASH_BITS = 32


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles of lowercased whitespace tokens; short
    docs (<n words) contribute their whole text as one shingle.

    NOTE: as a single Column expression the tokenizer sub-tree is
    re-inlined at every ``element_at`` reference — fine for one-off use,
    but hot paths should go through :func:`shingles_df`, which stages
    ``words`` as a materialized attribute (CollapseProject keeps
    non-cheap multi-referenced aliases in their own projection).
    """
    c = F.col(text) if isinstance(text, str) else text
    norm = F.lower(F.trim(c))
    w = F.split(norm, r"\s+")
    return _shingle_expr(norm, w, n)


def _shingle_expr(norm: Column, w: Column, n: int = 3) -> Column:
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(w) >= n, grams).otherwise(F.array(norm))
    )


def shingles_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingles) with the tokenizer staged: ``norm`` and ``words``
    become attributes of an inner projection, so the regex split runs
    exactly once per document no matter how many times the shingle
    builder references it."""
    staged = docs.select(
        F.col(id_col),
        F.lower(F.trim(F.col(text_col))).alias("__norm"),
    ).select(
        F.col(id_col),
        F.col("__norm"),
        F.split(F.col("__norm"), r"\s+").alias("__words"),
    )
    return staged.select(
        F.col(id_col),
        _shingle_expr(F.col("__norm"), F.col("__words"), n).alias("shingles"),
    )


def exploded_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, shingle) rows — the corpus-scale layout for signature
    building. Pass a precomputed ``shingles`` frame to avoid re-running
    the tokenizer (multi-stage pipelines stage it once)."""
    src = shingles if shingles is not None else shingles_df(docs, id_col, text_col)
    return src.select(F.col(id_col), F.explode("shingles").alias("shingle"))


#: Each minhash j reads 8 hex chars (32 bits) of the doubled digest
#: H = md5('0|'+s) || md5('1|'+s). Two md5 calls yield all K=8 hash
#: families — 4× fewer digests than one-md5-per-family, same estimator
#: (slices of independent digests are independent uniform hashes).
MINHASH_SLICE_CHARS = 8


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """doc_id + mh_0..mh_{K-1} signature table.

    Shape: explode shingles → 2 md5s per (doc, shingle) row, sliced into
    K 8-hex-char family hashes → groupBy doc min. Map-side partial
    aggregation means the shuffle carries one K-wide signature per doc
    per partition — at corpus scale this is the plan you want (vs
    per-row array folds, which re-evaluate the tokenizer K times per
    element when Catalyst inlines the lambda). Lexicographic min over a
    uniform hex hash slice is a permutation-min — the classic MinHash
    estimator.
    """
    w = MINHASH_SLICE_CHARS
    digested = exploded_shingles(docs, id_col, text_col, shingles=shingles).select(
        F.col(id_col),
        F.concat(
            F.md5(F.concat(F.lit("0|"), F.col("shingle"))),
            F.md5(F.concat(F.lit("1|"), F.col("shingle"))),
        ).alias("H"),
    )
    per_shingle = digested.select(
        F.col(id_col),
        *[
            F.substring("H", j * w + 1, w).alias(f"h{j}")
            for j in range(MINHASH_K)
        ],
    )
    return per_shingle.groupBy(id_col).agg(
        *[F.min(f"h{j}").alias(f"mh_{j}") for j in range(MINHASH_K)]
    )


def lsh_band_keys(
    sigs: DataFrame, id_col: str = "doc_id", with_refine: bool = False
) -> DataFrame:
    """Explode signatures into (band_id, band_key) rows: band_key =
    md5(concat of the band's R minhashes). Docs sharing any band_key are
    candidate near-dups. ``with_refine`` adds a ``refine_key`` column —
    the NEXT band's key — used by the bucket-cap overflow path to
    secondary-band oversized buckets (a pair surviving refinement in
    band b agreed on bands b AND b+1; a pair split apart can still
    collide in any other band it shares)."""

    def _bk(b: int):
        return F.md5(
            F.concat(
                *[F.col(f"mh_{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
            )
        )

    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            _bk(b).alias("band_key"),
            *(
                [_bk((b + 1) % LSH_BANDS).alias("refine_key")]
                if with_refine
                else []
            ),
        )
        for b in range(LSH_BANDS)
    ]
    out_cols = [id_col, "band.band_id", "band.band_key"]
    if with_refine:
        out_cols.append("band.refine_key")
    return sigs.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(*out_cols)


def capped_bucket_keys(
    keys: DataFrame,
    id_col: str,
    bucket_cap: int,
    n_bands: int,
    combine,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Self-bounding bucket membership for pair-candidate joins.

    A banded pair join costs O(Σ bucket²); one pathological bucket (a
    boilerplate shingle, a zero simhash band on short docs) makes the
    whole job quadratic with no warning. This bounds every bucket to
    ``bucket_cap`` members in two steps:

    1. **secondary banding**: members of an oversized bucket are
       re-keyed by ``combine(band_key, refine_key)`` — the original key
       widened with the next band's key — under ``band_id + n_bands``
       (so refined buckets can never collide with unrefined ones).
       High-similarity pairs mostly agree on the extra band and stay
       together; the split is what bounds the bucket.
    2. **hard cap**: a refined sub-bucket still larger than the cap is
       truncated to its ``bucket_cap`` lowest ids (deterministic). The
       dropped membership is *measured*, not silent —
       :func:`bucket_overflow_stats` emits it per band.

    Both steps are one shuffle on the bucket key (a window, not a
    join); output schema is ``(id, band_id, band_key)`` plus any
    ``extra_cols`` carried through untouched (the cross-corpus caller
    tags rows with their side so the capped membership can be split
    back into an A×B join; sizing and truncation then operate on the
    UNION of both sides — a bucket oversized only in A must refine
    BOTH sides' members identically or their pairs are lost). The
    truncation order is ``(id, *extra_cols)`` so it stays
    deterministic even when the same id appears on both sides.
    """
    from pyspark.sql import Window

    extras = list(extra_cols)
    out = [id_col, "band_id", "band_key", *extras]
    w_size = Window.partitionBy("band_id", "band_key")
    sized = keys.withColumn("__bsz", F.count(F.lit(1)).over(w_size))
    small = sized.filter(F.col("__bsz") <= bucket_cap).select(*out)
    refined = sized.filter(F.col("__bsz") > bucket_cap).select(
        id_col,
        (F.col("band_id") + n_bands).alias("band_id"),
        combine(F.col("band_key"), F.col("refine_key")).alias("band_key"),
        *extras,
    )
    w_rank = Window.partitionBy("band_id", "band_key").orderBy(
        id_col, *extras
    )
    capped = (
        refined.withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") <= bucket_cap)
        .select(*out)
    )
    return small.unionByName(capped)


def bucket_overflow_stats(
    keys: DataFrame,
    id_col: str,
    bucket_cap: int,
    combine,
) -> DataFrame:
    """The emitted overflow metric for :func:`capped_bucket_keys`: one
    row per band with the bucket-size profile and, after secondary
    banding, how many members the hard cap would drop. A 100-TB dedup
    job reads this BEFORE trusting its pair output — nonzero
    ``truncated_members`` means the corpus saturates this banding and
    the caller should raise the cap, add bands, or pre-split the
    offending content class."""
    from pyspark.sql import Window

    w_size = Window.partitionBy("band_id", "band_key")
    sized = keys.withColumn("__bsz", F.count(F.lit(1)).over(w_size))
    per_bucket = keys.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("__sz")
    )
    base = per_bucket.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(
            F.when(F.col("__sz") > bucket_cap, 1).otherwise(0)
        ).alias("oversized_buckets"),
        F.max("__sz").alias("max_bucket"),
    )
    truncated = (
        sized.filter(F.col("__bsz") > bucket_cap)
        .groupBy(
            "band_id",
            combine(F.col("band_key"), F.col("refine_key")).alias("__rk"),
        )
        .agg(F.count(F.lit(1)).alias("__rsz"))
        .groupBy("band_id")
        .agg(
            F.sum(
                F.greatest(F.col("__rsz") - bucket_cap, F.lit(0))
            ).alias("truncated_members")
        )
    )
    return (
        base.join(truncated, "band_id", "left")
        .select(
            "band_id",
            "n_buckets",
            "oversized_buckets",
            "max_bucket",
            F.coalesce("truncated_members", F.lit(0)).alias(
                "truncated_members"
            ),
        )
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
    bucket_cap: int | None = None,
    band_keys: DataFrame | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band.
    The self-join is on (band_id, band_key) — a co-partitioned shuffle
    join whose width is the bucket sizes, not the corpus. The band-key
    table (docs × B short rows) is persisted so the minhash aggregation
    runs once, not once per self-join side. ``bucket_cap`` routes
    oversized buckets through :func:`capped_bucket_keys` (secondary
    banding + hard cap), bounding the join at O(B·buckets·cap²) on ANY
    corpus; pair :func:`bucket_overflow_stats` alongside to see what
    the cap cost. ``band_keys`` supplies a precomputed (ideally
    persisted) band-key frame — callers that ALSO need the keys (the
    overflow report rides beside every capped composition) stage them
    once instead of re-running tokenize→minhash→banding per consumer;
    must include ``refine_key`` when ``bucket_cap`` is set."""
    from urban_mobility_data_pipeline_spark.cache import scratch_persist

    keys = band_keys if band_keys is not None else scratch_persist(
        lsh_band_keys(
            minhash_signatures(docs, id_col, text_col, shingles=shingles),
            id_col,
            with_refine=bucket_cap is not None,
        )
    )
    if bucket_cap is not None:
        keys = capped_bucket_keys(
            keys,
            id_col,
            bucket_cap,
            LSH_BANDS,
            combine=lambda k, r: F.md5(F.concat(k, r)),
        )
    a = keys.alias("a")
    b = keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard over two distinct shingle arrays, engine-portable
    (filter+contains rather than array_intersect, so the oracle can
    replay the same semantics)."""
    inter = F.size(F.filter(sh_a, lambda x: F.array_contains(sh_b, x)))
    union = F.size(sh_a) + F.size(sh_b) - inter
    return inter / union.cast("double")


def near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    bucket_cap: int | None = None,
    shingles: DataFrame | None = None,
    band_keys: DataFrame | None = None,
) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard ≥ threshold.

    The shingle table is computed ONCE and persisted (memory-and-disk —
    the moral equivalent of staging it to a scratch table), then serves
    all three consumers: signature building and both sides of the verify
    join. Without the stage each consumer would re-tokenize the corpus —
    three full text scans instead of one. The candidate list is tiny
    relative to the corpus, so it is broadcast into the verify joins
    explicitly: the corpus-side shingle stage is never reshuffled.
    ``shingles``/``band_keys`` accept pre-staged frames (the capped
    compositions stage both once and feed the overflow report from the
    same keys — see ``lsh_candidate_pairs``)."""
    from urban_mobility_data_pipeline_spark.cache import scratch_persist

    sh = (
        shingles
        if shingles is not None
        else scratch_persist(shingles_df(docs, id_col, text_col))
    )
    cands = lsh_candidate_pairs(
        docs, id_col, text_col, shingles=sh, bucket_cap=bucket_cap,
        band_keys=band_keys,
    )
    paired = (
        F.broadcast(cands)
        .join(
            sh.select(
                F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")
            ),
            "doc_a",
        )
        .join(
            sh.select(
                F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")
            ),
            "doc_b",
        )
    )
    return (
        paired.select(
            "doc_a",
            "doc_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    out_col: str = "simhash32",
) -> DataFrame:
    """32-bit SimHash fingerprint per document.

    Per token: v = first 8 hex chars of md5(token) parsed base-16
    (32 bits). Per bit i: weight Σ over tokens of (2·bit_i(v) − 1);
    final bit i = (Σ > 0); fingerprint = Σ bit_i·2^i. Integer-exact, so
    any md5-capable engine replays it bit-for-bit.

    Shape: explode tokens → one md5 per token row → 32 conditional sums
    in a single hash aggregate (map-side combine ⇒ the shuffle carries
    32 longs per doc per partition, not tokens).
    """
    c = F.col(text_col)
    tokens = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(c)), r"\s+")).alias("tok"),
    )
    per_tok = tokens.select(
        F.col(id_col),
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("v"),
    )
    sums = per_tok.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright(F.col("v"), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(
                f"s{i}"
            )
            for i in range(bits)
        ]
    )
    fingerprint = None
    for i in range(bits):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return sums.select(F.col(id_col), fingerprint.alias(out_col))


def cross_corpus_band_keys(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles_a: DataFrame | None = None,
    shingles_b: DataFrame | None = None,
    with_refine: bool = False,
) -> DataFrame:
    """Band keys for BOTH corpora in one frame, tagged ``__side``
    ('a'/'b') — the shared input of the capped cross-corpus candidate
    join and its overflow report. Sizing/refinement must see the UNION
    of both sides' memberships (a bucket oversized only on one side
    still explodes the A×B join, and one-sided refinement would split
    pairs apart), so the tagged union IS the unit the cap operates on."""
    keys_a = lsh_band_keys(
        minhash_signatures(corpus_a, id_col, text_col, shingles=shingles_a),
        id_col,
        with_refine=with_refine,
    ).withColumn("__side", F.lit("a"))
    keys_b = lsh_band_keys(
        minhash_signatures(corpus_b, id_col, text_col, shingles=shingles_b),
        id_col,
        with_refine=with_refine,
    ).withColumn("__side", F.lit("b"))
    return keys_a.unionByName(keys_b)


def cross_corpus_near_dups(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    bucket_cap: int | None = None,
    shingles_a: DataFrame | None = None,
    shingles_b: DataFrame | None = None,
    band_keys: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicates ACROSS two corpora — the train/eval contamination
    check every serious training-data pipeline runs before reporting
    eval numbers: a doc in B (eval) that near-duplicates a doc in A
    (train) inflates the metric.

    Same MinHash-LSH shape as :func:`near_dup_pairs`, but the band-key
    join is A×B instead of a self-join, so candidate cost is
    O(Σ |bucket_A|·|bucket_B|) — never |A|×|B|. Each corpus's shingle
    table is staged once and serves its signature build and its verify
    side; the (tiny) candidate list broadcasts into both verify joins,
    so neither corpus is reshuffled. Output:
    ``(doc_a, doc_b, jaccard)`` with ``doc_a`` ∈ A, ``doc_b`` ∈ B.

    ``bucket_cap`` routes the TAGGED UNION of both sides' band keys
    through :func:`capped_bucket_keys` (secondary banding + hard cap
    over the union, so both sides of an oversized bucket refine
    identically), bounding the A×B join at O(B·buckets·cap²) on any
    corpus pair; pair :func:`bucket_overflow_stats` on
    :func:`cross_corpus_band_keys` output to see what the cap cost.
    ``shingles_a``/``shingles_b``/``band_keys`` accept pre-staged
    frames (band_keys = the TAGGED, uncapped, refined union from
    :func:`cross_corpus_band_keys`) so a caller that also emits the
    overflow report builds the tokenize→minhash→banding pipeline once
    for both consumers instead of once each.
    """
    from urban_mobility_data_pipeline_spark.cache import scratch_persist

    sh_a = (
        shingles_a
        if shingles_a is not None
        else scratch_persist(shingles_df(corpus_a, id_col, text_col))
    )
    sh_b = (
        shingles_b
        if shingles_b is not None
        else scratch_persist(shingles_df(corpus_b, id_col, text_col))
    )
    if bucket_cap is not None:
        union = (
            band_keys
            if band_keys is not None
            else cross_corpus_band_keys(
                corpus_a, corpus_b, id_col, text_col,
                shingles_a=sh_a, shingles_b=sh_b, with_refine=True,
            )
        )
        keys = scratch_persist(
            capped_bucket_keys(
                union,
                id_col,
                bucket_cap,
                LSH_BANDS,
                combine=lambda k, r: F.md5(F.concat(k, r)),
                extra_cols=["__side"],
            )
        )
        keys_a = keys.filter(F.col("__side") == "a").drop("__side")
        keys_b = keys.filter(F.col("__side") == "b").drop("__side")
    else:
        keys_a = lsh_band_keys(
            minhash_signatures(corpus_a, id_col, text_col, shingles=sh_a),
            id_col,
        )
        keys_b = lsh_band_keys(
            minhash_signatures(corpus_b, id_col, text_col, shingles=sh_b),
            id_col,
        )
    cands = (
        keys_a.alias("a")
        .join(
            keys_b.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    paired = (
        F.broadcast(cands)
        .join(
            sh_a.select(
                F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")
            ),
            "doc_a",
        )
        .join(
            sh_b.select(
                F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")
            ),
            "doc_b",
        )
    )
    return paired.select(
        "doc_a",
        "doc_b",
        F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


#: SimHash banding: 4 bands × 8 bits. By pigeonhole, any pair within
#: hamming distance 3 (< n_bands) agrees on at least one full band, so
#: band-bucketing is EXACT candidate generation for max_hamming <= 3 —
#: no recall loss, unlike MinHash-LSH banding.
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def simhash_band_keys(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash32",
    with_refine: bool = False,
) -> DataFrame:
    """Explode each fingerprint into (band_id, band_val) bucket keys —
    map-only, same shape as the MinHash :func:`lsh_band_keys`.
    ``with_refine`` adds the NEXT band's value as ``refine_key`` for
    the bucket-cap overflow path."""
    mask = (1 << SIMHASH_BAND_BITS) - 1
    cols = [
        F.col(id_col),
        "band_id",
        F.expr(f"shiftright({sim_col}, band_id * {SIMHASH_BAND_BITS})")
        .bitwiseAND(F.lit(mask))
        .alias("band_val"),
    ]
    if with_refine:
        cols.append(
            F.expr(
                f"shiftright({sim_col}, "
                f"((band_id + 1) % {SIMHASH_BANDS}) * {SIMHASH_BAND_BITS})"
            )
            .bitwiseAND(F.lit(mask))
            .alias("refine_key")
        )
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))
        ).alias("band_id"),
        F.col(sim_col),
    ).select(*cols)


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs: band-bucketed candidate self-join,
    verified by exact hamming distance ``bit_count(a XOR b)``.

    The missing second half of the SimHash flavor (fingerprints alone
    don't find pairs): candidates are generated only within shared
    (band_id, band_val) buckets — O(Σ bucket²) like the MinHash path,
    never all-pairs — and for ``max_hamming < SIMHASH_BANDS`` the
    banding is exact (see :data:`SIMHASH_BANDS`), so the verify step
    only FILTERS, it cannot miss. One integer per doc shuffles; the
    corpus text is read once by the signature aggregate.

    ``bucket_cap`` bounds each band bucket via secondary banding + a
    hard cap (:func:`capped_bucket_keys`) — short or templated corpora
    pile thousands of docs into one band value (measured: a 1,338-doc
    bucket at sf0.1) and the self-join goes quadratic. Capping trades
    the exactness guarantee for a hard cost bound; the dropped
    membership is measured by :func:`bucket_overflow_stats`, never
    silent.
    """
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError(
            f"banding is only exact for max_hamming < {SIMHASH_BANDS}"
        )
    from urban_mobility_data_pipeline_spark.cache import scratch_persist

    # the signature table (one long per doc) serves three consumers —
    # band keys and both verify sides; stage it once so the corpus-wide
    # token explode+aggregate runs once, not three times (same pattern
    # as near_dup_pairs' shingle stage; 3.7s -> ~1.7s at sf0.1)
    sigs = scratch_persist(simhash_signatures(docs, id_col, text_col))
    keys = simhash_band_keys(
        sigs, id_col, with_refine=bucket_cap is not None
    )
    if bucket_cap is not None:
        # long-keyed combine: band_val and the 8-bit refine value pack
        # into one integer (band_id + n_bands disambiguates the space)
        mask_plus_1 = 1 << SIMHASH_BAND_BITS
        keys = capped_bucket_keys(
            keys.withColumnRenamed("band_val", "band_key"),
            id_col,
            bucket_cap,
            SIMHASH_BANDS,
            combine=lambda k, r: k * mask_plus_1 + r,
        ).withColumnRenamed("band_key", "band_val")
    cands = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    sa = sigs.select(
        F.col(id_col).alias("doc_a"), F.col("simhash32").alias("__ha")
    )
    sb = sigs.select(
        F.col(id_col).alias("doc_b"), F.col("simhash32").alias("__hb")
    )
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
    algorithm: str = "label",
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected edge list → one
    ``(node, label)`` row per node, label = min node id in the
    component. This is what turns near-dup *pairs* into dedup
    *clusters*: keep ``node == label`` as the representative, drop the
    rest.

    Two interchangeable algorithms (``algorithm=``):

    - ``"label"`` (default): iterative min-label propagation. Each
      round is one shuffle join (edges ⋈ labels) plus one
      map-side-combined min aggregation; rounds needed = component
      diameter. LSH near-dup clusters are shallow (dup groups are
      cliques or near-cliques), so 2-3 rounds converge — the right
      default for dedup.
    - ``"star"``: alternating large-star/small-star edge contraction
      (Kiveris et al., "Connected Components in MapReduce and Beyond",
      2014) — O(log n) rounds regardless of diameter. The scale path
      for adversarial long-chain graphs where label propagation would
      need O(diameter) rounds.
    - ``"auto"``: the cheap heuristic for unknown topology — run label
      propagation up to 8 rounds (covers every realistic dup-cluster
      graph); if still unconverged, contract edges through the current
      labels and finish with star on the (strictly smaller) contracted
      graph, composing the two label maps. Pays one bounded probe
      instead of guessing the diameter up front.

    Every round of either algorithm is materialized to scratch parquet
    (see :func:`_round_scratch`) — exactly like the original MapReduce
    formulations materialize between jobs. This is deliberate, not a
    local-mode workaround: iterating lazily (even with ``.persist``,
    which caches block data but does NOT truncate the logical plan)
    grows the analyzed plan every round, and past ~10 rounds the
    analyzer and accumulated broadcasts — not the data — become the
    bottleneck. Materializing keeps every round O(current edge/label
    set), makes rounds independently fault-tolerant, and lets the
    driver probe convergence from a tiny finished table. The
    convergence probe is additionally batched (every 2nd round): one
    extra cheap round costs less than a driver round-trip per round on
    a latency-bound iterative job.

    ``stats``: pass a dict to receive
    ``{"rounds": n, "algorithm": …, "converged": bool}``.
    """
    if algorithm == "star":
        return _star_components(
            edges, nodes, id_col, a_col, b_col, max_iterations, stats
        )
    if algorithm == "auto":
        return _auto_components(
            edges, nodes, id_col, a_col, b_col, max_iterations, stats
        )
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}")

    spark = edges.sparkSession
    materialize = _round_scratch(spark)
    # the edge list is consumed once per round — stage it so the
    # upstream plan (e.g. the whole LSH+verify pipeline) runs once
    sym = materialize(
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(
                F.col(b_col).alias("src"), F.col(a_col).alias("dst")
            )
        ),
        "edges",
    )
    # the initial label table is a pure projection of nodes — not worth
    # a materialization job; round 1's write anchors the iteration
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    )

    def label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]

    prev_sum = label_sum(labels)
    rounds, converged = 0, False
    for i in range(max_iterations):
        prop = sym.join(labels, F.col("src") == F.col("node")).select(
            F.col("dst").alias("node"), F.col("label")
        )
        labels = materialize(
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label")),
            f"labels_{i + 1}",
            rotate=True,
        )
        rounds += 1
        # labels only ever decrease, so the total strictly drops until
        # the fixpoint — equality across a probe gap means no node
        # changed in ANY gap round. Probe rounds 1-2 densely (dup
        # cliques converge by round 2 — the common case must detect it
        # immediately), then every 2nd round to halve driver
        # round-trips on a deep graph's convergent tail.
        if i < 2 or (i % 2 == 1) or (i == max_iterations - 1):
            cur_sum = label_sum(labels)
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
    _require_converged(converged, rounds, stats)
    if stats is not None:
        stats.update(
            {"rounds": rounds, "algorithm": "label", "converged": converged}
        )
    return labels


def _auto_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    max_iterations: int,
    stats: dict | None,
) -> DataFrame:
    """``algorithm="auto"``: bounded label probe, then star fallback on
    the label-contracted graph. Label work is never wasted — the
    contracted graph has one node per surviving label, so star runs on
    a strictly smaller problem and the final map composes both."""
    PROBE_ROUNDS = 8
    label_stats: dict = {}
    labels = connected_components(
        edges, nodes, id_col, a_col, b_col,
        max_iterations=PROBE_ROUNDS, algorithm="label", stats=label_stats,
    )
    if label_stats["converged"]:
        if stats is not None:
            stats.update(dict(label_stats, algorithm="auto+label"))
        return labels
    # contract: every edge's endpoints become their current labels
    la = labels.withColumnRenamed("node", "__n")
    contracted = (
        edges.select(F.col(a_col).alias("ea"), F.col(b_col).alias("eb"))
        .join(la, F.col("ea") == F.col("__n"))
        .select(F.col("label").alias("ca"), "eb")
        .join(
            la.withColumnRenamed("label", "lb"), F.col("eb") == F.col("__n")
        )
        .select(F.col("ca").alias("doc_a"), F.col("lb").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    meta_nodes = labels.select(F.col("label").alias("doc_id")).distinct()
    star_stats: dict = {}
    meta = _star_components(
        contracted, meta_nodes, "doc_id", "doc_a", "doc_b",
        max_iterations, star_stats,
    ).withColumnsRenamed({"node": "__mn", "label": "__ml"})
    out = labels.join(meta, F.col("label") == F.col("__mn")).select(
        "node", F.col("__ml").alias("label")
    )
    _require_converged(
        star_stats["converged"], label_stats["rounds"] + star_stats["rounds"], stats
    )
    if stats is not None:
        stats.update(
            {
                "rounds": label_stats["rounds"] + star_stats["rounds"],
                "algorithm": "auto+star",
                "converged": star_stats["converged"],
            }
        )
    return out


def _round_scratch(spark):
    """Per-call scratch store for iterative rounds: returns a
    ``materialize(df, tag, rotate=)`` that writes the round to parquet
    and returns a fresh scan of it, truncating lineage.

    ``rotate=True`` marks the write as superseding the previous rotating
    write (round N replaces round N-1): once round N's files are on
    disk, nothing references round N-1, so its directory is deleted
    immediately. A repeated-CC session therefore holds O(1) scratch per
    live call — only the pinned (non-rotating) stage inputs plus the
    latest round — instead of every round of every call. The returned
    label plan reads the final round's files, so the scratch dir itself
    must outlive the call; atexit reclaims it as the backstop."""
    import atexit
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="umdp_cc_rounds_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    prev_rotating: list[str | None] = [None]

    def materialize(df: DataFrame, tag: str, rotate: bool = False) -> DataFrame:
        path = f"{scratch}/{tag}"
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        if rotate:
            if prev_rotating[0] is not None:
                shutil.rmtree(prev_rotating[0], ignore_errors=True)
            prev_rotating[0] = path
        return out

    return materialize


def _require_converged(converged: bool, rounds: int, stats: dict | None) -> None:
    """Partial labels from an exhausted iteration cap are
    indistinguishable from correct output — a caller that did not opt
    into inspection via ``stats`` must not silently receive split
    clusters."""
    if not converged and stats is None:
        raise RuntimeError(
            f"connected_components did not converge within {rounds} rounds; "
            "raise max_iterations, use algorithm='auto'/'star' (O(log n) "
            "rounds), or pass stats={} to opt into inspecting partial labels"
        )


def _star_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    max_iterations: int,
    stats: dict | None,
) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al. 2014 §3).

    Each round contracts the edge set toward stars centered on
    component minima: **large-star** connects every neighbor larger
    than ``u`` to ``min(Γ(u) ∪ {u})``; **small-star** re-points ``u``
    and its not-larger neighbors at that minimum. Both are one
    groupBy-min + one self-join per pass — the same shuffle primitives
    as label propagation, but the edge set (not a label table)
    contracts, giving O(log n) rounds on any topology. Convergence =
    the canonical edge set's (count, hash-sum) fingerprint is stable
    across a round; at fixpoint every edge is ``(node, component
    min)``. Rounds are materialized via :func:`_round_scratch` — a
    star round references its input ~8× (two symmetrize unions + two
    self-joins), so lazy chaining would grow the plan geometrically."""

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        return (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        d = (
            e.select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        mins = d.groupBy("a").agg(F.min("b").alias("m"))
        return (
            d.join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(mins.select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def fingerprint(e: DataFrame) -> tuple:
        row = e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    spark = edges.sparkSession
    materialize = _round_scratch(spark)
    cur = materialize(
        edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        "round_0",
        rotate=True,
    )
    prev_fp, rounds, converged = fingerprint(cur), 0, False
    for i in range(max_iterations):
        cur = materialize(
            small_star(large_star(cur)), f"round_{i + 1}", rotate=True
        )
        rounds += 1
        fp = fingerprint(cur)
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    _require_converged(converged, rounds, stats)
    if stats is not None:
        stats.update(
            {"rounds": rounds, "algorithm": "star", "converged": converged}
        )
    # at fixpoint every edge is (node, component-min); minima and
    # isolated nodes label themselves
    owners = cur.groupBy("a").agg(F.min("b").alias("lbl"))
    out = (
        nodes.select(F.col(id_col).alias("node"))
        .join(owners, F.col("node") == F.col("a"), "left")
        .select(
            "node", F.coalesce(F.col("lbl"), F.col("node")).alias("label")
        )
    )
    return out
