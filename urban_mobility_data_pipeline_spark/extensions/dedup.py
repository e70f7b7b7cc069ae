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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: MinHash configuration: K hashes, banded B bands × R rows (K = B*R).
MINHASH_K = 8
LSH_BANDS = 4
LSH_ROWS = 2

SIMHASH_BITS = 32


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles of lowercased whitespace tokens; short
    docs (<n words) contribute their whole text as one shingle."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.lower(F.trim(c))
    w = F.split(norm, r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(w) >= n, grams).otherwise(F.array(norm))
    )


def _seeded_min(shingles: Column, j: int) -> Column:
    # NB: the lambda must take exactly one parameter — PySpark treats a
    # second parameter as the element *index*.
    prefix = f"{j}|"
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(prefix), s)))
    )


def minhash_cols(shingles: Column, k: int = MINHASH_K) -> list[Column]:
    """K independent minhashes: min over the shingle set of
    md5('<seed>|'+shingle). Lexicographic min over a uniform hex hash is
    a permutation-min — the classic MinHash estimator."""
    return [_seeded_min(shingles, j).alias(f"mh_{j}") for j in range(k)]


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """doc_id + mh_0..mh_{K-1} signature table. Narrow map-only plan."""
    sh = word_shingles(text_col)
    return docs.select(F.col(id_col), *minhash_cols(sh))


def lsh_band_keys(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode signatures into (band_id, band_key) rows: band_key =
    md5(concat of the band's R minhashes). Docs sharing any band_key are
    candidate near-dups."""
    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat(*[F.col(f"mh_{b * LSH_ROWS + r}") for r in range(LSH_ROWS)])
            ).alias("band_key"),
        )
        for b in range(LSH_BANDS)
    ]
    return sigs.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_id", "band.band_key")


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band.
    The self-join is on (band_id, band_key) — a co-partitioned shuffle
    join whose width is the bucket sizes, not the corpus."""
    keys = lsh_band_keys(minhash_signatures(docs, id_col, text_col), id_col)
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
) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard ≥ threshold.
    Shingles are recomputed per side via a re-join of the docs table —
    at scale the candidate list is tiny relative to the corpus, so the
    two joins broadcast the candidates, never reshuffling the corpus."""
    cands = lsh_candidate_pairs(docs, id_col, text_col)
    sh = docs.select(
        F.col(id_col), word_shingles(text_col).alias("shingles")
    )
    paired = (
        cands.join(
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


def simhash(text: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """32-bit SimHash over whitespace tokens.

    Per token: v = first 8 hex chars of md5(token) parsed base-16
    (32 bits). Per bit i: weight Σ over tokens of (2·bit_i(v) − 1);
    final bit i = (Σ > 0); fingerprint = Σ bit_i·2^i. Integer-exact, so
    any md5-capable engine replays it bit-for-bit.
    """
    c = F.col(text) if isinstance(text, str) else text
    tokens = F.split(F.lower(F.trim(c)), r"\s+")
    vals = F.transform(
        tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    def bit_folder(i: int):
        # closure factory: aggregate's merge lambda must stay 2-ary
        return lambda acc, v: acc + (
            F.shiftright(v, i).bitwiseAND(F.lit(1)) * 2 - 1
        )

    total = F.lit(0).cast("long")
    for i in range(bits):
        s_i = F.aggregate(vals, F.lit(0).cast("long"), bit_folder(i))
        total = total + F.when(s_i > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return total
