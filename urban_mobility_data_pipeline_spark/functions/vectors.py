"""Vector math over ``array<float>`` embedding columns (LLM-pipeline
extension, SURVEY.md §7 phase 6).

Everything is built-in higher-order functions (``zip_with`` /
``aggregate`` / ``transform``) — JVM-side, no Python, no shuffle — so a
brute-force scan scales linearly and an LSH/IVF bucketing (see
``extensions.similarity``) turns it into a pruned join.

Accumulation is an ordered left fold in double precision, which makes the
result bit-reproducible across engines that fold in array order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Ordered-fold double-precision dot product."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def literal_vector(values: Sequence[float]) -> Column:
    """Embed a query vector as an array literal (broadcast by value into
    the plan — no join needed for single-vector search)."""
    return F.array(*[F.lit(float(v)) for v in values])


def hyperplane_sign_bucket(vec: Column | str, hyperplanes: Sequence[Sequence[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit p = (vec · H_p) >= 0; bucket =
    Σ bit_p · 2^p. With deterministic hyperplanes this is a stable int in
    [0, 2^P) — the scale path for ANN: group vectors by bucket, search
    within buckets (+ optionally neighboring buckets)."""
    bucket = F.lit(0)
    for p, plane in enumerate(hyperplanes):
        bit = (dot(vec, literal_vector(plane)) >= 0).cast("int")
        bucket = bucket + bit * F.lit(1 << p)
    return bucket
