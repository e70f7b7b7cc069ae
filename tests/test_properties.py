"""Property-based tests (hypothesis) for engine invariants that golden
fixtures can't sweep: SCD2 under arbitrary batch sequences, cleaning
idempotence, Jaccard bounds."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.operators.merge import MergeTable
from urban_mobility_data_pipeline_spark.operators.scd import (
    scd2_apply,
    with_scd2_columns,
)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a "run" = list of batches; each batch maps key -> value version
_batches = st.lists(
    st.dictionaries(
        st.integers(min_value=1, max_value=4),  # keys
        st.sampled_from(["a", "b", "c"]),       # values (hash input)
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=4,
)


@_slow
@given(batches=_batches)
def test_scd2_invariants_hold_for_any_batch_sequence(spark, tmp_path_factory, batches):
    """For EVERY sequence of batches: ≤1 current row per key; closed
    rows' valid_to equals a later version's valid_from; latest value
    wins; version count per key ≤ number of distinct value changes."""
    t = MergeTable(spark, str(tmp_path_factory.mktemp("scd2prop") / "t"))
    t0 = dt.datetime(2024, 1, 1)
    latest_value: dict[int, str] = {}
    for i, batch in enumerate(batches):
        ts = t0 + dt.timedelta(days=i)
        rows = [(k, v, "z", ts) for k, v in sorted(batch.items())]
        df = with_scd2_columns(
            spark.createDataFrame(
                rows, "id long, name string, city string, raw_loaded_at timestamp"
            ),
            hash_cols=["name", "city"],
            order_col="raw_loaded_at",
        )
        scd2_apply(t, df, ["id"], "raw_loaded_at")
        latest_value.update(batch)

    out = t.read().collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["id"], []).append(r)
    for k, versions in by_key.items():
        currents = [r for r in versions if r["is_current"]]
        assert len(currents) == 1, f"key {k}: {len(currents)} currents"
        assert currents[0]["name"] == latest_value[k]
        # history chain: every closed row ends where another begins
        closed = sorted(
            (r for r in versions if not r["is_current"]),
            key=lambda r: r["valid_from"],
        )
        for r in closed:
            assert r["valid_to"] is not None
            assert any(
                v["valid_from"] == r["valid_to"] for v in versions
            ), f"key {k}: dangling valid_to"


@given(
    s=st.text(
        alphabet=st.characters(blacklist_categories=["Cs"]), max_size=40
    )
)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scrub_null_likes_idempotent(spark, s):
    """scrub(scrub(x)) == scrub(x) for arbitrary unicode input."""
    from urban_mobility_data_pipeline_spark.operators.cleaning import (
        scrub_null_likes,
    )

    df = spark.createDataFrame([(s,)], "x string")
    once = df.select(scrub_null_likes("x").alias("x"))
    twice = once.select(scrub_null_likes("x").alias("x"))
    assert once.first()["x"] == twice.first()["x"]


def test_jaccard_bounds_and_symmetry(spark, sf_dir):
    """0 ≤ J ≤ 1; J(a,a) = 1; J symmetric — on real document shingles."""
    from urban_mobility_data_pipeline_spark.extensions.dedup import (
        jaccard,
        shingles_df,
    )

    sh = shingles_df(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30))
    a = sh.select(F.col("doc_id").alias("ia"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("ib"), F.col("shingles").alias("sb"))
    pairs = a.crossJoin(b).select(
        "ia", "ib",
        jaccard(F.col("sa"), F.col("sb")).alias("jab"),
        jaccard(F.col("sb"), F.col("sa")).alias("jba"),
    )
    rows = pairs.collect()
    for r in rows:
        assert 0.0 <= r["jab"] <= 1.0
        assert r["jab"] == r["jba"]
        if r["ia"] == r["ib"]:
            assert r["jab"] == 1.0


# PII injection: counts match injections, redaction removes them all.
_pii_literals = {
    "email": st.sampled_from(
        ["alice@example.com", "b.ob+x@sub.dom.org", "z9@a-b.co"]
    ),
    "phone": st.sampled_from(["555-867-5309", "212.555.0100"]),
    "ssn": st.sampled_from(["123-45-6789", "987-65-4321"]),
    "ipv4": st.sampled_from(["10.0.0.1", "192.168.255.254"]),
}
_clean_word = st.sampled_from(
    ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel"]
)
_injections = st.lists(
    st.tuples(st.sampled_from(sorted(_pii_literals)), st.integers(0, 7)),
    min_size=0,
    max_size=4,
)


@given(words=st.lists(_clean_word, min_size=1, max_size=8), inj=_injections)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pii_counts_match_injections(spark, words, inj):
    """For any clean word salad with k PII literals spliced in at
    arbitrary positions: every per-kind count equals the number of
    injections of that kind, and redaction leaves no original literal
    behind while preserving the clean words."""
    import random

    from urban_mobility_data_pipeline_spark.functions import pii

    rnd = random.Random(42)
    tokens = list(words)
    injected: list[tuple[str, str]] = []
    for kind, pos in inj:
        # draw deterministically from the strategy's sample space
        choices = {
            "email": ["alice@example.com", "b.ob+x@sub.dom.org", "z9@a-b.co"],
            "phone": ["555-867-5309", "212.555.0100"],
            "ssn": ["123-45-6789", "987-65-4321"],
            "ipv4": ["10.0.0.1", "192.168.255.254"],
        }[kind]
        lit = choices[rnd.randrange(len(choices))]
        tokens.insert(min(pos, len(tokens)), lit)
        injected.append((kind, lit))
    text = " ".join(tokens)
    df = spark.createDataFrame([(text,)], "text string")
    counts = pii.pii_counts("text")
    row = df.select(
        *[c.alias(k) for k, c in counts.items()],
        pii.redact_pii("text").alias("red"),
    ).first()
    from collections import Counter

    want = Counter(kind for kind, _ in injected)
    # ssn literals are also phone-shaped (ddd-dd-dddd vs ddd-ddd-dddd
    # differ, so they are NOT double counted) — assert exact per kind
    for kind in _pii_literals:
        assert row[f"n_{kind}"] == want.get(kind, 0), (text, kind)
    for _, lit in injected:
        assert lit not in row.red, (text, lit)
    for w in words:
        assert w in row.red


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lengths=st.lists(
        st.integers(min_value=0, max_value=5000), min_size=1, max_size=24
    )
)
def test_packed_sequences_invariants_any_lengths(spark, tmp_path_factory, lengths):
    """Concat-and-chop packing holds its invariants for ARBITRARY doc
    lengths (packing v2): per-(shard,bin) token sums are exactly ctx
    except each shard's tail, pieces reassemble every doc in order, and
    no doc is dropped — including empty docs and docs many times the
    context length."""
    from collections import defaultdict

    from urban_mobility_data_pipeline_spark.plans.catalog import QUERIES
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        PACK_CTX_TOKENS,
    )

    tmp = tmp_path_factory.mktemp("packprop")
    rows = [
        (i + 1, " ".join(f"w{j}" for j in range(n)), "en", "s", 0)
        for i, n in enumerate(lengths)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    out = QUERIES["documents_packed_sequences"](spark, str(tmp)).collect()
    # whitespace tokenizer: split('') == [''] => an empty doc carries 1
    expected = {i + 1: max(n, 1) for i, n in enumerate(lengths)}
    by_doc = defaultdict(list)
    for r in out:
        by_doc[r.doc_id].append(r)
    assert set(by_doc) == set(expected)
    for doc_id, pieces in by_doc.items():
        pieces.sort(key=lambda r: r.piece_id)
        assert sum(p.n_piece_tokens for p in pieces) == expected[doc_id]
        off = 0
        for p in pieces:
            assert p.doc_offset == off
            off += p.n_piece_tokens
    bins = defaultdict(int)
    for r in out:
        bins[(r.shard, r.bin)] += r.n_piece_tokens
    tail = {}
    for shard, b in bins:
        tail[shard] = max(tail.get(shard, -1), b)
    for (shard, b), total in bins.items():
        if b == tail[shard]:
            assert 0 < total <= PACK_CTX_TOKENS
        else:
            assert total == PACK_CTX_TOKENS
