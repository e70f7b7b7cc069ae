"""Statistical analytics ops: RFM segmentation, chi-square independence,
PSI drift — gold-value and property checks beyond the DuckDB oracles."""

from __future__ import annotations

import numpy as np

from urban_mobility_data_pipeline_spark.plans.analytics import (
    customer_rfm_segments,
    orders_priority_weekday_chi2,
)
from urban_mobility_data_pipeline_spark.plans.llm_ops import (
    corpus_source_drift_psi,
)


def test_chi2_matches_numpy(spark, sf_dir):
    got = orders_priority_weekday_chi2(spark, sf_dir).collect()[0]
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderpriority", "o_orderdate")
        .collect()
    )
    from collections import Counter

    obs = Counter(
        (r.o_orderpriority, (r.o_orderdate.date().toordinal() - 719163) % 7)
        for r in rows
    )
    prios = sorted({p for p, _ in obs})
    wds = sorted({w for _, w in obs})
    m = np.array([[obs.get((p, w), 0) for w in wds] for p in prios], float)
    e = m.sum(1, keepdims=True) @ m.sum(0, keepdims=True) / m.sum()
    chi2 = ((m - e) ** 2 / e).sum()
    assert abs(chi2 - got.chi2) < 1e-3, (chi2, got.chi2)
    assert got.dof == (len(prios) - 1) * (len(wds) - 1)
    assert got.n == int(m.sum())


def test_rfm_scores_are_balanced_quintiles(spark, sf_dir):
    rows = customer_rfm_segments(spark, sf_dir).collect()
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        from collections import Counter

        c = Counter(getattr(r, col) for r in rows)
        assert set(c) == {1, 2, 3, 4, 5}
        assert max(c.values()) - min(c.values()) <= 1, (col, c)
    assert all(1 <= r.r_score <= 5 for r in rows)
    # champion implies all three scores high; hibernating implies stale
    for r in rows:
        if r.segment == "champion":
            assert r.r_score >= 4 and r.f_score >= 4 and r.m_score >= 4
        if r.segment == "hibernating":
            assert r.r_score <= 2
    assert n == len({r.c_custkey for r in rows})


def test_psi_is_nonnegative_and_self_consistent(spark, sf_dir):
    rows = corpus_source_drift_psi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.psi >= 0, r
        tier = (
            "shifted" if r.psi >= 0.25 else "watch" if r.psi >= 0.1 else "stable"
        )
        assert r.drift_tier == tier, r


def test_ks_matches_numpy_and_detects_drift(spark, sf_dir, tmp_path):
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        documents_length_ks_test,
    )

    # exact-integer agreement with a NumPy ECDF on the real corpus
    got = {r.source: r for r in documents_length_ks_test(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    values = sorted({d.n_chars for d in docs})
    for src in {d.n_chars: None for d in docs} and {d.source for d in docs}:
        a = sorted(d.n_chars for d in docs if d.source == src)
        b = sorted(d.n_chars for d in docs if d.source != src)
        na, nb = len(a), len(b)
        import bisect

        num = max(
            abs(bisect.bisect_right(a, v) * nb - bisect.bisect_right(b, v) * na)
            for v in values
        )
        assert got[src].ks_num == num, src
        assert got[src].n_source == na

    # a clearly shifted source must trip the alpha=0.05 verdict
    synth = spark.createDataFrame(
        [(i, "x" * 10, "en", "shifted", 500 + (i % 7)) for i in range(200)]
        + [(1000 + i, "x" * 10, "en", f"base{i % 4}", 100 + (i % 9)) for i in range(800)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    synth.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {r.source: r for r in documents_length_ks_test(spark, str(tmp_path)).collect()}
    assert rows["shifted"].verdict == "drifted", rows["shifted"]
    assert rows["shifted"].ks == 1.0  # disjoint supports => maximal distance
    # (the base sources ALSO drift here — their "rest" is 25% shifted
    # docs — which is the correct reading, so the negative control is a
    # separate iid corpus)
    iid = spark.createDataFrame(
        [
            (i, "x" * 10, "en", f"s{i % 4}", 100 + (i * 13 % 50))
            for i in range(1000)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    iid.write.mode("overwrite").parquet(f"{tmp_path}/iid/documents.parquet")
    rows = documents_length_ks_test(spark, f"{tmp_path}/iid").collect()
    assert all(r.verdict == "same_dist" for r in rows), rows


def test_gini_matches_numpy(spark, sf_dir):
    from urban_mobility_data_pipeline_spark.plans.analytics import (
        segment_spend_gini,
    )

    got = {r.segment: r for r in segment_spend_gini(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    from collections import defaultdict

    spend = defaultdict(lambda: defaultdict(int))
    for o in orders:
        spend[cust[o.o_custkey]][o.o_custkey] += round(o.o_totalprice * 100)
    for seg, per in spend.items():
        xs = np.sort(np.array(list(per.values()), dtype=np.int64))
        n = len(xs)
        g = (2 * np.sum((np.arange(1, n + 1)) * xs) - (n + 1) * xs.sum()) / (
            n * xs.sum()
        )
        assert abs(g - got[seg].gini) < 1e-6, seg
        assert got[seg].n_customers == n
        assert 0 <= got[seg].gini < 1


def test_mannwhitney_matches_bruteforce(spark, sf_dir):
    from urban_mobility_data_pipeline_spark.plans.llm_ops import (
        documents_length_mannwhitney,
    )

    got = {
        r.source: r for r in documents_length_mannwhitney(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for src in {d.source for d in docs}:
        a = [d.n_chars for d in docs if d.source == src]
        b = sorted(d.n_chars for d in docs if d.source != src)
        import bisect

        u2 = sum(
            2 * bisect.bisect_left(b, x)
            + (bisect.bisect_right(b, x) - bisect.bisect_left(b, x))
            for x in a
        )
        assert got[src].u2 == u2, src
        assert got[src].n_source == len(a)
        # z self-consistency against the emitted integers
        import math

        na, nb = len(a), len(b)
        z = (u2 - na * nb) / (2.0 * math.sqrt(na * nb * (na + nb + 1) / 12.0))
        assert abs(z - got[src].z) < 5e-4
