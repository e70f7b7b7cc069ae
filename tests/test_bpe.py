"""Distributed BPE training vs a pure-Python reference implementation
of Sennrich et al.'s algorithm on the same corpus — merge list must
match rule for rule, count for count."""

from __future__ import annotations

from urban_mobility_data_pipeline_spark.extensions.bpe import (
    EOW,
    apply_bpe,
    learn_bpe,
    word_frequencies,
)


def _gold_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE: dict-based, sequential scan, same tiebreak."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        key = tuple(list(w) + [EOW])
        vocab[key] = vocab.get(key, 0) + f
    merges = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, left + right, cnt))
        new: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + f
        vocab = new
    return merges, vocab


def _gold_encode(word: str, merges) -> list[str]:
    syms = list(word) + [EOW]
    for _, left, right, merged, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_learn_bpe_matches_gold_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = {
        r["word"]: r["freq"] for r in word_frequencies(docs).collect()
    }
    got = learn_bpe(docs, n_merges=12)
    want, _ = _gold_bpe(wf, 12)
    assert [
        (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
        for m in got
    ] == want


def test_learn_bpe_overlapping_runs(spark):
    """aaaa under merge (a,a) → [aa, aa]: the fold and the sequential
    scan must agree on overlap resolution, and the learned second rule
    must count post-merge symbols, not raw chars."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aa")], "doc_id long, text string"
    )
    wf = {"aaaa": 2, "aa": 1}
    got = learn_bpe(docs, n_merges=3)
    want, _ = _gold_bpe(wf, 3)
    assert [
        (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
        for m in got
    ] == want


def test_apply_bpe_token_counts_match_gold(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = learn_bpe(docs, n_merges=12)
    gold_rules = [
        (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
        for m in merges
    ]
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_chars"])
        for r in apply_bpe(docs, merges).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in row["text"].strip().lower().split() if w]
        n_toks = sum(len(_gold_encode(w, gold_rules)) for w in words)
        n_chars = sum(len(w) for w in words)
        assert got[row["doc_id"]] == (n_toks, n_chars), row["doc_id"]


def test_learn_bpe_batched_matches_gold_on_testdata(spark, sf_dir):
    """batch_size>1 must produce the IDENTICAL rule list (rank, pair,
    count) as the sequential trainer — the batch trim is provably
    sequential-equivalent, not an approximation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = {
        r["word"]: r["freq"] for r in word_frequencies(docs).collect()
    }
    want, _ = _gold_bpe(wf, 24)
    for bs in (4, 16):
        got = learn_bpe(docs, n_merges=24, batch_size=bs)
        assert [
            (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
            for m in got
        ] == want, f"batch_size={bs}"


def test_learn_bpe_batched_tie_and_conflict_heavy(spark):
    """Adversarial corpora where naive batching diverges: heavy count
    ties, chained merges (ab then ab+c), and a merged string colliding
    with a later-learnable symbol. The strict c_bound trim must keep
    every batch sequential-exact."""
    corpora = [
        # ties everywhere: every bigram of 'abcd' appears equally often
        [(1, "abcd abcd abcd"), (2, "dcba dcba")],
        # chained: (a,b)->ab dominates, then (ab,c) immediately next —
        # conflicts within a batch, must split across rounds
        [(1, "abc abc abc abc ab ab"), (2, "cab cab")],
        # overlap runs + EOW-adjacent merges
        [(1, "aaaa aaa aa a"), (2, "baab baab ab")],
        # merged-string collision shape: 'xy' arises both as a merge
        # result and as adjacent symbols elsewhere
        [(1, "xy xy xy x y"), (2, "zxy zxy wxy")],
    ]
    for rows in corpora:
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        wf = {
            r["word"]: r["freq"]
            for r in word_frequencies(docs).collect()
        }
        want, _ = _gold_bpe(wf, 10)
        got = learn_bpe(docs, n_merges=10, batch_size=8)
        assert [
            (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
            for m in got
        ] == want, rows


def test_learn_bpe_batched_randomized_equivalence(spark):
    """Seeded random corpora over a 3-letter alphabet (maximal pair
    interaction) — batched and gold sequential must agree exactly."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
            for _ in range(40)
        ]
        docs = spark.createDataFrame(
            [(i, " ".join(words[i::4])) for i in range(4)],
            "doc_id long, text string",
        )
        wf = {
            r["word"]: r["freq"]
            for r in word_frequencies(docs).collect()
        }
        want, _ = _gold_bpe(wf, 15)
        got = learn_bpe(docs, n_merges=15, batch_size=6)
        assert [
            (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
            for m in got
        ] == want, seed


def test_learn_bpe_fast_mode_conflict_free_identical(spark):
    """strict=False is exact whenever the batch is conflict-free.
    Hand-verified corpus: (a,b) cnt 6 and (c,d) cnt 5 are disjoint and
    both strictly dominate every derived pair ((ab,u)/(ab,v) cnt 3) and
    every other initial pair, so fast mode's first round batches both
    — and sequential learns exactly those two, same counts."""
    rows = [(1, "abu abu abu abv abv abv cdw cdw cdw cdx cdx")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    want, _ = _gold_bpe(wf, 2)
    assert [(w[1], w[2], w[4]) for w in want] == [
        ("a", "b", 6), ("c", "d", 5)
    ]
    for kw in ({"batch_size": 8, "strict": False}, {"batch_size": 8}):
        got = learn_bpe(docs, n_merges=2, **kw)
        assert [
            (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
            for m in got
        ] == want, kw


def test_learn_bpe_fast_mode_batch_of_one_is_sequential(spark):
    """strict=False with batch_size=1 takes the argmax every round —
    literally the sequential algorithm — even on the tie/conflict-heavy
    adversarial corpus."""
    docs = spark.createDataFrame(
        [(1, "abc abc abc abc ab ab"), (2, "cab cab"), (3, "aaaa aa")],
        "doc_id long, text string",
    )
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    want, _ = _gold_bpe(wf, 8)
    got = learn_bpe(docs, n_merges=8, batch_size=1, strict=False)
    assert [
        (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
        for m in got
    ] == want


def test_learn_bpe_fast_mode_deterministic_and_valid(spark, sf_dir):
    """Fast mode on the real corpus: deterministic across runs, rules
    pairwise-consistent (no duplicate pair, every merged = left+right),
    and the learned rule SET stays usable by apply_bpe."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = learn_bpe(docs, n_merges=16, batch_size=8, strict=False)
    b = learn_bpe(docs, n_merges=16, batch_size=8, strict=False)
    assert [(m["left"], m["right"]) for m in a] == [
        (m["left"], m["right"]) for m in b
    ]
    pairs = [(m["left"], m["right"]) for m in a]
    assert len(set(pairs)) == len(pairs)
    assert all(m["merged"] == m["left"] + m["right"] for m in a)
    counts = apply_bpe(docs, a).collect()
    assert all(r["n_bpe_tokens"] <= r["n_chars"] + 50 for r in counts)


def test_learn_bpe_reliable_checkpoints_do_not_accumulate(spark, tmp_path):
    """checkpoint_dir mode must not leave one directory per merge round
    (Spark never cleans reliable checkpoints by default; a 50k-merge
    run would otherwise hoard 50k copies of the working set). After the
    run the checkpoint_dir must be empty, the rules identical to
    localCheckpoint mode, and the SparkContext checkpoint dir restored."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aa"), (2, "abab ab")], "doc_id long, text string"
    )
    ckpt = tmp_path / "bpe_ckpt"
    orig = spark.sparkContext.getCheckpointDir()
    got = learn_bpe(docs, n_merges=4, checkpoint_dir=str(ckpt))
    base = learn_bpe(docs, n_merges=4)
    assert [
        (m["left"], m["right"], m["freq"]) for m in got
    ] == [(m["left"], m["right"], m["freq"]) for m in base]
    leftovers = sorted(p.name for p in ckpt.glob("round_*"))
    assert leftovers == [], leftovers
    if orig is not None:
        assert spark.sparkContext.getCheckpointDir() == orig


# ---------------------------------------------------------------------------
# driver-side sequential reference (the divergence-bench gold, r10)
# ---------------------------------------------------------------------------
def test_sequential_reference_matches_naive_gold_on_testdata(spark, sf_dir):
    from urban_mobility_data_pipeline_spark.extensions.bpe import (
        sequential_bpe_reference,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    got = sequential_bpe_reference(wf, 25)
    want, _ = _gold_bpe(wf, 25)
    assert [
        (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
        for m in got
    ] == want


def test_sequential_reference_matches_naive_gold_randomized():
    """Incremental heap bookkeeping vs the naive full-rescan reference
    across adversarial vocabularies (overlapping runs, shared symbols,
    count ties)."""
    import random

    from urban_mobility_data_pipeline_spark.extensions.bpe import (
        sequential_bpe_reference,
    )

    rng = random.Random(7)
    alphabet = "abcd"
    for trial in range(20):
        wf = {
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(1, 9))
            ): rng.randint(1, 9)
            for _ in range(rng.randint(3, 30))
        }
        got = sequential_bpe_reference(wf, 40)
        want, _ = _gold_bpe(wf, 40)
        assert [
            (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
            for m in got
        ] == want, (trial, wf)


def test_bpe_encode_word_reproduces_training_segmentation():
    """Encoding a training word with the learned ranks reproduces the
    segmentation the trainer left it with (the defining property of
    rank-ordered BPE encode)."""
    from urban_mobility_data_pipeline_spark.extensions.bpe import (
        bpe_encode_word,
        sequential_bpe_reference,
    )

    wf = {"lowest": 5, "lower": 4, "low": 7, "newest": 6, "newer": 3}
    merges = sequential_bpe_reference(wf, 12)
    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    for w in wf:
        enc = bpe_encode_word(w, ranks)
        gold = _gold_encode(
            w,
            [
                (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
                for m in merges
            ],
        )
        assert enc == gold, (w, enc, gold)


def test_on_batch_reports_realized_batch_sizes(spark, sf_dir):
    """on_batch fires once per Spark round with the realized batch
    size; the sizes sum to the learned rule count and batch_size=1
    realizes exactly 1 per round."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes: list[int] = []
    merges = learn_bpe(
        docs, n_merges=10, batch_size=4, strict=False,
        on_batch=sizes.append,
    )
    assert sum(sizes) == len(merges) == 10
    assert all(s >= 1 for s in sizes)
    seq_sizes: list[int] = []
    learn_bpe(docs, n_merges=5, on_batch=seq_sizes.append)
    assert seq_sizes == [1] * 5
