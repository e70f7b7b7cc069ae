"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the "train the tokenizer on the corpus" slot of a
large-scale training-data pipeline, additive beyond the reference.

The classic algorithm is inherently iterative (each merge rule depends
on the counts AFTER the previous merge), so the Spark-first shape is:

1. ONE pass over the corpus folds it to the word-frequency table —
   Zipf-bounded (distinct words, not tokens), orders of magnitude
   smaller than 100 TB of text. This is the only full-corpus scan.
2. Every merge round runs on that small table only: adjacent-pair
   counts (explode + map-side-combined groupBy), a 1-row argmax
   ``collect`` (inherent — the winning pair must become a literal in
   the next round's rewrite expression; this is the PageRank-style
   justified driver round-trip, 1 row per round, never the data), and
   a lambda-``aggregate`` rewrite of the symbol arrays (pure JVM,
   no UDF).
3. Lineage is cut every round by persisting the rewritten table and
   dropping the previous one — the same lesson as the connected-
   components rounds in extensions/dedup.py.

Left-to-right greedy pair replacement matches the reference algorithm:
the fold merges ``(left, right)`` when the accumulator's LAST symbol is
``left`` — and after a merge the last symbol becomes ``left+right``,
which can never equal ``left`` again (``right`` is non-empty), so no
double-consume; overlapping runs like ``aaaa`` under ``(a,a)`` resolve
to ``aa aa`` in both this fold and the sequential scan.

Production tokenizers learn 30k-50k merges; at one Spark job per merge
that is the cost ceiling of the sequential formulation. ``learn_bpe``
therefore batches PROVABLY-SEQUENTIAL-EQUIVALENT merges per round
(``batch_size > 1``): collect the top-k ranked pairs once, greedily
select a prefix of pairwise symbol-disjoint pairs, and keep only those
whose count strictly exceeds the first conflicting pair's count. Why
that is exact (not approximate):

* merging ``(a, b) → ab`` only changes counts of pairs that SHARE a
  symbol with it — ``(x, a)`` loses the occurrences where its ``a``
  merged away, and the new pairs ``(x, ab)`` / ``(ab, y)`` are bounded
  by ``count(x, a)`` / ``(b, y)`` respectively, all of which conflict
  with ``(a, b)``. Pairs disjoint from ``{a, b, ab}`` keep their exact
  counts, so a batch member's recorded count IS its count at its
  sequential moment;
* therefore every contender that could outrank a batch member during
  the sequential replay of the batch is bounded by the highest count
  among conflicting pairs — the FIRST conflict in rank order — and the
  strict ``count > c_bound`` trim guarantees no contender ever wins a
  batch member's slot (ties included, since the bound is strict);
* the one string-keyed hazard — the merged token ``l+r`` colliding
  with an already-existing symbol (only possible against ``EOW`` or a
  previously learned merge result, since initial symbols are single
  characters) — is checked driver-side against the learned-merge set
  and demotes the candidate to a conflict stop.

The batch then applies as ONE composed rewrite pass (disjointness makes
order irrelevant), so the per-round driver round-trip amortizes over
``≈batch_size`` rules. The selection degrades gracefully: the top-1
pair is always kept (a batch of one is literally the sequential step).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.functions import text as T

#: end-of-word marker so merges never cross word boundaries and the
#: learned vocabulary distinguishes "low" the word from "low" the prefix
EOW = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` — the one full-corpus pass of BPE training."""
    return (
        docs.select(F.explode(T.words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """Seed vocabulary: every word as its character sequence + EOW."""
    return words.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    )


def merge_pair_expr(syms: Column | str, left: str, right: str) -> Column:
    """Rewrite one symbol array under the merge rule ``(left, right) →
    left+right``, left-to-right, as a pure JVM lambda fold."""
    c = F.col(syms) if isinstance(syms, str) else syms
    merged = left + right
    return F.aggregate(
        c,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def merge_pairs_expr(
    syms: Column | str, rules: list[tuple[str, str]]
) -> Column:
    """Rewrite one symbol array under a SET of pairwise symbol-disjoint
    merge rules in a SINGLE left-to-right pass.

    Disjointness makes one pass exactly equal to applying the rules
    one after another: at any position at most one rule can match
    (two rules matching ``(last, x)`` would share a symbol), a merge
    by rule A never creates or destroys a match for rule B (A's merged
    token is not one of B's symbols), and within-rule overlap runs
    (``aaaa`` under ``(a,a)``) resolve exactly as in
    :func:`merge_pair_expr` because the accumulator's last symbol
    becomes the merged token. One pass instead of ``m`` composed folds
    keeps the per-round rewrite cost CONSTANT in the batch size — the
    array is rebuilt once, and the rule lookup is an O(1) literal-map
    probe (``map<left, map<right, merged>>``), all JVM-side."""
    c = F.col(syms) if isinstance(syms, str) else syms
    if len(rules) == 1:
        return merge_pair_expr(c, rules[0][0], rules[0][1])
    by_left: dict[str, list[str]] = {}
    for left, right in rules:
        by_left.setdefault(left, []).append(right)
    outer_kv: list[Column] = []
    for left, rights in by_left.items():
        inner_kv: list[Column] = []
        for right in rights:
            inner_kv += [F.lit(right), F.lit(left + right)]
        outer_kv += [F.lit(left), F.create_map(*inner_kv)]
    rule_map = F.create_map(*outer_kv)

    def step(acc: Column, x: Column) -> Column:
        merged_val = F.element_at(
            F.element_at(rule_map, F.element_at(acc, -1)), x
        )
        return F.when(
            (F.size(acc) > 0) & merged_val.isNotNull(),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged_val)
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        c, F.expr("CAST(array() AS array<string>)"), step
    )


def adjacent_pair_counts(syms_df: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent symbol pairs: ``(l, r, cnt)``."""
    pairs = syms_df.filter(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p")["0"].alias("l"), F.col("p")["1"].alias("r")
    ).agg(F.sum("freq").alias("cnt"))


def _select_batch(
    top_rows: list,
    batch_size: int,
    prior_merged: set[str],
    exhausted: bool,
    strict: bool = True,
) -> list[tuple[str, str, int]]:
    """Greedy sequential-equivalent batch from a ranked pair prefix.

    ``top_rows`` is the ranked ``(l, r, cnt)`` list (cnt desc, l, r);
    ``exhausted`` says whether it is the COMPLETE pair table (so no
    unseen pair can conflict). Returns the batch in sequential order.
    See the module docstring for the equivalence proof; the rules:

    * select while pairwise disjoint on ``{l, r, l+r}`` (merged strings
      included — a later pair touching an earlier merge result is a
      conflict, as is a merged string colliding with an existing
      multi-char symbol, i.e. ``EOW`` or a previously learned merge);
    * the first conflict's count — or, if none seen, the last collected
      row's count (an unseen pair can rank no higher) — is ``c_bound``;
    * keep the top pair unconditionally (batch-of-one IS sequential)
      plus every later selection with ``cnt > c_bound`` strictly.

    ``strict=False`` is the FAST mode: conflicting pairs are SKIPPED
    (selection continues down the ranking) and no count trim applies.
    On a low-entropy symbol inventory — 16 hex chars, or the first few
    hundred merges of real text — the exact mode degenerates to
    batch-of-1 because the top pairs constantly share symbols; fast
    mode still selects a maximal disjoint set per round. The cost is
    rule ORDER: a skipped pair's count may drop below a selected
    lower-ranked pair's by the time it is learned, so the sequence can
    deviate from sequential where batches interact (identical when
    they are conflict-free — pinned by test). Batch members are still
    pairwise disjoint, so the one-pass composed rewrite stays exact
    for the rules it applies — but the learned RULE SET diverges from
    sequential BPE where batches interact: measured on Zipf-mixture
    text at 10k merges, rule-set agreement is only ~32% (order
    agreement ~0) with a downstream tokenizer-fertility delta of
    +0.54% (``bench_domain.py --bpe-divergence``, committed in
    BENCH_DOMAIN_r10.json ``bpe_divergence``). Use strict mode when
    the rule list itself is the contract (tokenizer interop, oracle
    replay); fast mode when only aggregate segmentation quality
    matters and throughput is the constraint.
    """
    selected: list[tuple[str, str, int]] = []
    used: set[str] = set()
    c_bound: int | None = None
    for row in top_rows:
        l, r, cnt = row["l"], row["r"], int(row["cnt"])
        merged = l + r
        collision = merged in prior_merged or merged == EOW
        if l in used or r in used or merged in used or (selected and collision):
            if strict:
                c_bound = cnt
                break
            continue
        if len(selected) < batch_size:
            selected.append((l, r, cnt))
            used.update((l, r, merged))
            if collision:
                # the top pair's merge conflates with an existing
                # symbol: sequential-exact on its own, but counts of
                # pairs touching that symbol may INCREASE, so nothing
                # else may share the round.
                return selected[:1]
        elif not strict:
            break
    if not strict:
        return selected
    if c_bound is None and not exhausted and top_rows:
        c_bound = int(top_rows[-1]["cnt"])
    if c_bound is None:
        return selected
    return selected[:1] + [p for p in selected[1:] if p[2] > c_bound]


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    on_round=None,
    batch_size: int = 1,
    strict: bool = True,
    on_batch=None,
) -> list[dict]:
    """Learn the top ``n_merges`` BPE merge rules over the corpus.

    Returns ``[{rank, left, right, merged, freq}, ...]`` in learned
    order. Argmax ties resolve to the lexicographically smallest
    ``(l, r)`` so the rule list is deterministic across engines and
    runs. Stops early if no adjacent pairs remain.

    ``batch_size > 1`` learns up to that many rules per Spark round by
    batching provably non-interacting pairs (see module docstring) —
    the rule list is IDENTICAL to ``batch_size=1``, the wall-clock is
    divided by the average realized batch size. ``strict=False``
    additionally SKIPS over conflicting pairs when filling the batch
    (fast mode): deterministic, and identical to sequential whenever
    batches are conflict-free (pinned by tests), but where batches
    interact the rule ORDER — and therefore the merge SET and the
    final vocabulary — MAY differ from sequential; measure the actual
    divergence for a given corpus with bench_domain --bpe-divergence
    (rule-set agreement + fertility delta at production vocab sizes)
    before committing to fast mode. The trade is the one every
    production-scale trainer makes. Use ``batch_size=32, strict=False``
    for production vocabularies (30k+ merges); the default stays
    sequential-exact so the per-rule cost curve remains measurable.

    ``on_batch(n_rules)`` is called once per SPARK ROUND with the
    realized batch size — rules learned per round is the deterministic
    quantity batching is supposed to raise, so benches gate on its
    average rather than on machine-dependent wall-clock ratios
    (advisor r9).

    ``checkpoint_dir`` switches the per-round lineage cut from
    ``localCheckpoint`` (executor-local, lost on executor death — fine
    for a re-runnable trainer) to RELIABLE ``.checkpoint()`` files
    under that directory, the right durability trade for a multi-day
    50k-merge production run. ``on_round(rank)`` is called after each
    learned rule — the bench_domain --bpe section uses it to measure
    the per-round cost curve.
    """
    # coalesce(1) is deliberate: after the corpus fold the working set
    # is the distinct-word table (Zipf-bounded — ~1e6 rows for a web
    # corpus, a fraction of one executor), and 12-50k tiny rounds are
    # scheduling-bound, not compute-bound; one partition makes each
    # round one task. Raise the partition count for a billion-word
    # vocabulary — the algorithm is unchanged.
    #
    # A checkpoint (not persist) per round: a persisted frame still
    # carries its full logical plan, so by round r Catalyst re-analyzes
    # r nested fold expressions — quadratic planning over the run
    # (measured: ~1.4 s/round by round 12 on a 31-word vocab, pure
    # driver time). The checkpoint truncates the plan to the
    # materialized rows, keeping every round O(1) to plan — measured
    # flat at 2k merges by bench_domain --bpe.
    # Reliable checkpoints are NOT cleaned by Spark by default
    # (spark.cleaner.referenceTracking.cleanCheckpoints=false), so a
    # 50k-merge run would otherwise accumulate 50k directories of the
    # full working set. Each round checkpoints into its own numbered
    # subdirectory and deletes the previous round's once the new one is
    # materialized (DataFrame.checkpoint is eager), keeping at most two
    # alive at any instant; the SparkContext checkpoint dir is restored
    # on exit so the global setting is not a lasting side effect.
    sc = docs.sparkSession.sparkContext
    orig_ckpt_dir = sc.getCheckpointDir() if checkpoint_dir is not None else None
    prev_subdir: list[str | None] = [None]
    round_no = [0]

    def _hadoop_rm(path: str) -> None:
        jvm = sc._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
        fs.delete(hpath, True)

    def cut(frame: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return frame.localCheckpoint()
        sub = f"{checkpoint_dir}/round_{round_no[0]:06d}"
        round_no[0] += 1
        sc.setCheckpointDir(sub)
        out = frame.checkpoint()
        if prev_subdir[0] is not None:
            _hadoop_rm(prev_subdir[0])
        prev_subdir[0] = sub
        return out

    try:
        syms = cut(
            initial_symbols(word_frequencies(docs, text_col)).coalesce(1)
        )
        merges: list[dict] = []
        prior_merged: set[str] = set()
        # the per-round collect is max(4*batch, 32) ROWS (8*batch in
        # fast mode, which skips past conflicts and needs the deeper
        # ranking) — still a bounded driver round-trip (the model,
        # never the data).
        if batch_size > 1:
            top_k = max((4 if strict else 8) * batch_size, 32)
        else:
            top_k = 1
        while len(merges) < n_merges:
            top = (
                adjacent_pair_counts(syms)
                .orderBy(F.col("cnt").desc(), "l", "r")
                .limit(top_k)
                .collect()
            )
            if not top:
                break
            room = n_merges - len(merges)
            batch = _select_batch(
                top,
                min(batch_size, room) if batch_size > 1 else 1,
                prior_merged,
                exhausted=len(top) < top_k,
                strict=strict,
            )
            for l, r, cnt in batch:
                merges.append(
                    {
                        "rank": len(merges),
                        "left": l,
                        "right": r,
                        "merged": l + r,
                        "freq": cnt,
                    }
                )
                prior_merged.add(l + r)
            expr = merge_pairs_expr("syms", [(l, r) for l, r, _ in batch])
            syms = cut(syms.select("freq", expr.alias("syms")))
            if on_batch is not None:
                on_batch(len(batch))
            if on_round is not None:
                for m in merges[-len(batch):]:
                    on_round(m["rank"])
        return merges
    finally:
        if checkpoint_dir is not None:
            if prev_subdir[0] is not None:
                _hadoop_rm(prev_subdir[0])
            if orig_ckpt_dir is not None:
                sc.setCheckpointDir(orig_ckpt_dir)


def apply_bpe(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: per document, the
    BPE token count and the character count — the fertility numerator/
    denominator under the trained tokenizer.

    The folds run over the DISTINCT-WORD table, not the token stream:
    a word encodes identically everywhere, so evaluating the chained
    rewrite once per vocabulary entry and joining the result back to
    the exploded tokens cuts fold evaluations from |corpus tokens| to
    |vocab| (measured 15 s → sub-second on the test corpus; at 100 TB
    it is the difference between folding trillions of occurrences and
    millions of words). The encoded vocab is exactly the thing you'd
    broadcast — AQE picks broadcast vs shuffle join by its actual
    size. The rule list is the tiny driver-side model; everything else
    is built-ins — no UDF, no state."""
    toks = docs.select(
        id_col, F.explode(T.words(text_col)).alias("word")
    ).filter(F.col("word") != "")
    syms: Column = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(EOW))
    )
    for m in merges:
        syms = merge_pair_expr(syms, m["left"], m["right"])
    encoded = (
        toks.select("word")
        .distinct()
        .select(
            "word",
            F.size(syms).alias("n_syms"),
            F.length("word").alias("n_chars"),
        )
    )
    return (
        toks.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


def sequential_bpe_reference(
    word_freqs: dict[str, int], n_merges: int
) -> list[dict]:
    """Driver-side sequential BPE over a COLLECTED word-frequency
    model — the gold standard for divergence measurement at production
    vocab sizes.

    The distributed trainer exists because the CORPUS is big; the
    word-frequency table it folds is Zipf-bounded (~1e6 rows for a web
    corpus) and fits a driver, so the exact sequential trajectory can
    be replayed in milliseconds-per-merge Python instead of
    seconds-per-merge Spark rounds. Incremental bookkeeping (pair
    counts + pair→word inverted index, only re-scanning words that
    contain the merged pair) makes 10k+ merges tractable where the
    naive per-merge full-vocab rescan is quadratic. Rule-for-rule
    identical to the naive Sennrich reference (pinned by
    tests/test_bpe.py) and therefore to ``learn_bpe(batch_size=1)``.
    Same tiebreak: highest count, then lexicographically smallest
    ``(left, right)``.
    """
    import heapq
    from collections import defaultdict

    words: list[list] = [
        [list(w) + [EOW], int(f)] for w, f in word_freqs.items()
    ]
    counts: dict[tuple[str, str], int] = defaultdict(int)
    index: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, f) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] += f
            index[p].add(wi)
    # lazy max-heap keyed (-count, pair): stale entries are skipped at
    # pop time by checking against the live counts — O(log P) argmax
    # per merge instead of an O(P) scan (10k merges over a ~1e5-pair
    # space would otherwise be a 1e9-comparison Python loop)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[dict] = []
    while len(merges) < n_merges:
        while heap:
            negc, p = heap[0]
            if counts.get(p, 0) == -negc:
                break
            heapq.heappop(heap)
        if not heap:
            break
        (left, right), cnt = p, -heap[0][0]
        merges.append(
            {
                "rank": len(merges),
                "left": left,
                "right": right,
                "merged": left + right,
                "freq": cnt,
            }
        )
        merged = left + right
        touched: set[tuple[str, str]] = set()
        for wi in sorted(index[(left, right)]):
            syms, f = words[wi]
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] -= f
                if counts[pr] == 0:
                    del counts[pr]
                index[pr].discard(wi)
                touched.add(pr)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi][0] = out
            for i in range(len(out) - 1):
                pr = (out[i], out[i + 1])
                counts[pr] += f
                index[pr].add(wi)
                touched.add(pr)
        for pr in touched:
            c = counts.get(pr, 0)
            if c > 0:
                heapq.heappush(heap, (-c, pr))
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a learned merge table (pair → rank):
    repeatedly rewrite every occurrence of the lowest-rank pair
    present, left to right — the classical subword encode. Used by the
    divergence bench to compare fertility under two rule lists with
    ONE consistent encoder."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_pair = rk, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        left, right = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
