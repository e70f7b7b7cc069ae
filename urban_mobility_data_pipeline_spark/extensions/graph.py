"""Iterative graph analytics on DataFrames: PageRank.

Connected components (extensions/dedup.py) covers the clustering side
of graph work; PageRank covers the *centrality* side — importance
scores over a relationship graph (here: the customer↔supplier trade
network mined from orders×lineitem). The loop is the canonical
power iteration:

    rank_{t+1}(v) = (1-d)/N + d * Σ_{u→v} rank_t(u) / outdeg(u)

expressed as a per-round join(edges, ranks) → groupBy(dst) — the same
shuffle-per-superstep shape Pregel/GraphX use, with each round's rank
frame materialized through the scratch registry so the lineage never
grows beyond one superstep (the CC lesson: an unmaterialized
iterative plan re-executes every prior round per action).

Cross-engine determinism: each round's rank is quantized with
``round(..., quantize)`` in BOTH this implementation and the unrolled
SQL oracle (plans/analytics.py generates one CTE per iteration from
the same constants). Per-round double sums may differ by ~1 ulp
between engines due to partial-aggregation order; quantizing at 12
decimals (~1e5 × the drift) snaps both engines to the same value
every round, so the feedback loop cannot amplify the difference.

No reference counterpart — the reference has no graph surface at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from urban_mobility_data_pipeline_spark.cache import scratch_persist

PAGERANK_DAMPING = 0.85
#: supersteps for the catalog query (and its unrolled oracle). Each
#: round is a full corpus-scale join+agg; three rounds already rank
#: the trade hubs stably, and callers wanting convergence-grade
#: precision pass iters= explicitly.
PAGERANK_ITERS = 3
PAGERANK_QUANTIZE = 12

#: Above this node count the per-round rank table stops being
#: broadcast (≈ a few hundred MB framed — the guide's comfort zone for
#: a broadcast relation) and the superstep join falls back to the
#: co-partitioned shuffle join against the staged edges. Below it, an
#: explicit broadcast(ranks) pins the BUILD SIDE to the side that is
#: always the smaller one (ranks = one row per node; edges ≥ nodes on
#: any connected graph). Left to estimates, the planner broadcast the
#: CACHED EDGE table instead — known-small stats beat the unknown
#: post-aggregation rank estimate — which collected the edge list to
#: the driver and rebuilt its hash relation in every task of every
#: round (r13: 181,826-row broadcast per superstep, 3.7-4.6 s collect
#: each, ~176 s of per-task hash-map build CPU on the trade graph).
PAGERANK_BROADCAST_MAX_NODES = 5_000_000


def pagerank(
    edges: DataFrame,
    *,
    damping: float = PAGERANK_DAMPING,
    iters: int = PAGERANK_ITERS,
    quantize: int = PAGERANK_QUANTIZE,
    materialize_every: int = 8,
) -> DataFrame:
    """PageRank over ``edges`` (columns ``src``, ``dst``; pass each
    undirected edge in both directions). Returns ``(node, rank)``.

    Nodes are the distinct ``src`` endpoints — with bidirectional
    edges that is every connected node, so there are no dangling
    nodes and the (1-d)/N teleport reaches everything. The node count
    is collected once as a bounded driver scalar: it feeds the rank
    initialisation/teleport literals AND picks the superstep join
    strategy (broadcast the per-node rank table while it fits under
    :data:`PAGERANK_BROADCAST_MAX_NODES`, co-partitioned shuffle join
    past it); the per-round shuffle carries (node, rank/outdeg)
    contributions keyed by dst."""
    # stage the (possibly expensive) edge derivation ONCE: without
    # this every superstep replays the upstream joins that built the
    # edge list (measured 2x wall on the trade graph). The degree is
    # folded in up front so each round is a single join, and the
    # staged frame is hash-partitioned on the join key so the
    # superstep join reuses the cached partitioning instead of
    # re-exchanging the edges every round.
    edges = scratch_persist(edges)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # the node count is a bounded driver scalar (the audited category:
    # one long, like the nprobe cell ids) — inlining it as a literal
    # replaces a broadcast join of the 1-row count frame in EVERY
    # superstep's plan, and it is what decides the join strategy below.
    # 1.0/n and (1-d)/n are IEEE double divisions either way (Python
    # and the JVM produce the same bits), so ranks are unchanged.
    n_nodes = int(deg.agg(F.count(F.lit(1))).first()[0])
    if n_nodes == 0:
        return deg.select(
            F.col("src").alias("node"), F.lit(0.0).alias("rank")
        )
    small_nodes = n_nodes <= PAGERANK_BROADCAST_MAX_NODES
    # same wrong-build-side hazard on the one-time degree fold: deg is
    # per-node, edges per-edge — broadcast deg while it fits, never
    # the edge list
    edges_deg = scratch_persist(
        edges.join(F.broadcast(deg) if small_nodes else deg, "src")
        .repartition("src")
    )
    init = 1.0 / n_nodes
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(init).alias("rank")
    )
    teleport_over_n = F.lit((1.0 - damping) / n_nodes)
    # Join-strategy choice (guide §3.1), made from the KNOWN node
    # count instead of planner estimates: ranks (one row per node) is
    # always the smaller side of the superstep join, so broadcast it
    # while it fits and leave the staged, hash-partitioned edge table
    # unshuffled; past the cap fall back to the co-partitioned shuffle
    # join (the 100-TB shape). See PAGERANK_BROADCAST_MAX_NODES for
    # what the estimate-driven plan did instead.
    for it in range(iters):
        rhs = F.broadcast(ranks) if small_nodes else ranks
        contrib = edges_deg.join(
            rhs, F.col("src") == F.col("node")
        ).select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.round(
                    teleport_over_n + F.lit(damping) * F.col("s"),
                    quantize,
                ).alias("rank"),
            )
        )
        # periodic materialization: a short fixed iteration count
        # chains fine inside one Catalyst plan (each round is one
        # join+agg over the staged edges — a barrier per round just
        # pays 2x in job-scheduling overhead, measured on the trade
        # graph), but an unbounded run must cut the lineage or every
        # action replays the whole history — same lesson as the CC
        # rounds in extensions/dedup.py
        if materialize_every and (it + 1) % materialize_every == 0:
            ranks = scratch_persist(ranks)
            ranks.count()
    return ranks
