"""PageRank by distributed power iteration — the crawl-graph centrality
signal web-corpus curation uses as a document-quality prior (Common
Crawl's crawl-frontier ranking family: a page/domain linked from many
well-linked pages is likelier to be worth training on than an orphan).

Expressed as DataFrame joins, the same iterative design language as
operators/components.py (Hash-Min CC):

* edges are normalized ONCE into (src, dst, inv_deg = 1/outdeg(src)) and
  localCheckpoint'ed — every round joins against this frozen frame, so
  the (possibly expensive) upstream edge derivation never re-executes;
* each round is contrib = ranks x edges (equi join on src, shuffles on
  the join key) -> groupBy(dst).sum (one exchange, map-side partial),
  then the dangling mass — rank parked on nodes with no out-edges — is
  ONE aggregate scalar attached via a 1-ROW broadcast (the
  xh_heavy_hitters global-total shape: the nested-loop join's build side
  is provably a single row, so it is the optimal plan, and the round
  stays fully lazy until its single convergence-probe action);
* rank state is one (node, rank) table per round, localCheckpoint
  (eager=False) so the L1-delta convergence probe materializes it as the
  round's ONE Spark job; superseded checkpoint blocks are freed
  immediately (release_local_checkpoint, ADVICE r1).

The driver only ever sees the per-round 1-row delta probe — never data.
At 100 TB edge count dominates; both per-round shuffles are on uniform
join keys, and rounds are O(1/log(1/damping) * log(1/tol)) regardless of
graph size.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import release_local_checkpoint

__all__ = ["pagerank", "pagerank_quantized"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-8,
    nodes: Optional[DataFrame] = None,
) -> DataFrame:
    """(node, rank) over the DISTINCT directed edge set; ranks sum to 1
    (dangling mass is redistributed uniformly, the standard stochastic
    completion). ``nodes`` (optional single-column frame) adds isolated
    vertices, which receive the teleport + dangling share. Stops when the
    L1 delta between rounds drops below ``tol`` or after ``max_iter``;
    ``tol <= 0`` runs exactly ``max_iter`` rounds with NO per-round
    action (fixed-budget mode — the rounds fuse into the caller's job)."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    # materialize the (possibly expensive) edge derivation ONCE: vert,
    # deg, links and dangling all re-read it; released after setup
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    vert = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    )
    if nodes is not None:
        vert = vert.union(nodes.select(F.col(nodes.columns[0]).alias("node")))
    vert = vert.distinct().localCheckpoint()
    n = vert.count()
    if n == 0:
        release_local_checkpoint(e)
        release_local_checkpoint(vert)
        return vert.select("node", F.lit(0.0).alias("rank"))

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Zero-weight SELF-edges seed every vertex into the contribution
    # aggregate, so new ranks come straight off groupBy(dst) — no
    # per-round "left join the vertex set back in" (one whole join stage
    # per round removed). Pre-partitioning links on src / dangling on
    # node lets each round's join reuse the checkpointed partitioning
    # instead of re-exchanging the edge set every iteration.
    links = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("inv_deg"))
        .union(
            vert.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0.0).alias("inv_deg"),
            )
        )
        .repartition("src")
        .localCheckpoint()
    )
    # nodes with NO out-edges: their rank is the dangling mass each round
    dangling = (
        vert.join(deg.select(F.col("src").alias("node")), "node", "left_anti")
        .repartition("node")
        .localCheckpoint()
    )

    release_local_checkpoint(e)  # links/dangling/vert now self-contained

    # one O(metadata) setup probe: a graph with NO dangling nodes (e.g.
    # any symmetrized graph) never pays the per-round rank/dangling join
    # or the 1-row scalar attach at all
    has_dangling = dangling.limit(1).count() > 0

    ranks = vert.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    teleport = (1.0 - damping) / n
    lazy_rounds = []

    for _ in range(max_iter):
        contrib = (
            links.join(ranks, links.src == ranks.node)
            .select("dst", (F.col("rank") * F.col("inv_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        if has_dangling:
            dang = (
                ranks.join(dangling, "node")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
            )
            stepped = contrib.join(F.broadcast(dang)).select(  # 1-row build
                F.col("dst").alias("node"),
                (
                    F.lit(teleport)
                    + F.lit(damping) * (F.col("contrib") + F.col("dmass") / n)
                ).alias("rank"),
            )
        else:
            stepped = contrib.select(
                F.col("dst").alias("node"),
                (F.lit(teleport) + F.lit(damping) * F.col("contrib")).alias("rank"),
            )
        new = stepped.localCheckpoint(eager=False)
        if tol > 0.0:
            # the round's ONE action: L1 delta, materializes `new` en route
            delta = (
                new.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
                .collect()[0]["d"]
            )
            superseded = ranks
            ranks = new
            release_local_checkpoint(superseded)
            if delta is not None and delta < tol:
                break
        else:
            # fixed-budget mode (tol <= 0): no per-round probe — the
            # lazy checkpoints truncate each round's LOGICAL plan (ranks
            # feeds two consumers per round; without truncation the plan
            # doubles per round) but nothing materializes until the
            # single eager checkpoint below. Right for small/medium
            # budgets where per-round job latency dominates;
            # convergence-driven runs want tol > 0.
            lazy_rounds.append(new)
            ranks = new
    if tol <= 0.0 and lazy_rounds:
        # ONE job materializes the whole round chain; afterwards the
        # returned frame is self-contained, so every upstream block —
        # setup frames AND the intermediate lazy checkpoints — can be
        # freed (releasing them while the chain was still lazy is the
        # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND race).
        ranks = ranks.localCheckpoint()
        for f in lazy_rounds:
            release_local_checkpoint(f)
    for frame in (links, dangling, vert):
        release_local_checkpoint(frame)
    return ranks


def pagerank_quantized(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 8,
    total_units: int = 10**12,
    nodes: Optional[DataFrame] = None,
) -> DataFrame:
    """Integer-unit PageRank (round 12, VERDICT r11 #5): the float power
    iteration's cross-engine problem is that per-destination contribution
    SUMS are order-dependent in IEEE arithmetic, so two engines summing
    in different partition orders can differ in the last ulp. This
    variant defines the recurrence ENTIRELY over BIGINT micro-units —
    integer sums are associative-commutative EXACTLY, so any engine that
    mirrors the op tree reproduces every bit:

        base          = total_units div n
        contrib(v)    = sum over u->v of (rank(u) div outdeg(u))
        dmass         = sum of rank over out-degree-0 nodes
        rank'(v)      = (3*base + 17*(contrib(v) + dmass div n)) div 20

    i.e. damping 17/20 = 0.85 as an exact rational; every op is BIGINT
    add/multiply/floor-div on non-negatives. Ranks approximate the float
    iteration to ~rounds/total_units relative error while being
    hash-checkable against a SQL oracle (xh_pagerank_quantized unrolls
    the same ``rounds`` stages as chained CTEs).

    Fixed-budget only (the ``tol <= 0`` mode of :func:`pagerank`): all
    rounds fuse lazily — per round ONE equi join on the checkpointed
    link frame + one partial-agg exchange, dangling mass via a 1-row
    broadcast — and a single eager checkpoint materializes the chain.
    Returns (node, rank_units BIGINT); units sum to <= total_units (the
    floor-division remainders are deliberately dropped, identically in
    both engines)."""
    if rounds < 0:
        raise ValueError("rounds must be non-negative")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    vert = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    )
    if nodes is not None:
        vert = vert.union(nodes.select(F.col(nodes.columns[0]).alias("node")))
    vert = vert.distinct().localCheckpoint()
    n = vert.count()
    if n == 0:
        release_local_checkpoint(e)
        release_local_checkpoint(vert)
        return vert.select("node", F.lit(0).cast("long").alias("rank_units"))

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    links = e.join(deg, "src").repartition("src").localCheckpoint()
    dangling = (
        vert.join(deg.select(F.col("src").alias("node")), "node", "left_anti")
        .repartition("node")
        .localCheckpoint()
    )
    release_local_checkpoint(e)

    base = total_units // n
    ranks = vert.select(
        "node", F.lit(base).cast("long").alias("rank_units")
    ).localCheckpoint()
    lazy_rounds = []
    for _ in range(rounds):
        contrib = (
            links.join(ranks, links.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_units div outdeg").alias("c"),
            )
            .unionByName(vert.select("node", F.lit(0).cast("long").alias("c")))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        dang = ranks.join(dangling, "node").agg(
            F.coalesce(F.sum("rank_units"), F.lit(0)).cast("long").alias("dmass")
        )
        stepped = contrib.join(F.broadcast(dang)).select(  # 1-row build side
            "node",
            F.expr(
                f"CAST(({3 * base} + 17 * (contrib + (dmass div {n}))) div 20 AS BIGINT)"
            ).alias("rank_units"),
        )
        new = stepped.localCheckpoint(eager=False)
        lazy_rounds.append(new)
        ranks = new
    if lazy_rounds:
        ranks = ranks.localCheckpoint()  # ONE job materializes the chain
        for f in lazy_rounds:
            release_local_checkpoint(f)
    for frame in (links, dangling, vert):
        release_local_checkpoint(frame)
    return ranks
