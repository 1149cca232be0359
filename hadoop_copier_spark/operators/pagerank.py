"""PageRank by distributed power iteration — the crawl-graph centrality
signal web-corpus curation uses as a document-quality prior (Common
Crawl's crawl-frontier ranking family: a page/domain linked from many
well-linked pages is likelier to be worth training on than an orphan).

Expressed as DataFrame joins, the same iterative design language as
operators/components.py (Hash-Min CC):

* edges are normalized ONCE into (src, dst, inv_deg = 1/outdeg(src)) —
  out-degree via a window over the (real ∪ self)-edge union partitioned
  by src, so the build is ONE exchange whose output is already
  hash-partitioned on src (r18) — and localCheckpoint'ed: every round
  joins against this frozen frame, so the (possibly expensive) upstream
  edge derivation never re-executes;
* each round is contrib = ranks x edges (equi join on src, shuffles on
  the join key) -> groupBy(dst).sum (one exchange, map-side partial);
  the dangling mass — rank parked on nodes with no out-edges — is a
  filter+aggregate over the rank state (each self-edge row carries its
  vertex's has-out flag through the groupBy, r18) attached via a 1-ROW
  broadcast (the xh_heavy_hitters global-total shape: the nested-loop
  join's build side is provably a single row, so it is the optimal
  plan, and the round stays fully lazy until its single
  convergence-probe action);
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
    vert = vert.distinct().localCheckpoint(eager=False)

    # Zero-weight SELF-edges seed every vertex into the contribution
    # aggregate, so new ranks come straight off groupBy(dst) — no
    # per-round "left join the vertex set back in" (one whole join stage
    # per round removed). r18 (guide §2.3/§2.4): the link frame builds
    # with ONE exchange — out-degree comes from a window over the
    # (real ∪ self)-edge union partitioned by src, whose output is
    # ALREADY hash-partitioned on src, replacing the old
    # groupBy(deg) exchange + join + explicit repartition("src") (3
    # exchanges -> 1); each round's join then reuses the checkpointed
    # partitioning instead of re-exchanging the edge set per iteration.
    # The self-edge row (exactly one per vertex) additionally carries
    # dst_has_out = whether its vertex has any real out-edge, so the
    # dangling FLAG rides the per-round groupBy into the new rank state
    # and the per-round dangling mass is a filter+aggregate on ranks —
    # the old per-round ranks⋈dangling join stage is gone.
    from pyspark.sql.window import Window

    w_src = Window.partitionBy("src")
    links = (
        e.select("src", "dst", F.lit(1).alias("is_edge"))
        .union(
            vert.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0).alias("is_edge"),
            )
        )
        .withColumn("outdeg", F.sum("is_edge").over(w_src))
        .select(
            "src",
            "dst",
            F.when(F.col("is_edge") == 1, F.lit(1.0) / F.col("outdeg"))
            .otherwise(F.lit(0.0))
            .alias("inv_deg"),
            F.when(F.col("is_edge") == 0, F.col("outdeg") > 0).alias("dst_has_out"),
        )
        .localCheckpoint(eager=False)
    )

    # r19 (guide §1.2): ONE setup job replaces three — the global
    # aggregate below materializes the lazy links checkpoint (and vert
    # en route; a global agg touches every partition, so the pinning
    # argument of the lazy-checkpoint discipline holds), and its two
    # counters ARE the old separate probes: n = self-edge rows (exactly
    # one per vertex — the old vert.count()), n_dangling = self-edge
    # rows whose vertex has no real out-edge (the old limit-probe,
    # which could not ride a lazy checkpoint anyway: a limit scan may
    # leave partitions unmaterialized).
    _stats = links.agg(
        F.count(F.when(F.col("dst_has_out").isNotNull(), 1)).alias("n"),
        F.count(F.when(~F.col("dst_has_out"), 1)).alias("n_dangling"),
    ).collect()[0]
    n = int(_stats["n"])
    if n == 0:
        # pin the (empty) result before its inputs' blocks are released
        ret = vert.select("node", F.lit(0.0).alias("rank")).localCheckpoint()
        for frame in (e, links, vert):
            release_local_checkpoint(frame)
        return ret
    has_dangling = int(_stats["n_dangling"]) > 0

    release_local_checkpoint(e)  # links/vert now self-contained

    # the initial rank state is a NARROW filter+project of the
    # checkpointed links (the self-edge rows — exactly one per vertex):
    # no checkpoint of its own, no setup job (r18); round-1 consumers
    # re-derive it from the checkpoint blocks at projection cost
    ranks = links.where(F.col("dst_has_out").isNotNull()).select(
        F.col("dst").alias("node"),
        F.lit(1.0 / n).alias("rank"),
        F.col("dst_has_out").alias("has_out"),
    )
    teleport = (1.0 - damping) / n
    lazy_rounds = []

    for _ in range(max_iter):
        contrib = (
            links.join(ranks, links.src == ranks.node)
            .select(
                "dst",
                (F.col("rank") * F.col("inv_deg")).alias("c"),
                "dst_has_out",
            )
            .groupBy("dst")
            .agg(
                F.sum("c").alias("contrib"),
                F.max("dst_has_out").alias("has_out"),  # self-edge row only
            )
        )
        if has_dangling:
            dang = ranks.where(~F.col("has_out")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
            )
            stepped = contrib.join(F.broadcast(dang)).select(  # 1-row build
                F.col("dst").alias("node"),
                (
                    F.lit(teleport)
                    + F.lit(damping) * (F.col("contrib") + F.col("dmass") / n)
                ).alias("rank"),
                "has_out",
            )
        else:
            stepped = contrib.select(
                F.col("dst").alias("node"),
                (F.lit(teleport) + F.lit(damping) * F.col("contrib")).alias("rank"),
                "has_out",
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
    if max_iter == 0:
        # zero-round call: the un-checkpointed initial state still reads
        # the links blocks — pin it before they are released below
        ranks = ranks.localCheckpoint()
    for frame in (links, vert):
        release_local_checkpoint(frame)
    return ranks.select("node", "rank")


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
    vert = vert.distinct().localCheckpoint(eager=False)

    # r18 (guide §2.3/§2.4, mirroring :func:`pagerank`): ONE exchange
    # builds the link frame — out-degree from a window over the
    # (real ∪ self)-edge union partitioned by src (output already
    # hash-partitioned on src; replaces groupBy + join + repartition),
    # zero-contribution SELF-edges replace the per-round vert-union seed
    # (identical integer sums: COALESCE(contrib, 0) ≡ sum with a 0 term),
    # and the self-edge row carries the dangling flag into each round's
    # groupBy so the dangling mass is a filter+aggregate on the rank
    # state, not a per-round join. Every value is the same BIGINT the
    # unrolled-CTE oracle computes — only the plan changed.
    from pyspark.sql.window import Window

    w_src = Window.partitionBy("src")
    links = (
        e.select("src", "dst", F.lit(1).alias("is_edge"))
        .union(
            vert.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0).alias("is_edge"),
            )
        )
        .withColumn("outdeg", F.sum("is_edge").over(w_src))
        .select(
            "src",
            "dst",
            "is_edge",
            "outdeg",
            F.when(F.col("is_edge") == 0, F.col("outdeg") > 0).alias("dst_has_out"),
        )
        .localCheckpoint(eager=False)
    )
    # r19 (guide §1.2): ONE setup job replaces two — this global agg
    # materializes the lazy links checkpoint (touching every partition)
    # and its self-edge count IS the old vert.count() (exactly one
    # self-edge per vertex). See :func:`pagerank`.
    n = int(
        links.agg(
            F.count(F.when(F.col("dst_has_out").isNotNull(), 1)).alias("n")
        ).collect()[0]["n"]
    )
    if n == 0:
        # pin the (empty) result before its inputs' blocks are released
        ret = vert.select(
            "node", F.lit(0).cast("long").alias("rank_units")
        ).localCheckpoint()
        for frame in (e, links, vert):
            release_local_checkpoint(frame)
        return ret
    release_local_checkpoint(e)

    base = total_units // n
    # initial rank state: a narrow filter+project of the checkpointed
    # links' self-edge rows — no checkpoint, no setup job (r18)
    ranks = links.where(F.col("dst_has_out").isNotNull()).select(
        F.col("dst").alias("node"),
        F.lit(base).cast("long").alias("rank_units"),
        F.col("dst_has_out").alias("has_out"),
    )
    lazy_rounds = []
    for _ in range(rounds):
        contrib = (
            links.join(ranks, links.src == ranks.node)
            .select(
                F.col("dst").alias("nnode"),
                F.when(F.col("is_edge") == 1, F.expr("rank_units div outdeg"))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("c"),
                "dst_has_out",
            )
            .groupBy("nnode")
            .agg(
                F.sum("c").alias("contrib"),
                F.max("dst_has_out").alias("has_out"),  # self-edge row only
            )
            .withColumnRenamed("nnode", "node")
        )
        dang = ranks.where(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank_units"), F.lit(0)).cast("long").alias("dmass")
        )
        stepped = contrib.join(F.broadcast(dang)).select(  # 1-row build side
            "node",
            F.expr(
                f"CAST(({3 * base} + 17 * (contrib + (dmass div {n}))) div 20 AS BIGINT)"
            ).alias("rank_units"),
            "has_out",
        )
        new = stepped.localCheckpoint(eager=False)
        lazy_rounds.append(new)
        ranks = new
    if lazy_rounds:
        ranks = ranks.localCheckpoint()  # ONE job materializes the chain
        for f in lazy_rounds:
            release_local_checkpoint(f)
    else:
        # zero-round call: the un-checkpointed initial state still reads
        # the links blocks — pin it before they are released below
        ranks = ranks.localCheckpoint()
    for frame in (links, vert):
        release_local_checkpoint(frame)
    return ranks.select("node", "rank_units")
