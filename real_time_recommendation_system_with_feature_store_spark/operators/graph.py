"""Fixed-iteration weighted PageRank as DataFrame join-aggregate rounds.

The training-data tier uses link-graph centrality as a document-quality
prior (the CommonCrawl/harmonic-centrality pattern); the reference has no
graph code at all — its popularity baseline is a plain interaction count
(README.md:127-135 "Popularity" row; src/evaluation/metrics.py:467-477
derives novelty from the same per-item counts). This operator is the
principled replacement: rank items by the stationary visit probability of
the co-interaction graph.

Execution model per iteration: one shuffle on ``dst`` (the contribution
aggregate). The normalized edge frame is reused every round, so it is
materialized ONCE via an eager ``localCheckpoint`` (blocks are released by
the ContextCleaner when the frame is garbage-collected — same lifecycle as
kcore_filter's levels); the rank frame is tiny (one row per node). With a
FIXED iteration count the logical plan grows linearly, and every
``checkpoint_every`` rounds a ``localCheckpoint`` cuts the rank lineage —
the r5 lesson: an uncut loop doubles the plan per round and can OOM the
driver in explainString. The default (2) fires within the default
iteration count (3).

Determinism contract (oracle-replayable in unrolled SQL CTEs): per-node
inflow sums aggregate as DECIMAL(28,12) casts of the double contributions
(order-independent), then the damping arithmetic runs in double — the
identical IEEE ops in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 2,
    reset: DataFrame | None = None,
    reset_node: str = "node",
    reset_weight: str = "weight",
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Rank nodes of a directed weighted graph; returns (node, rank).

    Nodes = distinct src ∪ dst. Dangling nodes (no out-edges) LEAK their
    mass by default — total rank then sums to less than 1 and an external
    caller gets non-conserving ranks. Either symmetrize the edge list
    first (the co-interaction graphs this engine builds are symmetrized
    upstream, so every node has out-degree ≥ 1), or pass
    ``redistribute_dangling=True`` to re-inject each round's dangling mass
    through the teleport distribution (uniform, or the ``reset`` seeds in
    personalized mode) — the standard PageRank completion, costing one
    extra scalar aggregate + broadcast per iteration and restoring
    sum(rank) ≈ 1 exactly.

    ``reset`` switches to PERSONALIZED PageRank (random walk with restart,
    the standard recommender centrality): a (node, weight) frame whose
    teleport mass replaces the uniform 1/n — restricted to graph nodes,
    then normalized to sum 1 (decimal-exact), with non-seed nodes getting
    zero teleport. The initial rank is the reset distribution. The reset
    frame is node-sized at most: it joins the node frame once and rides the
    same per-iteration shuffle."""
    w = qcol(weight) if weight else F.lit(1.0)
    e = edges.select(qcol(src).alias("src"), qcol(dst).alias("dst"), w.alias("w"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum(F.col("w").cast("decimal(28,12)")).cast("double").alias("out_w"))
    norm_e = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    )
    # Eager materialization (not persist): the frame is re-scanned every
    # iteration, and checkpoint blocks need no explicit unpersist — the
    # ContextCleaner frees them when the frame is GC'd, so a lazily-consumed
    # return value can't leak a pinned cache entry.
    norm_e = norm_e.localCheckpoint(eager=True)

    if reset is not None:
        rs = reset.select(
            qcol(reset_node).alias("node"), qcol(reset_weight).cast("double").alias("__rw")
        )
        # restrict to graph nodes BEFORE normalizing, so teleport mass on
        # items outside the graph doesn't silently leak total mass
        rs = rs.join(nodes, "node")
        rtot = rs.agg(
            F.sum(F.col("__rw").cast("decimal(28,12)")).cast("double").alias("__rt")
        )
        # Guard BEFORE normalizing: an empty reset frame, all-NULL/zero
        # weights, or seeds entirely outside the graph would make __rt
        # NULL/0, every teleport coalesce to 0.0, and the output silently
        # degenerate to all-zero ranks. One tiny scalar job on the
        # node-bounded seed frame (the plan keeps the lazy broadcast rtot).
        rtot_val = rtot.first()["__rt"]
        if rtot_val is None or rtot_val <= 0.0:
            raise ValueError(
                "pagerank: personalized reset weights must have a strictly "
                "positive total over nodes present in the graph — got "
                f"{rtot_val!r} (empty/zero/NULL seeds, or no seed node "
                "appears in the edge list)"
            )
        nodes = (
            nodes.join(rs, "node", "left")
            .crossJoin(F.broadcast(rtot))
            .select(
                "node",
                F.coalesce(F.col("__rw") / F.col("__rt"), F.lit(0.0)).alias("__reset"),
            )
        )
    nodes = nodes.localCheckpoint(eager=True)

    n_nodes = nodes.count()  # scalar — the only driver-side value
    if n_nodes == 0:
        # empty edge list -> empty ranking (not a ZeroDivisionError)
        return nodes.select("node").withColumn("rank", F.lit(0.0))
    if reset is not None:
        base_col = F.lit(1.0 - damping) * F.col("__reset")
        teleport = F.col("__reset")
        ranks = nodes.select("node", F.col("__reset").alias("rank"))
    else:
        base_col = F.lit((1.0 - damping) / n_nodes)
        teleport = F.lit(1.0 / n_nodes)
        ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))

    dang = None
    if redistribute_dangling:
        # nodes with no out-edges; node-sized at most, materialized once
        dang = (
            nodes.select("node")
            .join(e.select(F.col("src").alias("node")).distinct(), "node", "left_anti")
            .localCheckpoint(eager=True)
        )

    for i in range(iterations):
        inflow = (
            norm_e.join(ranks, norm_e["src"] == ranks["node"])
            .select(F.col("dst"), (F.col("rank") * F.col("p")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum(F.col("contrib").cast("decimal(28,12)")).cast("double").alias("inflow"))
        )
        joined = nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
        flow = F.coalesce(F.col("inflow"), F.lit(0.0))
        if redistribute_dangling:
            # this round's dangling mass (decimal-exact scalar), re-injected
            # through the teleport distribution — one tiny agg + broadcast
            dmass = ranks.join(dang, "node").agg(
                F.coalesce(
                    F.sum(F.col("rank").cast("decimal(28,12)")).cast("double"),
                    F.lit(0.0),
                ).alias("__dm")
            )
            joined = joined.crossJoin(F.broadcast(dmass))
            flow = flow + F.col("__dm") * teleport
        ranks = joined.select(
            F.col("node"),
            (base_col + F.lit(damping) * flow).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient of the
    UNDIRECTED graph under ``edges``; returns
    ``(node, degree, triangles, clustering_coeff)`` with every node
    present (zero triangles included — coefficient 0.0 below degree 2).

    Algorithm: degree-ordered wedge join (the standard distributed
    triangle scheme — Cohen's MapReduce formulation / node-iterator++).
    Edges canonicalize undirected and orient from the LOWER (degree, id)
    endpoint to the higher; wedges enumerate neighbor pairs of each apex
    and close against the oriented edge set. The orientation is the scale
    guarantee: every node's out-degree is O(sqrt(m)), so wedge volume is
    O(m^1.5) total regardless of hub skew — a raw neighbor self-join
    would square the hottest hub's degree. Each triangle is produced
    exactly once (its minimum-key vertex is the apex), then exploded to
    all three corners for per-node counts.

    All joins are key-partitioned equi joins (no cartesian); the
    canonical edge frame is reused three times (degrees, orientation,
    closure) so it is materialized once via eager localCheckpoint — same
    lifecycle note as pagerank's edge frame above.

    Determinism contract: counts are exact integers; the coefficient
    ``2*t / (d*(d-1))`` runs in double with the identical op order both
    engines, rounded to 12 places. The (degree, id) tuple order is
    replayed in SQL as row-value comparison.

    Reference parity: the reference has no graph analytics at all; local
    clustering is the cohesion signal its popularity count can't see
    (README.md:127-135 baseline table) — an item whose co-purchase
    neighborhood is tightly interlinked sits in a coherent taste cluster,
    vs a hub merely touched by everyone.
    """
    e = edges.select(qcol(src).alias("__a"), qcol(dst).alias("__b")).where(
        F.col("__a").isNotNull()
        & F.col("__b").isNotNull()
        & (F.col("__a") != F.col("__b"))
    )
    und = (
        e.select(
            F.least("__a", "__b").alias("a"), F.greatest("__a", "__b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("__db"))
    ka, kb = F.struct("__da", "a"), F.struct("__db", "b")
    orient = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(ka < kb, F.col("__db")).otherwise(F.col("__da")).alias("dv"),
        )
        .localCheckpoint(eager=True)
    )
    o1 = orient.select("u", F.col("v").alias("x"), F.col("dv").alias("__dx"))
    o2 = orient.select("u", F.col("v").alias("y"), F.col("dv").alias("__dy"))
    wedges = (
        o1.join(o2, "u")
        .where(F.struct("__dx", "x") < F.struct("__dy", "y"))
        .select("u", "x", "y")
    )
    closed = wedges.join(
        orient.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"]
    )
    tri = (
        closed.select(F.explode(F.array("u", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    d2 = F.col("degree") * (F.col("degree") - F.lit(1.0))
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias("triangles"),
        F.round(
            F.when(
                F.col("degree") >= 2,
                F.lit(2.0) * F.coalesce(F.col("triangles"), F.lit(0).cast("long")) / d2,
            ).otherwise(F.lit(0.0)),
            12,
        ).alias("clustering_coeff"),
    )
