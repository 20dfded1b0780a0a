"""Fixed-iteration weighted PageRank as DataFrame join-aggregate rounds.

The training-data tier uses link-graph centrality as a document-quality
prior (the CommonCrawl/harmonic-centrality pattern); the reference has no
graph code at all — its item popularity is a plain count
(src/models/baseline_models.py popularity scores). This operator is the
principled replacement: rank items by the stationary visit probability of
the co-interaction graph.

Execution model per iteration: one shuffle on ``dst`` (the contribution
aggregate). The edge frame is reused every round — persist it; the rank
frame is tiny (one row per node). With a FIXED iteration count the logical
plan grows linearly, and each round's ``localCheckpoint`` (optional, on by
default above ``checkpoint_every``) cuts the lineage exactly like
kcore/connected_components — the r5 lesson: a persist-only loop doubles
the plan per round and can OOM the driver in explainString.

Determinism contract (oracle-replayable in unrolled SQL CTEs): per-node
inflow sums aggregate as DECIMAL(28,12) casts of the double contributions
(order-independent), then the damping arithmetic runs in double — the
identical IEEE ops in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Rank nodes of a directed weighted graph; returns (node, rank).

    Nodes = distinct src ∪ dst. Dangling nodes (no out-edges) leak their
    mass — callers wanting strict probability conservation should
    symmetrize the edge list first (the co-interaction graphs this engine
    builds are symmetrized upstream, so every node has out-degree ≥ 1).
    """
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum(F.col("w").cast("decimal(28,12)")).cast("double").alias("out_w"))
    norm_e = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    )
    norm_e = norm_e.persist()

    n_nodes = nodes.count()  # scalar — the only driver-side value
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))

    for i in range(iterations):
        inflow = (
            norm_e.join(ranks, norm_e["src"] == ranks["node"])
            .select(F.col("dst"), (F.col("rank") * F.col("p")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum(F.col("contrib").cast("decimal(28,12)")).cast("double").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes["node"] == inflow["dst"], "left").select(
            F.col("node"),
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
