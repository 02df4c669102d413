"""Graph analytics over edge tables: PageRank.

Companion to the pointer-jumping connected components in
``operators/dedup.py`` (dedup clusters): PageRank weights nodes by link
structure — the domain-authority / source-quality signal a web-scale
training pipeline mixes into sampling weights (quality-weighted
``domain_mix`` / ``weighted_sample``).

Scale shape: each iteration is ONE shuffle — edges join the current rank
vector on ``src`` (both pre-partitioned by the same key, so iterations
re-use the exchange), then a hash aggregate on ``dst``. No adjacency
matrices, no driver-side graph. The rank vector is 2 columns × N nodes;
for billions of nodes set ``checkpoint_each`` so the growing lineage is
truncated per iteration (same lesson as ``connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_each: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Semantics (deterministic, engine-portable — the catalog oracle
    unrolls the same algebra in SQL):

    - duplicate edges are collapsed first (``distinct``) so a repeated
      link doesn't multiply its vote;
    - every iteration: ``rank(v) = (1-d)/N + d · Σ_{u→v} rank(u)/outdeg(u)``;
    - nodes are the union of sources and destinations; initial rank is
      ``1/N``;
    - NO dangling-mass redistribution: a node with no outlinks leaks its
      damped mass (use symmetric edge lists — e.g. both directions of a
      bipartite co-occurrence graph — when total-mass conservation
      matters; then no node dangles by construction).

    Output: node, rank (unrounded double — round at the consumer).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one cheap job; N is a plan constant after
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    contrib_edges = e.join(outdeg, "src")  # (src, dst, outdeg)
    base = (1.0 - damping) / n_nodes

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        contribs = (
            contrib_edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_each:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
