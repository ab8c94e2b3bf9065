"""Graph operators: iterative DataFrame PageRank (SURVEY.md §2.7).

The reference hand-rolls PageRank over triple adjacency dicts for its IDS*
dataset sampler (/root/reference/SampKG-OpenEA/src/sampkg/generator/
entity_pagerank.py:4-60: d=0.85, <=100 iterations, uniform init). Here the
same recurrence as a driver loop of joins:

    pr_{i+1}(v) = (1-d)/N + d * sum_{u->v} pr_i(u)/out_deg(u)

Dangling nodes (no out-edges) follow the reference: their mass is NOT
redistributed — it simply leaks, matching entity_pagerank.py's per-node
update which only sums over existing in-neighbors.

Scale: edges are hash-partitioned on src once and reused every iteration
(one shuffle per iteration for the groupBy dst); ``localCheckpoint`` per
iteration cuts the growing lineage exactly like the CC loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node, pr) after ``iterations`` synchronous rounds over distinct
    directed edges. Fixed iteration count (no convergence test) so an
    unrolled SQL oracle computes the identical result."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e_deg = e.join(out_deg, "src").localCheckpoint(eager=True)

    pr = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for i in range(iterations):
        contrib = (
            e_deg.join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))).alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=True)
    return pr
