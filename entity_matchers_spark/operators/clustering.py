"""Transitive clustering: iterative hash-min connected components.

The reference stops at 1-1 pairs between two KGs (SURVEY.md §2.5 —
clustering is absent there); the north rule adds transitive closure over the
match-edge graph to emit entity cluster ids.

Algorithm: hash-min label propagation + pointer jumping. Every node starts
with label = its own id; each iteration every node takes the min label in
its closed neighborhood, then labels are shortcut one hop
(label := label(label)) — the pointer-jumping step squares chain lengths,
so convergence is O(log diameter) rounds instead of O(diameter) (the
Kiveris et al. MapReduce-CC insight; a 7k-node blocking blob converged in
5 rounds instead of ~30). Stop when no label changes.

Scale discipline:
- each iteration is one groupBy(node).min(label) over the (bidirectional)
  edge table joined to current labels — shuffle on node id only;
- ``localCheckpoint()`` per iteration cuts the lineage (the Spark analog of
  the reference's pickle-per-stage checkpointing,
  /root/reference/bert-int/run_full_bert.py:46-64);
- convergence check is an aggregate count, driver sees one long per iter
  (loop-control precedent: early stopping,
  /root/reference/OpenEA_Mod/src/openea/modules/train/../finding/evaluation.py:29-35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """(id, cluster_id) for every node appearing in ``edges``;
    cluster_id = min node id in the component."""
    base = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if checkpoint:
        # Materialize the edge list BEFORE mirroring it: ``und`` references
        # the input twice (u→v ∪ v→u), and without this checkpoint both
        # union branches re-run the full upstream pipeline — for a near-dup
        # graph that is the entire LSH-join+verify, doubling its cost.
        base = base.localCheckpoint()
    und = base.union(base.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    labels = und.select(F.col("u").alias("id")).distinct().withColumn("cluster_id", F.col("id"))
    if checkpoint:
        und = und.localCheckpoint()
        labels = labels.localCheckpoint()

    for _ in range(max_iterations):
        # min label over closed neighborhood
        neighbor_min = (
            und.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("cluster_id").alias("nmin"))
            .withColumnRenamed("u", "id")
        )
        new_labels = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least(
                F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        # pointer jumping: label := label(label). Labels only ever shrink
        # (label(x) <= x), so one extra self-join per round squares the
        # propagation distance — O(log diameter) total rounds.
        hop = new_labels.select(
            F.col("id").alias("cluster_id"), F.col("cluster_id").alias("_l2")
        )
        jumped = new_labels.join(hop, "cluster_id", "left").select(
            "id",
            F.least(
                F.col("cluster_id"), F.coalesce(F.col("_l2"), F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        if checkpoint:
            # materialize FIRST, then test convergence on the two
            # materialized label tables: the old shape counted changes on
            # the un-checkpointed plan and then re-executed the round's
            # joins for the checkpoint — two executions per round
            jumped = jumped.localCheckpoint()
        changed = (
            jumped.join(labels.withColumnRenamed("cluster_id", "_old"), "id")
            .where(F.col("cluster_id") != F.col("_old"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def clusters_with_singletons(
    all_ids: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster assignment for the whole corpus: matched nodes get their
    component min-id, unmatched rows are singleton clusters of themselves
    (the reference's non-matchable "extra" entities,
    /root/reference/OpenEA_Mod/src/openea/modules/load/kgs.py:96-104)."""
    cc = connected_components(edges, src, dst)
    return (
        all_ids.select(F.col(id_col).alias("id"))
        .join(cc, "id", "left")
        .select("id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"))
    )
