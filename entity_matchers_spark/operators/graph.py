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

# The reference's low-degree deletion boost threshold is a fixed literal
# (SampKG generator.py:169: ``if degree < 8``), NOT derived from its degree
# cap — kept as a module constant so the coupling is explicit.
LOW_DEGREE_BOOST_CUTOFF = 8


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
    from entity_matchers_spark.operators.iterutil import loop_width

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e_deg = e.join(out_deg, "src").localCheckpoint(eager=True)
    # size loop shuffles to the GRAPH, not the session (see iterutil)
    w = loop_width(edges.sparkSession, e_deg.count())
    if w is not None:
        e_deg = e_deg.coalesce(w)
        nodes = nodes.coalesce(w)
    nodes = nodes.localCheckpoint(eager=True)

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


def entity_degrees(triples: DataFrame) -> DataFrame:
    """(e, deg): total degree (head + tail occurrences) per entity —
    count_ent_degree (/root/reference/SampKG-OpenEA/src/sampkg/generator/
    utils.py count_ent_degree semantics)."""
    return (
        triples.select(F.col("h").alias("e"))
        .unionAll(triples.select(F.col("t").alias("e")))
        .groupBy("e")
        .agg(F.count("*").alias("deg"))
    )


def degree_guided_sample(
    triples1: DataFrame,
    triples2: DataFrame,
    links: DataFrame,
    delete_frac: float = 0.2,
    rounds: int = 2,
    preserve_num: int = 10,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Degree-guided KG down-sampling with high-degree preservation — the
    deterministic declarative analog of the reference's IDS sampler loop
    (/root/reference/SampKG-OpenEA/src/sampkg/generator/
    generator.py:35-116 ``_generate`` / ``delete_by_degree`` /
    ``preserve_high_degree_entity``).

    Each round deletes the ``delete_frac`` lowest-degree entities per KG
    (rank by degree asc, entity id asc — the reference sorts by degree and
    slices, with run-dependent ties; the id tie-break makes it stable at
    any parallelism), then prunes triples to surviving endpoint pairs and
    links to surviving endpoints. Afterwards the ``preserve_num``
    highest-ORIGINAL-degree entities per side are re-added and the final
    triples/links are rebuilt from the ORIGINAL KG restricted to the kept
    entity sets, exactly as preserve_high_degree_entity rebuilds from
    ``self.data.KG1_rel_triples``.

    Fixed rounds (no convergence test) so an unrolled SQL oracle computes
    the identical result. Each round is two degree aggregations + windowed
    rank + semi/anti joins; localCheckpoint cuts the per-round lineage.
    """
    from pyspark.sql import Window

    orig_t1, orig_t2, orig_links = triples1, triples2, links

    def drop_lowest(triples: DataFrame) -> DataFrame:
        """Entities surviving this round's bottom-``delete_frac`` cut."""
        deg = entity_degrees(triples)
        w = Window.orderBy(F.col("deg").asc(), F.col("e").asc())
        ranked = deg.withColumn("rn", F.row_number().over(w)).withColumn(
            "n", F.count("*").over(Window.partitionBy())
        )
        return ranked.where(
            F.col("rn") > F.ceil(F.lit(delete_frac) * F.col("n"))
        ).select("e")

    def prune(triples: DataFrame, kept: DataFrame) -> DataFrame:
        return (
            triples.join(kept.withColumnRenamed("e", "h"), "h", "left_semi")
            .join(kept.withColumnRenamed("e", "t"), "t", "left_semi")
            .select("h", "r", "t")
        )

    for _ in range(rounds):
        kept1 = drop_lowest(triples1)
        kept2 = drop_lowest(triples2)
        triples1 = prune(triples1, kept1).localCheckpoint(eager=True)
        triples2 = prune(triples2, kept2).localCheckpoint(eager=True)
        links = (
            links.join(kept1.withColumnRenamed("e", "e1"), "e1", "left_semi")
            .join(kept2.withColumnRenamed("e", "e2"), "e2", "left_semi")
            .localCheckpoint(eager=True)
        )

    def top_original(triples: DataFrame) -> DataFrame:
        deg = entity_degrees(triples)
        w = Window.orderBy(F.col("deg").desc(), F.col("e").asc())
        return deg.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= preserve_num
        ).select("e")

    def survivors(triples: DataFrame) -> DataFrame:
        return (
            triples.select(F.col("h").alias("e"))
            .unionAll(triples.select(F.col("t").alias("e")))
            .distinct()
        )

    kept1 = survivors(triples1).unionAll(top_original(orig_t1)).distinct()
    kept2 = survivors(triples2).unionAll(top_original(orig_t2)).distinct()
    final_t1 = prune(orig_t1, kept1)
    final_t2 = prune(orig_t2, kept2)
    final_links = (
        orig_links.join(kept1.withColumnRenamed("e", "e1"), "e1", "left_semi")
        .join(kept2.withColumnRenamed("e", "e2"), "e2", "left_semi")
        .select("e1", "e2")
    )
    return final_t1, final_t2, final_links


def degree_distribution_deletion(
    triples: DataFrame,
    target_dd: dict[int, float],
    delete_ratio: float = 0.2,
    max_degree: int = 8,
    pr_iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Degree-distribution-matched deletion, PR-guided — the declarative
    analog of ``delete_by_pagerank_for_dd`` (/root/reference/SampKG-OpenEA/
    src/sampkg/generator/generator.py:147-200): per degree bucket d
    (capped at ``max_degree``) delete

        trunc(size_d * ratio * mult * (1 + ddc[d] - ddo[d]))

    lowest-PageRank entities, where ddc is the CURRENT degree-distribution
    fraction, ddo the TARGET (the reference's original-dataset
    distribution), and mult = 3 when d < LOW_DEGREE_BOOST_CUTOFF (= 8, the
    reference's FIXED literal — generator.py:169 hard-codes ``degree < 8``
    independent of its own degree cap, so the boost deliberately does NOT
    track ``max_degree`` here either) and the bucket is
    over-represented (the reference's low-degree boost). The reference
    additionally deletes a random sub-quota (delete_random_ratio); here
    that ratio is 0 so the operator is deterministic — ranking is
    (9-dp-rounded PageRank asc, entity id asc).

    Returns the surviving triples (any triple touching a deleted entity is
    dropped, ``update_triples_and_links`` semantics).
    """
    from pyspark.sql import Window

    edges = triples.select(F.col("h").alias("src"), F.col("t").alias("dst")).distinct()
    pr = pagerank(edges, damping=damping, iterations=pr_iterations)

    deg = entity_degrees(triples).withColumn(
        "d", F.least(F.col("deg"), F.lit(max_degree))
    )
    tot = deg.agg(F.count("*").cast("double").alias("n"))
    buckets = deg.groupBy("d").agg(F.count("*").alias("sz")).crossJoin(tot)
    ddo = F.coalesce(
        *[F.when(F.col("d") == d, F.lit(f)) for d, f in target_dd.items()],
        F.lit(0.0),
    )
    frac = F.col("sz") / F.col("n")
    mult = F.when(
        (F.col("d") < LOW_DEGREE_BOOST_CUTOFF) & (frac > ddo), F.lit(3.0)
    ).otherwise(F.lit(1.0))
    deln = buckets.select(
        "d",
        (F.col("sz") * delete_ratio * mult * (F.lit(1.0) + frac - ddo))
        .cast("long")
        .alias("k"),
    )
    w = Window.partitionBy("d").orderBy(F.round(F.col("pr"), 9).asc(), F.col("e").asc())
    ranked = (
        deg.join(pr.withColumnRenamed("node", "e"), "e")
        .withColumn("rn", F.row_number().over(w))
    )
    deleted = ranked.join(F.broadcast(deln), "d").where(F.col("rn") <= F.col("k")).select("e")
    return (
        triples.join(deleted.withColumnRenamed("e", "h"), "h", "left_anti")
        .join(deleted.withColumnRenamed("e", "t"), "t", "left_anti")
        .select("h", "r", "t")
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, auth, hub) after ``iterations`` UNNORMALIZED HITS rounds
    (Kleinberg 1999) over distinct directed edges: per round, first
    auth(v) = Σ_{u→v} hub(u), then hub(u) = Σ_{u→v} auth(v) with the
    freshly updated auths (the classic update order).

    Normalization is deliberately omitted: unnormalized scores from an
    all-ones init are INTEGERS (alternating-path counts), so the
    cross-engine comparison is order-independent integer sums instead of
    float sums whose grouping-dependent rounding can't be replayed.
    Consumers rank by the scores, so any positive rescaling is
    information-free anyway. Magnitudes grow ≈ (mean degree)^(2·rounds) —
    callers pick ``iterations`` so counts stay inside int64 (3 rounds is
    plenty for ranking; raise only on sparse graphs).

    Scale shape: same as :func:`pagerank` — edges partitioned once, one
    groupBy-shuffle per half-round, scores checkpointed per round to cut
    lineage.
    """
    from entity_matchers_spark.operators.iterutil import loop_width

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct().localCheckpoint(eager=True)
    # size loop shuffles to the GRAPH, not the session (see iterutil); the
    # edge checkpoint also stops each round from re-running the upstream
    # distinct (previously recomputed once per materialized round)
    w = loop_width(edges.sparkSession, e.count())
    if w is not None:
        e = e.coalesce(w)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    s = nodes.select(
        "node", F.lit(1).cast("long").alias("auth"), F.lit(1).cast("long").alias("hub")
    )
    for _ in range(iterations):
        a = (
            e.join(s.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("_a"))
        )
        s = s.join(a, "node", "left").select(
            "node", F.coalesce("_a", F.lit(0)).cast("long").alias("auth"), "hub"
        )
        h = (
            e.join(s.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("_h"))
        )
        s = s.join(h, "node", "left").select(
            "node", "auth", F.coalesce("_h", F.lit(0)).cast("long").alias("hub")
        ).localCheckpoint(eager=True)
    return s
