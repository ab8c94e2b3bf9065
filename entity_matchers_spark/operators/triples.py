"""Knowledge-graph projection / filter operators (SURVEY.md §2.2).

The reference manipulates triple sets with in-memory Python sets and dicts;
every operator here is the same semantics as one declarative DataFrame
transform:

- ``parse_triples``: subject/predicate/object projections
  (/root/reference/OpenEA_Mod/src/openea/modules/load/kg.py:2-20)
- ``remove_unlinked_triples``: keep triples whose head AND tail appear in a
  link list (/root/reference/OpenEA_Mod/src/openea/modules/load/
  kgs.py:250-261) — two left-semi joins
- ``prune_links_and_triples``: the reference's fixpoint loop that
  alternately drops links whose endpoints lost all triples and triples that
  became unlinked (kgs.py:205-247) — a short driver loop of semi-joins
- ``clean_literal``: strip surrounding quotes, ``@lang`` tags, ``^^type``
  suffixes (/root/reference/OpenEA_Mod/src/openea/approaches/
  rdgcn.py:108-148 ``clear_attribute_triples``)
- ``has_numbers`` filter (/root/reference/deepmatcher/notebooks/
  create_dataset_deepmatchers.py:160-162)
- ``select_name_attribute``: per-dataset priority whitelists pick the best
  "name" literal per entity (create_dataset_deepmatchers.py:53-142,
  rdgcn.py:446-538) — a row_number window over a priority rank
- ``uri_local_name``: URI-tail fallback name (rdgcn.py:529-532)
- ``anonymize_entities``: consistent opaque relabeling of every entity
  (/root/reference/src/preprocess_datasets/anonymize_dataset.py:6-101) —
  seeded *hash* instead of ``random.randint`` so the mapping is
  deterministic under any partitioning

Scale: all joins here are semi-joins on entity ids (broadcastable when the
link side is small); the fixpoint loop converges in a handful of rounds and
each round is one stage pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_triples(triples: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(subjects, predicates, objects) distinct projections."""
    return (
        triples.select(F.col("h").alias("s")).distinct(),
        triples.select(F.col("r").alias("p")).distinct(),
        triples.select(F.col("t").alias("o")).distinct(),
    )


def remove_unlinked_triples(triples: DataFrame, linked_entities: DataFrame) -> DataFrame:
    """Keep triples with BOTH endpoints in ``linked_entities`` (column
    ``e``) — kgs.py:250-261 semantics via two left-semi joins."""
    ents = linked_entities.select(F.col("e")).distinct()
    return (
        triples.join(ents.withColumnRenamed("e", "h"), "h", "left_semi")
        .join(ents.withColumnRenamed("e", "t"), "t", "left_semi")
        .select("h", "r", "t")
    )


def links_with_triples(links: DataFrame, triples: DataFrame, side: str) -> DataFrame:
    """Keep links whose ``side`` endpoint (e1|e2) still appears in
    ``triples`` as head or tail — kgs.py:230-247."""
    ents = (
        triples.select(F.col("h").alias("e"))
        .unionAll(triples.select(F.col("t").alias("e")))
        .distinct()
    )
    return links.join(ents.withColumnRenamed("e", side), side, "left_semi").select(
        "e1", "e2"
    )


def prune_links_and_triples(
    links: DataFrame,
    triples1: DataFrame,
    triples2: DataFrame,
    max_iterations: int = 10,
    fixed_iterations: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Alternating fixpoint (kgs.py:205-222): drop triples not covered by
    links, then links whose endpoints lost every triple, until stable.

    ``fixed_iterations`` runs exactly N rounds without convergence checks —
    used by the oracle-verified registry query so both engines compute the
    identical unrolled computation.
    """
    rounds = fixed_iterations if fixed_iterations is not None else max_iterations
    for _ in range(rounds):
        e1 = links.select(F.col("e1").alias("e"))
        e2 = links.select(F.col("e2").alias("e"))
        new_t1 = remove_unlinked_triples(triples1, e1)
        new_t2 = remove_unlinked_triples(triples2, e2)
        new_links = links_with_triples(links_with_triples(links, new_t1, "e1"), new_t2, "e2")
        # Each round references the previous round's links/triples 3-5x;
        # without lineage truncation Spark re-executes the shared subtrees
        # multiplicatively (~5^rounds leaf scans). Materialize every round,
        # mirroring the clustering loop (clustering.py).
        new_t1 = new_t1.localCheckpoint(eager=True)
        new_t2 = new_t2.localCheckpoint(eager=True)
        new_links = new_links.localCheckpoint(eager=True)
        if fixed_iterations is None:
            before = links.count()
            after = new_links.count()
            triples1, triples2, links = new_t1, new_t2, new_links
            if before == after:
                break
        else:
            triples1, triples2, links = new_t1, new_t2, new_links
    return links, triples1, triples2


def clean_literal(col: Column | str) -> Column:
    """Strip ``"..."`` quotes, ``@lang`` tags, ``^^<type>`` suffixes and
    collapse whitespace — rdgcn.py:108-148 normalization order."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"\^\^.*$", "")      # ^^<datatype>
    c = F.regexp_replace(c, r"@[a-zA-Z-]+$", "")  # @en / @zh-CN
    c = F.regexp_replace(c, r'^"|"$', "")         # surrounding quotes
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def has_numbers(col: Column | str) -> Column:
    """True iff the literal contains a digit (the reference drops numeric
    literals from name candidates)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("[0-9]")


def select_name_attribute(
    attrs: DataFrame,
    priority: dict[str, int],
    ent_col: str = "ent",
    attr_col: str = "attr",
    value_col: str = "value",
) -> DataFrame:
    """One best (ent, name) per entity: whitelist attrs ranked by priority
    (lower = better), ties broken on value for determinism."""
    from pyspark.sql import Window

    rank = F.coalesce(
        *[F.when(F.col(attr_col) == a, F.lit(p)) for a, p in priority.items()],
        F.lit(len(priority) + 1),
    )
    w = Window.partitionBy(ent_col).orderBy("prio", value_col)
    return (
        attrs.where(F.col(attr_col).isin(*priority.keys()))
        .withColumn("prio", rank)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col(ent_col).alias("ent"), F.col(value_col).alias("name"))
    )


def uri_local_name(col: Column | str) -> Column:
    """URI tail with underscores → spaces (rdgcn.py:532) — the name
    fallback and the basis of the normalized URL-domain key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.regexp_extract(c, r"([^/#]+)$", 1), "_", " ")


def anonymize_entities(
    triples: DataFrame,
    side: str = "L",
    salt: str = "anon-v1",
) -> DataFrame:
    """Rewrite every entity URI to an opaque ``L<hash>`` / ``R<hash>`` token,
    consistently across head and tail positions.

    The reference draws ``random.randint`` per entity and writes a mapping
    file (anonymize_dataset.py:6-101); a seeded md5 keeps the rewrite pure,
    reproducible at any parallelism, and joins-free (no mapping shuffle)."""

    def anon(c: Column) -> Column:
        return F.concat(F.lit(side), F.substring(F.md5(F.concat(F.lit(salt), c)), 1, 12))

    return triples.select(anon(F.col("h")).alias("h"), "r", anon(F.col("t")).alias("t"))
