"""Triple / link TSV scans and N-Triples sink (SURVEY.md §2.1).

Reference semantics re-expressed declaratively:

- relation-triple scan: 3-column TSV, hard 3-field contract
  (/root/reference/OpenEA_Mod/src/openea/modules/load/read.py:230-261 —
  ``assert len(params) == 3``). Here: explicit schema + a ``strict`` switch
  (raise on malformed) or drop-and-count (malformed rows observable in the
  metrics, never silently kept).
- attribute-triple scan (lenient): values may contain tabs; fields beyond
  the 3rd are re-joined into the value and a trailing ``.`` is stripped
  (read.py:398-433, 420-429).
- link scan: 2-column TSV (read.py:264-292).
- N-Triples sink: ``<h> <r> <t> .`` lines, with optional seed-label
  injection so a downstream fixpoint aligner can bootstrap from known links
  (/root/reference/src/utils.py:31-44 ``turn_and_write``, 78-93
  ``create_nt``, 47-75 label triples).
- YAGO URI rewrite: prefix expansion via a broadcast literal map
  (/root/reference/src/utils.py:6-28 ``turn_yg``).

Scale: TSV scans are plain ``spark.read.csv`` — splittable, predicate
pushdown on the parsed columns; the sink is ``format_string`` + text write
(one shuffle-free pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

TRIPLE_SCHEMA = StructType(
    [
        StructField("h", StringType()),
        StructField("r", StringType()),
        StructField("t", StringType()),
    ]
)

LINK_SCHEMA = StructType(
    [StructField("e1", StringType()), StructField("e2", StringType())]
)


def read_relation_triples(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """(h, r, t) from a tab-separated file. ``strict`` mirrors the
    reference's 3-field assert: any row with a null field fails the read;
    otherwise malformed rows are dropped."""
    df = spark.read.csv(path, sep="\t", schema=TRIPLE_SCHEMA, mode="PERMISSIVE")
    clean = df.where(
        F.col("h").isNotNull() & F.col("r").isNotNull() & F.col("t").isNotNull()
    )
    if strict:
        bad = df.count() - clean.count()
        if bad:
            raise ValueError(f"{bad} malformed triple rows in {path}")
    return clean


def read_attribute_triples(spark: SparkSession, path: str) -> DataFrame:
    """(ent, attr, value) — lenient: extra tab-separated fields re-join into
    the value; trailing ``.`` stripped; quotes kept for the cleaning layer
    (operators.triples.clean_literal)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return (
        lines.where(F.size(parts) >= 3)
        .select(
            F.element_at(parts, 1).alias("ent"),
            F.element_at(parts, 2).alias("attr"),
            F.rtrim(
                F.regexp_replace(
                    F.concat_ws("\t", F.slice(parts, 3, 1_000_000)), r"\s*\.\s*$", ""
                )
            ).alias("value"),
        )
    )


def read_links(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """(e1, e2) ground-truth link scan."""
    df = spark.read.csv(path, sep="\t", schema=LINK_SCHEMA, mode="PERMISSIVE")
    clean = df.where(F.col("e1").isNotNull() & F.col("e2").isNotNull())
    if strict:
        bad = df.count() - clean.count()
        if bad:
            raise ValueError(f"{bad} malformed link rows in {path}")
    return clean


def write_ntriples(
    triples: DataFrame,
    path: str,
    label_links: DataFrame | None = None,
    label_rel: str = "EntityMatchers:label",
) -> None:
    """Serialize ``<h> <r> <t> .`` lines; if ``label_links`` is given, both
    endpoints of every link additionally get a shared label triple
    ``<e> <label_rel> "link_<i>"`` — the reference's seed-injection trick so
    PARIS-style aligners can anchor on training links."""
    out = triples.select(
        F.format_string("<%s> <%s> <%s> .", "h", "r", "t").alias("value")
    )
    if label_links is not None:
        tokens = label_links.select(
            "e1", "e2", F.concat(F.lit("link_"), F.md5(F.concat_ws("\t", "e1", "e2"))).alias("tok")
        )
        lab = tokens.selectExpr("e1 AS e", "tok").unionAll(tokens.selectExpr("e2 AS e", "tok"))
        out = out.unionAll(
            lab.select(
                F.format_string('<%s> <%s> "%s" .', "e", F.lit(label_rel), "tok").alias("value")
            )
        )
    out.write.mode("overwrite").text(path)


def expand_uri_prefixes(col: Column | str, prefixes: dict[str, str]) -> Column:
    """Prefix expansion (``dbp:Foo`` → ``http://dbpedia.org/.../Foo``) as a
    chain of conditional replaces — plan constants, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for short, full in prefixes.items():
        out = F.when(out.startswith(short), F.concat(F.lit(full), F.substring_index(out, short, -1))).otherwise(out)
    return out
