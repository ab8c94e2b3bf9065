"""Query registry: every implemented operator exposed as a (spark, sf_dir) →
DataFrame builder plus an equivalent ANSI-SQL oracle string for DuckDB.

This is the engine's public query surface (SURVEY.md §2 coverage) and the
driver's correctness gate. Column names are aliased identically on both
sides; floating-point columns are computed with identical operand order and
rounded where engines could differ in summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_matchers_spark.functions.hashing import (
    MINHASH_PRIME,
    minhash_permutation_params,
)
from entity_matchers_spark.functions.shingles import char_shingles, hashed_shingles, tokens
from entity_matchers_spark.functions.similarity import (
    jaccard_arrays,
    jaccard_hashed_udf,
    jaro_winkler_udf,
    token_set_levenshtein_ratio,
)
from entity_matchers_spark.operators import blocking, clustering, matching

# ---------------------------------------------------------------------------
# shared ER-on-documents config (documents table stands in for web_pages:
# doc_id ~ page id, text ~ extracted text, source ~ domain key)

ER_BANDS = 8
ER_ROWS = 2
ER_SEED = 11037
ER_CAP = 64
ER_NAME_CAP = 64
# canonical token-set string capped before levenshtein: cost is O(len^2)
# per pair and the builtin allocates 2 int rows per call — the cap bounds
# both while the sorted-distinct prefix keeps the comparison stable
ER_TSLR_CAP = 192
ER_EDGE_THRESHOLD = 0.62


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table, spread across all cores: the test parquet is a
    single row group (1 scan task), but every documents query is compute-
    bound (shingling, hashing, string math) — repartition by id so the
    per-doc work parallelizes. On a many-file production table the scan is
    already wide and this collapses into the downstream shuffle."""
    from entity_matchers_spark.session import default_partitions

    docs = _read(spark, sf_dir, "documents")
    return docs.repartition(default_partitions(spark), "doc_id")


# Several registry queries share the ER chain prefix (blocks → pairs →
# scores). The driver runs each query in the same process, so materialize
# the shared prefix once per sf_dir (localCheckpoint = cluster-local
# storage, no lineage) instead of recomputing it per query.
_ER_CACHE: dict[tuple[str, str], DataFrame] = {}


def _er_cached(spark: SparkSession, sf_dir: str, key: str, build) -> DataFrame:
    k = (sf_dir, key)
    if k not in _ER_CACHE:
        _ER_CACHE[k] = build().localCheckpoint(eager=True)
    return _ER_CACHE[k]


# --- SQL oracle fragments ---------------------------------------------------


def _sig_sql_entries(num_perm: int, seed: int = ER_SEED) -> list[str]:
    """DuckDB expressions for each MinHash permutation over a ``grams`` list
    column — same (a, b, p) constants the Spark plan embeds."""
    p = MINHASH_PRIME
    entries = []
    for a, b in minhash_permutation_params(num_perm, seed):
        entries.append(
            f"coalesce(list_min([({a}*(g%{p})+{b})%{p} for g in grams]), {p})"
        )
    return entries


def _er_blocks_sql() -> str:
    """(id, block_id) CTE body: MinHash band keys + source-domain keys."""
    sig = ",\n      ".join(_sig_sql_entries(ER_BANDS * ER_ROWS))
    band_exprs = []
    for band in range(ER_BANDS):
        cells = " || ".join(
            f"s[{band * ER_ROWS + r + 1}] || '-'" for r in range(ER_ROWS)
        )
        band_exprs.append(f"SELECT id, 'mh:{band}:' || {cells} AS block_id FROM sig")
    mh = "\n    UNION ALL\n    ".join(band_exprs)
    return f"""
  grams_t AS (
    SELECT doc_id AS id,
           list_distinct([('0x'||substr(md5(substr(t, i, 3)),1,8))::UBIGINT::BIGINT
                          for i in range(1, len(t)-1)]) AS grams
    FROM (SELECT doc_id, lower(substr(text, 1, 300)) AS t FROM documents)
  ),
  sig AS (
    SELECT id, [
      {sig}
    ] AS s FROM grams_t
  ),
  blocks AS (
    {mh}
    UNION ALL
    SELECT doc_id AS id, 'dom:' || source AS block_id FROM documents
  )
"""


def _er_pairs_sql() -> str:
    """Capped, deduped candidate pairs CTE (requires _er_blocks_sql CTEs)."""
    return f"""
  capped AS (
    SELECT b.* FROM blocks b
    WHERE b.block_id NOT IN (
      SELECT block_id FROM blocks GROUP BY block_id HAVING count(*) > {ER_CAP}
    )
  ),
  pairs AS (
    SELECT DISTINCT l.id AS id_a, r.id AS id_b
    FROM capped l JOIN capped r USING (block_id)
    WHERE l.id < r.id
  )
"""


_TSLR_CANON = (
    "array_to_string(list_sort(list_distinct("
    "list_filter(string_split_regex(lower({c}), '\\s+'), x -> x != ''))), ' ')"
)


def _er_scores_sql() -> str:
    """Scored pairs CTE (requires blocks + pairs CTEs)."""
    canon_a = f"substr({_TSLR_CANON.format(c='da.text')}, 1, {ER_TSLR_CAP})"
    canon_b = f"substr({_TSLR_CANON.format(c='db.text')}, 1, {ER_TSLR_CAP})"
    return f"""
  scored AS (
    SELECT id_a, id_b,
      jaro_winkler_similarity(lower(substr(da.text, 1, {ER_NAME_CAP})),
                              lower(substr(db.text, 1, {ER_NAME_CAP}))) AS jw,
      CASE WHEN greatest(len({canon_a}), len({canon_b})) = 0 THEN 1.0
            ELSE 1.0 - levenshtein({canon_a}, {canon_b})
                 / greatest(len({canon_a}), len({canon_b}))::DOUBLE END AS tslr,
      CASE WHEN len(list_distinct(ga.grams || gb.grams)) = 0 THEN 0.0
            ELSE len(list_intersect(ga.grams, gb.grams))
                 / len(list_distinct(ga.grams || gb.grams))::DOUBLE END AS jac3
    FROM pairs
    JOIN documents da ON pairs.id_a = da.doc_id
    JOIN documents db ON pairs.id_b = db.doc_id
    JOIN grams_t ga ON pairs.id_a = ga.id
    JOIN grams_t gb ON pairs.id_b = gb.id
  ),
  final_scored AS (
    SELECT id_a, id_b, jw, tslr, jac3,
           jw * 0.3 + tslr * 0.4 + jac3 * 0.3 AS score
    FROM scored
  )
"""


def _er_spark_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    mh = blocking.minhash_block_keys(
        docs, id_col="doc_id", text_col="text",
        num_bands=ER_BANDS, rows_per_band=ER_ROWS, seed=ER_SEED,
    )
    dom = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.lit("dom:"), F.col("source")).alias("block_id"),
    )
    return mh.unionByName(dom)


def _er_spark_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er_cached(
        spark, sf_dir, "pairs",
        lambda: blocking.candidate_pairs(_er_spark_blocks(spark, sf_dir), max_block_size=ER_CAP),
    )


def _er_spark_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er_cached(spark, sf_dir, "scores", lambda: _er_spark_scores_build(spark, sf_dir))


def _er_spark_scores_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_matchers_spark.functions.similarity import levenshtein_ratio

    docs = _docs(spark, sf_dir)
    pairs = _er_spark_pairs(spark, sf_dir)
    # The scored select below is compute-bound (JW pandas UDF + levenshtein
    # on ~300-char strings); the doc sides broadcast at test scale, so the
    # pair partitioning is what the scoring stage inherits — spread it.
    from entity_matchers_spark.session import default_partitions

    pairs = pairs.repartition(default_partitions(spark), "id_a", "id_b")
    # Per-doc features are computed ONCE here; the join shuffle materializes
    # them, so the pair-level expressions below see plain arrays/strings.
    canon = F.concat_ws(
        " ", F.sort_array(F.array_distinct(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")))
    )
    sides = docs.select(
        F.col("doc_id").alias("id"),
        F.lower(F.substring("text", 1, ER_NAME_CAP)).alias("name"),
        F.substring(canon, 1, ER_TSLR_CAP).alias("canon"),
        hashed_shingles(F.lower(F.substring("text", 1, 300))).alias("sh"),
    )
    a = sides.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"),
        F.col("canon").alias("canon_a"), F.col("sh").alias("sh_a"),
    )
    b = sides.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"),
        F.col("canon").alias("canon_b"), F.col("sh").alias("sh_b"),
    )
    scored = (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b",
            jaro_winkler_udf(F.col("name_a"), F.col("name_b")).alias("jw"),
            levenshtein_ratio("canon_a", "canon_b").alias("tslr"),
            jaccard_hashed_udf(F.col("sh_a"), F.col("sh_b")).alias("jac3"),
        )
    )
    # No rounding anywhere: every feature is computed from identical operands
    # in identical order in both engines, so the raw doubles are bit-equal.
    return scored.withColumn(
        "score", F.col("jw") * 0.3 + F.col("tslr") * 0.4 + F.col("jac3") * 0.3
    )


# --- query builders ----------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregation: map-side partial aggregation + one shuffle
    on the tiny (flag, status) key space."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,2)")).alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(20,2)")
                 * (F.lit(1).cast("decimal(20,2)") - F.col("l_discount").cast("decimal(20,2)")))
                .cast("decimal(20,4)")
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity::DECIMAL(20,2)) AS sum_qty,
  sum(l_extendedprice::DECIMAL(20,2)) AS sum_base_price,
  sum((l_extendedprice::DECIMAL(20,2) * (1::DECIMAL(20,2) - l_discount::DECIMAL(20,2)))::DECIMAL(20,4)) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join; nation/customer are broadcast (small dims)."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(20,2)")
                 * (F.lit(1).cast("decimal(20,2)") - F.col("l_discount").cast("decimal(20,2)")))
                .cast("decimal(20,4)")
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


Q_TOP_REVENUE_SQL = """
SELECT o_orderkey, o_orderdate,
  sum((l_extendedprice::DECIMAL(20,2) * (1::DECIMAL(20,2) - l_discount::DECIMAL(20,2)))::DECIMAL(20,4)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via window (the reference's per-entity top-k pattern,
    SURVEY.md §2.3)."""
    from pyspark.sql import Window

    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


Q_TOP_ORDERS_PER_CUST_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (the reference's remove_unlinked / no-triples filters,
    /root/reference/OpenEA_Mod/src/openea/modules/load/kgs.py:230-261)."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


Q_CUST_NO_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event aggregation (batch form of the streaming path)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("sum_value"),
        )
    )


Q_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, sum(value::DECIMAL(20,6)) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_er_block_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking stage: MinHash-LSH band keys + domain keys (SURVEY.md §2.3)."""
    return _er_spark_blocks(spark, sf_dir)


Q_ER_BLOCK_KEYS_SQL = f"WITH {_er_blocks_sql()} SELECT id, block_id FROM blocks"


def q_er_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capped, salted-ready self-join on block_id → (id_a, id_b)."""
    return _er_spark_pairs(spark, sf_dir)


Q_ER_CANDIDATE_PAIRS_SQL = (
    f"WITH {_er_blocks_sql()}, {_er_pairs_sql()} SELECT id_a, id_b FROM pairs"
)


def q_er_pair_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise scoring: JW (pandas UDF) + token-set-lev + 3-gram Jaccard +
    calibrated blend (SURVEY.md §2.4)."""
    return _er_spark_scores(spark, sf_dir)


Q_ER_PAIR_SCORES_SQL = (
    f"WITH {_er_blocks_sql()}, {_er_pairs_sql()}, {_er_scores_sql()} "
    "SELECT id_a, id_b, jw, tslr, jac3, score FROM final_scored"
)


def q_er_mutual_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-best match decision (alignment.py:239-299 semantics)."""
    scored = _er_spark_scores(spark, sf_dir)
    return matching.mutual_best(scored).select("id_a", "id_b", "score")


Q_ER_MUTUAL_BEST_SQL = (
    f"WITH {_er_blocks_sql()}, {_er_pairs_sql()}, {_er_scores_sql()}, "
    """
  best_a AS (
    SELECT id_a, id_b FROM (
      SELECT id_a, id_b,
             row_number() OVER (PARTITION BY id_a ORDER BY score DESC, id_b ASC) AS rn
      FROM final_scored) WHERE rn = 1
  ),
  best_b AS (
    SELECT id_a, id_b FROM (
      SELECT id_a, id_b,
             row_number() OVER (PARTITION BY id_b ORDER BY score DESC, id_a ASC) AS rn
      FROM final_scored) WHERE rn = 1
  )
SELECT s.id_a, s.id_b, s.score
FROM final_scored s
JOIN best_a USING (id_a, id_b)
JOIN best_b USING (id_a, id_b)
"""
)


def q_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive clustering: hash-min connected components over thresholded
    mutual-best edges; unmatched docs are singletons."""
    scored = _er_spark_scores(spark, sf_dir)
    edges = matching.mutual_best(scored, min_score=ER_EDGE_THRESHOLD).select("id_a", "id_b")
    docs = _docs(spark, sf_dir)
    return clustering.clusters_with_singletons(docs, edges, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


Q_ER_CLUSTERS_SQL = (
    f"WITH RECURSIVE {_er_blocks_sql()}, {_er_pairs_sql()}, {_er_scores_sql()}, "
    f"""
  thresholded AS (SELECT * FROM final_scored WHERE score >= {ER_EDGE_THRESHOLD}),
  best_a AS (
    SELECT id_a, id_b FROM (
      SELECT id_a, id_b,
             row_number() OVER (PARTITION BY id_a ORDER BY score DESC, id_b ASC) AS rn
      FROM thresholded) WHERE rn = 1
  ),
  best_b AS (
    SELECT id_a, id_b FROM (
      SELECT id_a, id_b,
             row_number() OVER (PARTITION BY id_b ORDER BY score DESC, id_a ASC) AS rn
      FROM thresholded) WHERE rn = 1
  ),
  edges AS (
    SELECT s.id_a, s.id_b FROM thresholded s
    JOIN best_a USING (id_a, id_b) JOIN best_b USING (id_a, id_b)
  ),
  und AS (
    SELECT id_a AS u, id_b AS v FROM edges
    UNION SELECT id_b AS u, id_a AS v FROM edges
  ),
  reach(u, v) AS (
    SELECT u, v FROM und
    UNION
    SELECT r.u, n.v FROM reach r JOIN und n ON r.v = n.u
  ),
  cc AS (SELECT u AS id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u)
SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
"""
)


# --- dedup family ------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy, keep min id."""
    from entity_matchers_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir))


Q_DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1
"""


def q_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact char-3-gram Jaccard near-dup pairs (J ≥ 0.5) via gram-explode
    join — the exact baseline the LSH path approximates."""
    from entity_matchers_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.5, max_block_size=1_000_000
    )


Q_NEARDUP_JACCARD_SQL = """
WITH g AS (
  SELECT doc_id AS id,
         list_distinct([('0x'||substr(md5(substr(t, i, 3)),1,8))::UBIGINT::BIGINT
                        for i in range(1, len(t)-1)]) AS grams
  FROM (SELECT doc_id, lower(text) AS t FROM documents)
)
SELECT a.id AS id_a, b.id AS id_b,
       len(list_intersect(a.grams, b.grams))
         / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))::DOUBLE AS jaccard
FROM g a JOIN g b ON a.id < b.id
WHERE len(list_intersect(a.grams, b.grams))
        / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))::DOUBLE >= 0.5
"""


def q_neardup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup: banded candidates + exact Jaccard ≥ 0.7 verify.
    Oracle = ALL pairs with J ≥ 0.7 — passing requires the LSH candidate set
    to reach full recall at this threshold (16 bands × 2 rows: miss ≈ 2e-5)."""
    from entity_matchers_spark.operators.dedup import minhash_neardup_pairs

    return minhash_neardup_pairs(_docs(spark, sf_dir), threshold=0.7)


Q_NEARDUP_MINHASH_SQL = """
WITH g AS (
  SELECT doc_id AS id,
         list_distinct([('0x'||substr(md5(substr(t, i, 3)),1,8))::UBIGINT::BIGINT
                        for i in range(1, len(t)-1)]) AS grams
  FROM (SELECT doc_id, lower(text) AS t FROM documents)
)
SELECT a.id AS id_a, b.id AS id_b,
       CASE WHEN len(list_distinct(a.grams || b.grams)) = 0 THEN 0.0
            ELSE len(list_intersect(a.grams, b.grams))
                 / len(list_distinct(a.grams || b.grams))::DOUBLE END AS jaccard
FROM g a JOIN g b ON a.id < b.id
WHERE CASE WHEN len(list_distinct(a.grams || b.grams)) = 0 THEN 0.0
       ELSE len(list_intersect(a.grams, b.grams))
            / len(list_distinct(a.grams || b.grams))::DOUBLE END >= 0.7
"""


_SIMHASH_SQL_CTE = """
  toks AS (
    SELECT doc_id AS id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS ts
    FROM documents
  ),
  sums AS (
    SELECT id,
      [CAST(coalesce(list_sum([((((('0x'||substr(md5(t),1,15))::UBIGINT::BIGINT) >> j) & 1)*2 - 1)
                               for t in ts]), 0) AS BIGINT)
       for j in range(0, 60)] AS bs
    FROM toks
  ),
  sims AS (
    SELECT id,
      CAST(coalesce(list_sum([CASE WHEN bs[j+1] > 0 THEN (1::BIGINT << j) ELSE 0 END
                              for j in range(0, 60)]), 0) AS BIGINT) AS simhash
    FROM sums
  )
"""


def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document."""
    from entity_matchers_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "simhash"
    )


Q_SIMHASH_SQL = f"WITH {_SIMHASH_SQL_CTE} SELECT id AS doc_id, simhash FROM sims"


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 via pigeonhole
    chunk blocking + bit_count verify."""
    from entity_matchers_spark.operators.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(_docs(spark, sf_dir), max_hamming=3)


Q_SIMHASH_NEARDUP_SQL = f"""
WITH {_SIMHASH_SQL_CTE},
  chunks AS (
    SELECT id, simhash, 'c' || c || ':' || ((simhash >> (c*15)) & 32767) AS chunk_key
    FROM sims, (SELECT unnest(range(4)) AS c)
  ),
  cands AS (
    SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.simhash AS sh_a, r.simhash AS sh_b
    FROM chunks l JOIN chunks r USING (chunk_key)
    WHERE l.id < r.id
  )
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM cands WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sketch fingerprint per document."""
    from entity_matchers_spark.operators.text_analysis import fingerprint_mink

    return fingerprint_mink(_docs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "fp"
    )


Q_FINGERPRINTS_SQL = f"""
WITH g AS (
  SELECT doc_id AS id,
         list_distinct([substr(t, i, 3) for i in range(1, len(t)-1)]) AS grams
  FROM (SELECT doc_id, lower(text) AS t FROM documents)
)
SELECT id AS doc_id,
       array_to_string(
         list_sort(list_distinct([(('0x'||substr(md5(gr),1,8))::UBIGINT::BIGINT) % {MINHASH_PRIME}
                                  for gr in grams]))[1:4], '-') AS fp
FROM g
"""


# --- text analysis ------------------------------------------------------------


def q_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID scores + argmax prediction."""
    from entity_matchers_spark.operators.text_analysis import language_scores

    return language_scores(_docs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "score_en", "score_fr", "score_de", "score_es", "lang_pred"
    )


def _lang_score_sql(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return (
        f"CASE WHEN len(ts) = 0 THEN 0.0 ELSE "
        f"len(list_filter(ts, t -> list_contains([{lst}], t))) / len(ts)::DOUBLE END"
    )


def _build_lang_sql() -> str:
    from entity_matchers_spark.operators.text_analysis import LANG_MARKERS

    scores = ",\n      ".join(
        f"{_lang_score_sql(m)} AS score_{lang}" for lang, m in LANG_MARKERS.items()
    )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    cases = " ".join(f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs)
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents
),
scored AS (
  SELECT id, {scores} FROM toks
)
SELECT id AS doc_id, score_en, score_fr, score_de, score_es,
       CASE WHEN {best} = 0 THEN 'und' {cases} ELSE 'und' END AS lang_pred
FROM scored
"""


def q_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality signals (C4/Gopher-rule inputs)."""
    from entity_matchers_spark.operators.text_analysis import quality_features

    return quality_features(_docs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "n_chars", "n_tokens", "mean_token_len",
        "punct_ratio", "alpha_ratio", "stopword_ratio",
    )


Q_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS ts,
         len(text) AS n_chars
  FROM documents
)
SELECT doc_id, n_chars, len(ts) AS n_tokens,
  CASE WHEN len(ts) = 0 THEN 0.0
       ELSE (n_chars - len(ts) + 1) / len(ts)::DOUBLE END AS mean_token_len,
  CASE WHEN n_chars = 0 THEN 0.0
       ELSE (n_chars - len(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / n_chars::DOUBLE END AS punct_ratio,
  CASE WHEN n_chars = 0 THEN 0.0
       ELSE (n_chars - len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) / n_chars::DOUBLE END AS alpha_ratio,
  CASE WHEN len(ts) = 0 THEN 0.0
       ELSE len(list_filter(ts, t -> list_contains(['the','and','of','to','a','in','is','that'], t)))
            / len(ts)::DOUBLE END AS stopword_ratio
FROM t
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish subword-piece counts per document."""
    from entity_matchers_spark.operators.text_analysis import token_counts

    return token_counts(_docs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "n_ws_tokens", "n_pieces"
    )


Q_TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
  len(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS n_ws_tokens,
  len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS n_pieces
FROM documents
"""


# --- similarity search --------------------------------------------------------


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors (vec_id % 50 == 0),
    broadcast query side, ranked on 6-dp-rounded cosine for stability."""
    from entity_matchers_spark.operators.similarity_search import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") % 50 == 0)
    return cosine_topk(emb, qs, k=5)


Q_ANN_COSINE_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(c.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS cos
  FROM embeddings c, q
  WHERE q.query_id != c.vec_id
)
SELECT query_id, neighbor_id, cos, rnk FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 5
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (rows-only check: candidate set is
    LSH-dependent by design; quality is asserted in tests vs brute force)."""
    from entity_matchers_spark.operators.similarity_search import lsh_ann_topk

    emb = _read(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") % 50 == 0)
    return lsh_ann_topk(emb, qs, k=5)


# --- eval / rescaling on the ER chain -----------------------------------------


def q_er_csls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSLS hubness rescaling over the blocked pair scores (k=10)."""
    scored = _er_spark_scores(spark, sf_dir)
    return matching.csls_rescale(scored, k=10).select(
        "id_a", "id_b", "score", F.round("csls", 6).alias("csls")
    )


Q_ER_CSLS_SQL = (
    f"WITH {_er_blocks_sql()}, {_er_pairs_sql()}, {_er_scores_sql()}, "
    """
  ra AS (
    SELECT id_a, id_b, score,
           row_number() OVER (PARTITION BY id_a ORDER BY score DESC, id_b ASC) AS rn
    FROM final_scored
  ),
  rb AS (
    SELECT id_a, id_b, score,
           row_number() OVER (PARTITION BY id_b ORDER BY score DESC, id_a ASC) AS rn
    FROM final_scored
  ),
  ma AS (SELECT id_a, avg(score) AS m FROM ra WHERE rn <= 10 GROUP BY id_a),
  mb AS (SELECT id_b, avg(score) AS m FROM rb WHERE rn <= 10 GROUP BY id_b)
SELECT s.id_a, s.id_b, s.score, round(2*s.score - ma.m - mb.m, 6) AS csls
FROM final_scored s JOIN ma ON s.id_a = ma.id_a JOIN mb ON s.id_b = mb.id_b
"""
)


def q_er_eval_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-based P/R/F1 of the mutual-best alignment vs a derived truth set
    (pairs with jac3 ≥ 0.55) — the reference's evaluation protocol as a
    single-row query."""
    from entity_matchers_spark.operators.evaluation import precision_recall_f1

    scored = _er_spark_scores(spark, sf_dir)
    aligns = matching.mutual_best(scored).select("id_a", "id_b")
    truth = scored.where(F.col("jac3") >= 0.55).select("id_a", "id_b")
    return precision_recall_f1(aligns, truth)


Q_ER_EVAL_SQL = (
    f"WITH {_er_blocks_sql()}, {_er_pairs_sql()}, {_er_scores_sql()}, "
    """
  best_a AS (
    SELECT id_a, id_b FROM (
      SELECT id_a, id_b,
             row_number() OVER (PARTITION BY id_a ORDER BY score DESC, id_b ASC) AS rn
      FROM final_scored) WHERE rn = 1
  ),
  best_b AS (
    SELECT id_a, id_b FROM (
      SELECT id_a, id_b,
             row_number() OVER (PARTITION BY id_b ORDER BY score DESC, id_a ASC) AS rn
      FROM final_scored) WHERE rn = 1
  ),
  aligns AS (
    SELECT s.id_a, s.id_b FROM final_scored s
    JOIN best_a USING (id_a, id_b) JOIN best_b USING (id_a, id_b)
  ),
  truth AS (SELECT id_a, id_b FROM final_scored WHERE jac3 >= 0.55),
  stats AS (
    SELECT
      (SELECT count(*) FROM aligns JOIN truth USING (id_a, id_b)) AS tp,
      (SELECT count(*) FROM aligns) AS n_align,
      (SELECT count(*) FROM truth) AS n_truth
  )
SELECT tp, n_align, n_truth,
       tp / n_align::DOUBLE AS precision,
       tp / n_truth::DOUBLE AS recall,
       2 * (tp / n_align::DOUBLE) * (tp / n_truth::DOUBLE)
         / ((tp / n_align::DOUBLE) + (tp / n_truth::DOUBLE)) AS f1
FROM stats
"""
)


# ---------------------------------------------------------------------------

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "pricing_summary": (q_pricing_summary, Q_PRICING_SQL),
    "top_revenue_orders": (q_top_revenue_orders, Q_TOP_REVENUE_SQL),
    "top_orders_per_customer": (q_top_orders_per_customer, Q_TOP_ORDERS_PER_CUST_SQL),
    "customers_without_orders": (q_customers_without_orders, Q_CUST_NO_ORDERS_SQL),
    "events_hourly": (q_events_hourly, Q_EVENTS_HOURLY_SQL),
    "er_block_keys": (q_er_block_keys, Q_ER_BLOCK_KEYS_SQL),
    "er_candidate_pairs": (q_er_candidate_pairs, Q_ER_CANDIDATE_PAIRS_SQL),
    "er_pair_scores": (q_er_pair_scores, Q_ER_PAIR_SCORES_SQL),
    "er_mutual_best": (q_er_mutual_best, Q_ER_MUTUAL_BEST_SQL),
    "er_clusters": (q_er_clusters, Q_ER_CLUSTERS_SQL),
    "er_csls": (q_er_csls, Q_ER_CSLS_SQL),
    "er_eval_prf1": (q_er_eval_prf1, Q_ER_EVAL_SQL),
    "dedup_exact": (q_dedup_exact, Q_DEDUP_EXACT_SQL),
    "neardup_jaccard": (q_neardup_jaccard, Q_NEARDUP_JACCARD_SQL),
    "neardup_minhash": (q_neardup_minhash, Q_NEARDUP_MINHASH_SQL),
    "simhash_signatures": (q_simhash_signatures, Q_SIMHASH_SQL),
    "simhash_neardup": (q_simhash_neardup, Q_SIMHASH_NEARDUP_SQL),
    "fingerprints": (q_fingerprints, Q_FINGERPRINTS_SQL),
    "lang_scores": (q_lang_scores, _build_lang_sql()),
    "quality_features": (q_quality_features, Q_QUALITY_SQL),
    "token_counts": (q_token_counts, Q_TOKEN_COUNTS_SQL),
    "ann_cosine_topk": (q_ann_cosine_topk, Q_ANN_COSINE_SQL),
    "ann_lsh_topk": (q_ann_lsh_topk, None),
}
