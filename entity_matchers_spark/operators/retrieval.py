"""Sparse text retrieval: BM25 top-k over an inverted index built with
plain DataFrame aggregations.

A training-data pipeline uses this for decontamination-by-retrieval,
nearest-neighbour quality audits, and counterfactual "what would a search
engine surface" checks — the lexical complement of the dense ANN operators
in operators/similarity_search.py.

Plan shape (all native expressions, no Python in the path):

  explode tokens → per-(doc, term) tf  (one partial-agg'd shuffle)
                 → per-term df         (one more, on the tf table)
  posting list  = tf ⨝ df ⨝ broadcast(corpus stats)
  query terms   ⨝ posting lists on term   (the inverted-index probe)
                → integer-sum per (query, doc), top-k window per query.

Determinism contract (the engine-vs-oracle gate hashes values): every
per-(term, doc) BM25 contribution is computed from integers and ONE
corpus-level double (avgdl) with a fixed operand order, then fixed-pointed
to a BIGINT in micro-points; the per-(query, doc) reduction is an integer
sum — order-independent and bit-exact under any partitioning.

At 100 TB: the tf/df aggregations are Zipf-bounded (vocab ~10^8), the
query side is small and broadcast, and the per-query top-k window
partitions by query id. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_matchers_spark.functions.shingles import tokens


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, rank, score): BM25 (Robertson/Spärck Jones;
    Lucene's nonnegative idf variant) top-k documents per query.

    - ``corpus``: (id_col, text_col) documents.
    - ``queries``: (query_id_col, text_col) queries; each query is its
      DISTINCT token set (standard short-query bag-of-words).
    - Self-matches (doc_id == query_id) are excluded so a corpus document
      reused as a query retrieves its neighbours, not itself.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term contribution
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), fixed-pointed to
    micro-points per (term, doc) so the per-(query, doc) sum is exact.
    Ties rank by doc_id ascending (deterministic).
    """
    toks = corpus.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    df_t = tf.groupBy("tok").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),  # exact int/int division
    )

    posting = (
        tf.join(dl, "id")
        .join(df_t, "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "tok",
            "id",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
                * 1e6
            )
            .cast("long")
            .alias("w_fp"),
        )
    )

    q_terms = queries.select(
        F.col(query_id_col).alias("qid"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    hits = (
        posting.join(F.broadcast(q_terms), "tok")
        .where(F.col("id") != F.col("qid"))
        .groupBy("qid", "id")
        .agg(F.sum("w_fp").alias("score_fp"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_fp"), F.asc("id"))
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("id").alias(id_col),
            "rank",
            F.round(F.col("score_fp") / 1e6, 6).alias("score"),
        )
    )


def tfidf_pair_cosine(
    pairs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quant: int = 100,
    tf_cap: int = 1000,
) -> DataFrame:
    """(id_a, id_b, dot, tfidf_cos): TF-IDF-weighted token cosine for
    candidate pairs — the IR-weighted soft token match (rare shared tokens
    count, stopword overlap doesn't) that complements the unweighted
    Jaccard/Levenshtein features in the ER scoring stack.

    Weights are FIXED-POINT: ``w(doc, t) = min(tf, tf_cap) *
    round(quant * (ln((1+N)/(1+df)) + 1))`` — one corpus-scalar double and
    one log per TERM (not per pair), quantized to a BIGINT, so the
    per-pair dot and per-doc norm reductions are integer sums:
    order-independent under any partitioning and bit-exact vs the oracle
    (same discipline as ``bm25_topk``). The only floats are the final
    ``dot / (sqrt(na2) * sqrt(nb2))`` — fixed operand order, rounded 6 dp.
    Magnitude bound: quant=100, tf_cap=1000 keeps per-doc norm sums under
    2^63 for docs up to ~100k distinct terms at N=10^12.

    Plan shape: tf/df aggregations are Zipf-bounded; the pair dot is
    pairs ⨝ weights(id_a) ⨝ weights(id_b on the shared term) — the join
    on (pair, term) explodes only SHARED terms, then one integer groupBy.
    Pairs sharing nothing keep dot = 0 via the left join at the end.
    """
    n_docs = corpus.count()
    tf = (
        corpus.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t"))
        .groupBy("id", "t")
        .agg(F.least(F.count("*"), F.lit(tf_cap)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count("*").alias("df"))
    idf_q = F.round(
        F.lit(float(quant))
        * (F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0))
    ).cast("long")
    weights = (
        tf.join(dfreq, "t")
        .select("id", "t", (F.col("tf") * idf_q).cast("long").alias("w"))
    )
    norms = weights.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    wa = weights.select(F.col("id").alias("id_a"), "t", F.col("w").alias("wa"))
    wb = weights.select(F.col("id").alias("id_b"), "t", F.col("w").alias("wb"))
    dots = (
        pairs.join(wa, "id_a")
        .join(wb, ["id_b", "t"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.withColumnRenamed("id", "id_a").withColumnRenamed("n2", "na2")
    nb = norms.withColumnRenamed("id", "id_b").withColumnRenamed("n2", "nb2")
    return (
        pairs.join(dots, ["id_a", "id_b"], "left")
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a", "id_b",
            F.coalesce("dot", F.lit(0)).cast("long").alias("dot"),
            F.round(
                F.coalesce("dot", F.lit(0))
                / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))),
                6,
            ).alias("tfidf_cos"),
        )
    )
