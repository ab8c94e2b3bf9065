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
