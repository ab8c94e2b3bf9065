"""Similarity search over embedding columns (``array<float>``).

The reference's embedding-cosine top-k candidate generation
(/root/reference/bert-int/interaction_model/get_entity_embedding.py:20-35,
utils.py:71-110: batched GPU matmul + topk) — re-expressed without a dense
matrix:

- brute-force cosine top-k: query×corpus join pruned to a query subset;
  native zip_with/aggregate dot product; window top-k. The *correctness
  baseline* — O(|Q|·n), fine for |Q| small or one-off audits.
- LSH-bucketed ANN: random-hyperplane sign bits (the in-repo precedent is
  lshash.py's hyperplanes) from deterministic md5-derived plane vectors;
  multi-table union of same-bucket candidates, cosine-ranked. The scale
  path: candidates ∝ bucket size, not corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_matchers_spark.functions.hashing import minhash_permutation_params
from entity_matchers_spark.functions.similarity import (
    cosine_similarity,
    euclidean_similarity,
    inner_product,
    manhattan_similarity,
)


def _rounded_cosine(a: Column, b: Column) -> Column:
    """Cosine rounded to 6 dp: ranking keys must be stable across engines
    whose float summation order may differ by a ULP."""
    return F.round(cosine_similarity(a, b), 6)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos) — exact top-k by cosine, excluding self.

    Queries are broadcast (small side by contract); the corpus streams
    through one stage computing the dot products, then a window takes top-k
    per query. No n×n materialization.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _rounded_cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def multimetric_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_metric: str = "manhattan",
) -> DataFrame:
    """(query_id, neighbor_id, inner, cos, euc, man, rnk) — the reference's
    full bulk-similarity metric set (/root/reference/OpenEA_Mod/src/openea/
    modules/finding/similarity.py:12-91: inner / cosine / 1-euclidean /
    1-manhattan), ranked on ``rank_metric`` (manhattan = RDGCN's best
    config, args_best/rdgcn_args_DBP_YG_15K.json).

    Same plan shape as cosine_topk: broadcast query side, one streaming
    stage computes all four metrics from a single pass over the pair's
    vectors, window top-k. No n×n matrix, no UDF."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    qv, cv = F.col("qv"), F.col("cv")
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(inner_product(qv, cv), 6).alias("inner"),
            F.round(cosine_similarity(qv, cv), 6).alias("cos"),
            F.round(euclidean_similarity(qv, cv), 6).alias("euc"),
            F.round(manhattan_similarity(qv, cv), 6).alias("man"),
        )
    )
    rank_col = {"inner": "inner", "cosine": "cos", "euclidean": "euc", "manhattan": "man"}[rank_metric]
    w = Window.partitionBy("query_id").orderBy(F.col(rank_col).desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "inner", "cos", "euc", "man", "rnk")
    )


def _plane_signs(dim: int, num_planes: int, num_tables: int, seed: int):
    """(num_tables*num_planes, dim) ±1 matrix from the seeded LCG — plan
    constants, identical on every executor; no artifacts to ship."""
    params = minhash_permutation_params(num_tables * num_planes * dim, seed)
    signs = np.array([1.0 if a % 2 == 0 else -1.0 for a, _b in params], dtype=np.float64)
    return signs.reshape(num_tables * num_planes, dim)


def hyperplane_bucket_keys_udf(
    dim: int, num_planes: int, num_tables: int, seed: int = 11037
):
    """Vectorized bucketing: one Arrow batch → all tables' bucket keys.

    Sign-bit LSH as ONE numpy matmul per batch instead of
    tables×planes×dim unrolled column expressions — the expression form
    generates megabytes of codegen (Janino compile dominates runtime) and
    falls off the fast path. Bucket key for table t: ``"t<t>:<packed sign
    bits of v·r_i>"``, bit i weighted 2^i, strictly-positive dot = 1.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    planes_t = _plane_signs(dim, num_planes, num_tables, seed).T  # (dim, T*P)
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    @pandas_udf(ArrayType(StringType()))
    def _bucket_keys(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (m @ planes_t) > 0  # (n, T*P)
        codes = (bits.reshape(len(m), num_tables, num_planes) * weights).sum(axis=2)
        return pd.Series([[f"t{t}:{row[t]}" for t in range(num_tables)] for row in codes])

    return _bucket_keys


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    centroid_stride: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into inverted lists, probe
    the ``nprobe`` nearest lists per query, exact cosine top-k within.

    The standard billion-scale ANN layout (IVF/Faiss family): candidates
    per query ∝ probed-list sizes (≈ nprobe·n/√n with √n centroids), never
    the corpus. Centroids here are a deterministic corpus sample (every
    ``centroid_stride``-th id — the k-means training step is replaced by a
    seedless deterministic choice so the oracle reproduces the exact
    partition); assignment = nearest centroid by 6-dp-rounded L2, ties on
    centroid id. The inverted-list assignment is computed once and is the
    natural partitioning key for a materialized index table.
    """
    from pyspark.sql import Window

    cents = corpus.where(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )

    def l2(a: Column, b: Column) -> Column:
        return F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                               * (x.cast("double") - y.cast("double"))),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ),
            6,
        )

    def assign(df: DataFrame, prefix: str, n: int) -> DataFrame:
        d = df.select(F.col(id_col).alias(f"{prefix}_id"), F.col(vec_col).alias(f"{prefix}_vec"))
        w = Window.partitionBy(f"{prefix}_id").orderBy(F.col("_d").asc(), F.col("cid").asc())
        return (
            d.crossJoin(F.broadcast(cents))
            .withColumn("_d", l2(F.col(f"{prefix}_vec"), F.col("cvec")))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= n)
            .select(f"{prefix}_id", f"{prefix}_vec", "cid")
        )

    lists = assign(corpus, "neighbor", 1)          # inverted lists: 1 cell per vector
    probes = assign(queries, "query", nprobe)      # nprobe cells per query
    cands = (
        probes.join(lists, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_vec", "neighbor_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        cands.select(
            "query_id", "neighbor_id",
            _rounded_cosine(F.col("query_vec"), F.col("neighbor_vec")).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def lsh_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 8,
    seed: int = 11037,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same-bucket candidates over
    ``num_tables`` hyperplane tables, verified by exact cosine ≥ threshold.

    The embedding analog of the MinHash near-dup path: candidates come from
    bucket equi-joins (∝ bucket sizes, never n²), verification is the exact
    native cosine. Fewer planes per table → coarser buckets → higher recall
    at moderate thresholds; recall is tunable via (planes, tables) exactly
    like band/row counts in MinHash-LSH. The oracle reproduces the same
    deterministic bucketing, so the gate checks the operator value-for-value.
    """
    keys_udf = hyperplane_bucket_keys_udf(dim, num_planes, num_tables, seed)
    b = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(keys_udf(F.col(vec_col))).alias("bucket"),
    )
    cands = (
        b.alias("l")
        .join(b.alias("r"), "bucket")
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.vec").alias("va"),
            F.col("r.vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.select("id_a", "id_b", _rounded_cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 11037,
) -> DataFrame:
    """Approximate top-k: union of same-bucket candidates over ``num_tables``
    hyperplane tables, cosine-ranked per query.

    Each table is an equi-join on a 8-bit bucket id → expected candidate set
    n/256 per table. Recall grows with tables; cost stays ∝ bucket sizes.
    """
    from pyspark.sql import Window

    keys_udf = hyperplane_bucket_keys_udf(dim, num_planes, num_tables, seed)

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            F.explode(keys_udf(F.col(vec_col))).alias("bucket"),
        )

    qb = bucketed(queries, "query")
    cb = bucketed(corpus, "neighbor")
    cands = (
        cb.join(qb, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_vec", "neighbor_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        _rounded_cosine(F.col("query_vec"), F.col("neighbor_vec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )
