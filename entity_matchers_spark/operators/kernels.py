"""Kernel-pooled set similarity (BERT-INT "dual aggregation", SURVEY.md
§2.4).

The reference computes, per candidate pair, a neighbor-embedding ×
neighbor-embedding similarity matrix, max-pools rows and columns, passes
the pooled values through 21 RBF kernels (KNRM binning: exact-match kernel
mu=1.0 sigma=0.001 + 20 kernels spaced 0.1 with sigma=0.1) and log-sum-pools
into a fixed feature vector
(/root/reference/bert-int/interaction_model/dual_aggregation_func.py:7-54;
neighbor view get_neighView_and_desView_interaction_feature.py:44-88;
sets pre-collected with cap+pad /root/reference/bert-int/interaction_model/
utils.py:17-68).

Here the "neighbor set" is the document's token set (cap+pad, like the
reference's max_length truncation) and token embeddings are deterministic
md5-derived unit-norm vectors — no trained model, same dataflow. The whole
batch is ONE einsum per direction (no per-row Python): Arrow hands the
token-hash arrays to numpy, (n, T, D) tensors, sim = A @ B^T, masked
max-pool, kernel features.

Scale: per-doc token arrays are computed map-side and capped at
``max_tokens`` (bounded row width); the pair join ships 8*T bytes per side;
the UDF is O(T^2 * D) per pair, fully vectorized.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

from entity_matchers_spark.functions.shingles import tokens

KERNEL_MUS = [1.0] + [round(-0.95 + 0.1 * k, 2) for k in range(20)]
KERNEL_SIGMAS = [0.001] + [0.1] * 20
NUM_KERNELS = len(KERNEL_MUS)  # 21 per pooling direction -> 42 features


@functools.lru_cache(maxsize=65536)
def _token_vector(token_hash: int, dim: int) -> np.ndarray:
    """Deterministic unit-norm embedding from the token hash: md5 bytes ->
    centered floats -> L2 normalize. Any engine/worker reproduces it.

    lru_cache (bounded) rather than an unbounded memo dict: on a
    high-cardinality token space a per-worker vocab would otherwise grow
    without bound over the worker's lifetime."""
    h = hashlib.md5(str(int(token_hash)).encode()).digest()
    raw = np.frombuffer((h * ((dim // 16) + 1))[:dim], dtype=np.uint8).astype(np.float64)
    v = raw - 127.5
    n = np.linalg.norm(v)
    return v / n if n else v


def doc_token_hashes(df: DataFrame, id_col: str, text_col: str, max_tokens: int = 32) -> DataFrame:
    """(id, toks: array<long>) — distinct sorted token hashes, capped
    (the reference's truncate-and-pad collection, utils.py:17-68)."""
    toks = F.slice(
        F.sort_array(
            F.array_distinct(
                F.transform(
                    tokens(F.col(text_col)),
                    lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
                )
            )
        ),
        1,
        max_tokens,
    )
    return df.select(F.col(id_col).alias("id"), toks.alias("toks"))


def _embed_batch(arrs: pd.Series, max_tokens: int, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, T, D) embedding tensor + (n, T) validity mask.

    Vectorized vocab-then-gather (no per-PAIR Python): flatten the batch's
    token hashes, ``np.unique`` them into a small per-batch vocabulary,
    compute each unique token's vector once (bounded by vocab size, not
    rows × T — the md5 hash is the only remaining Python loop and runs per
    DISTINCT token), then scatter-gather the (vocab, D) matrix into the
    (n, T, D) tensor with fancy indexing."""
    n = len(arrs)
    out = np.zeros((n, max_tokens, dim), dtype=np.float64)
    mask = np.zeros((n, max_tokens), dtype=bool)
    lens = np.fromiter(
        (0 if a is None else min(len(a), max_tokens) for a in arrs),
        dtype=np.int64, count=n,
    )
    total = int(lens.sum())
    if total == 0:
        return out, mask
    flat = np.concatenate(
        [np.asarray(a[:max_tokens], dtype=np.int64) for a in arrs if a is not None and len(a)]
    )
    uniq, inv = np.unique(flat, return_inverse=True)
    vocab = np.empty((len(uniq), dim), dtype=np.float64)
    for i, t in enumerate(uniq):
        vocab[i] = _token_vector(int(t), dim)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    cols = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
    out[rows, cols] = vocab[inv]
    mask[rows, cols] = True
    return out, mask


def _kernel_features(pooled: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """(n, T) max-pooled sims + validity mask -> (n, 21) log-sum kernel
    features (dual_aggregation_func.py semantics)."""
    n = pooled.shape[0]
    feats = np.empty((n, NUM_KERNELS), dtype=np.float64)
    for k, (mu, sigma) in enumerate(zip(KERNEL_MUS, KERNEL_SIGMAS)):
        rbf = np.exp(-((pooled - mu) ** 2) / (2.0 * sigma * sigma)) * mask
        feats[:, k] = np.log1p(rbf.sum(axis=1))
    return feats


def kernel_features_udf(max_tokens: int = 32, dim: int = 16):
    """pandas UDF (toks_a, toks_b) -> array<double> of 42 kernel features
    (21 row-pooled + 21 col-pooled)."""
    @pandas_udf(ArrayType(DoubleType()))
    def _feats(ta: pd.Series, tb: pd.Series) -> pd.Series:
        A, ma = _embed_batch(ta, max_tokens, dim)
        B, mb = _embed_batch(tb, max_tokens, dim)
        sim = np.einsum("ntd,nsd->nts", A, B)  # cosine: vectors are unit-norm
        valid = ma[:, :, None] & mb[:, None, :]
        sim = np.where(valid, sim, -np.inf)
        row_pool = sim.max(axis=2)  # best B-match per A-token
        col_pool = sim.max(axis=1)  # best A-match per B-token
        row_pool = np.where(ma, row_pool, 0.0)
        col_pool = np.where(mb, col_pool, 0.0)
        f = np.concatenate([_kernel_features(row_pool, ma), _kernel_features(col_pool, mb)], axis=1)
        return pd.Series(list(f))

    return _feats


def kernel_pooled_features(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_tokens: int = 32,
    dim: int = 16,
) -> DataFrame:
    """(id_a, id_b, kernel_feats: array<double>[42]) over candidate pairs —
    the feature vector the reference's MLP consumes (interaction_model.py:
    37-45); our calibrated blend can consume selected components the same
    way."""
    toks = doc_token_hashes(docs, id_col, text_col, max_tokens)
    a = toks.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = toks.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    sc = pairs.sparkSession.sparkContext
    joined = (
        pairs.repartition(3 * sc.defaultParallelism, "id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
    )
    feats = kernel_features_udf(max_tokens, dim)
    return joined.select("id_a", "id_b", feats(F.col("toks_a"), F.col("toks_b")).alias("kernel_feats"))
