"""Pairwise similarity functions.

Reference precedents: Levenshtein.ratio scoring
(/root/reference/OpenEA_Mod/src/openea/approaches/imuse.py:195-198), 3-gram
Jaccard (/root/reference/deepmatcher/notebooks/create_dataset_neighbor.py:94-109),
cosine over embeddings
(/root/reference/OpenEA_Mod/src/openea/modules/finding/similarity.py:12-91).

Everything that Spark can express natively IS native (levenshtein, Jaccard
over arrays, cosine via zip_with/aggregate — all whole-stage codegen).
Jaro-Winkler has no Spark builtin, so it is an Arrow-batched pandas UDF
(never row-at-a-time Python) implementing the standard algorithm with
boost-threshold 0.7 / prefix ≤ 4 / weight 0.1 — verified bit-compatible with
DuckDB's ``jaro_winkler_similarity`` in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def levenshtein_ratio(a: Column | str, b: Column | str) -> Column:
    """1 - lev(a,b)/max(len) — the reference's Levenshtein.ratio analog,
    via the native ``levenshtein`` builtin. Both empty → 1.0."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    mx = F.greatest(F.length(ca), F.length(cb))
    return F.when(mx == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(ca, cb) / mx.cast("double")
    )


def token_set_levenshtein_ratio(a: Column | str, b: Column | str) -> Column:
    """Levenshtein ratio over the sorted deduped token sets.

    Canonicalizes word order/duplication first (token-set semantics), then
    compares — deterministic and order-insensitive, unlike fuzzy
    token_set_ratio variants. Fully native: sort_array + concat_ws +
    levenshtein.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b

    def canon(c: Column) -> Column:
        return F.concat_ws(
            " ", F.sort_array(F.array_distinct(F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")))
        )

    return levenshtein_ratio(canon(ca), canon(cb))


def jaccard_arrays(a: Column, b: Column) -> Column:
    """Jaccard over two (deduped) arrays via array_intersect/array_union sizes.
    Both empty → 0.0 (matches strsimpy's 3-gram-Jaccard-on-empty behavior)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union.cast("double"))


def char_jaccard(a: Column | str, b: Column | str) -> Column:
    """Jaccard over distinct single characters (DuckDB ``jaccard`` parity)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b

    def chars(c: Column) -> Column:
        return F.array_distinct(F.filter(F.split(c, ""), lambda t: t != ""))

    return jaccard_arrays(chars(ca), chars(cb))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over two ``array<float|double>`` columns — native zip_with +
    aggregate (no UDF). Zero-norm vectors → 0.0."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def _jaro_winkler_batch(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Vectorized-per-batch Jaro-Winkler matching DuckDB semantics:
    empty either side → 0.0; boost iff jaro > 0.7; prefix ≤ 4; weight 0.1."""
    out = np.empty(len(s1), dtype=np.float64)
    a_list = s1.fillna("").to_numpy()
    b_list = s2.fillna("").to_numpy()
    for i in range(len(out)):
        out[i] = _jaro_winkler_one(a_list[i], b_list[i])
    return pd.Series(out)


def _jaro_winkler_one(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    b_matched = bytearray(lb)
    a_matched_chars = []
    for i, ch in enumerate(a):
        lo = i - window if i - window > 0 else 0
        hi = i + window + 1 if i + window + 1 < lb else lb
        for j in range(lo, hi):
            if not b_matched[j] and b[j] == ch:
                b_matched[j] = 1
                a_matched_chars.append(ch)
                break
    m = len(a_matched_chars)
    if m == 0:
        return 0.0
    b_matched_chars = [b[j] for j in range(lb) if b_matched[j]]
    t = sum(ca != cb for ca, cb in zip(a_matched_chars, b_matched_chars)) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return jaro + 0.1 * prefix * (1.0 - jaro)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return _jaro_winkler_batch(a, b)
