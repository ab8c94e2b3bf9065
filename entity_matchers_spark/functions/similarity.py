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


def inner_product(a: Column, b: Column) -> Column:
    """Dot product — the reference's ``metric='inner'`` bulk similarity
    (/root/reference/OpenEA_Mod/src/openea/modules/finding/
    similarity.py:37-46 ``np.matmul(embed1, embed2.T)``), one pair per row
    instead of a dense n1×n2 matrix. Native zip_with + aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean_similarity(a: Column, b: Column) -> Column:
    """``1 - euclidean_distance`` — similarity.py:50-53
    (``1 - euclidean_distances(embed1, embed2)``)."""
    sq = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.lit(1.0) - F.sqrt(sq)


def manhattan_similarity(a: Column, b: Column) -> Column:
    """``1 - cityblock_distance`` — similarity.py:58-61; manhattan is the
    best-config metric for RDGCN (args_best/rdgcn_args_DBP_YG_15K.json)."""
    l1 = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.lit(1.0) - l1


def _codes_matrix(s: pd.Series, width: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, width) int32 codepoint matrix (0-padded) + (n,) lengths — built
    with pandas C string kernels (pad + join + utf-32 decode), no per-row
    Python."""
    s = s.fillna("").str.slice(0, width)
    lens = s.str.len().to_numpy(dtype=np.int64)
    padded = s.str.pad(width, side="right", fillchar="\x00")
    buf = "".join(padded.tolist()).encode("utf-32-le")
    codes = np.frombuffer(buf, dtype=np.uint32).reshape(len(s), width)
    return codes, lens


def _jaro_winkler_batch(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Batch Jaro-Winkler, fully numpy-vectorized (no per-row Python, per
    the north star): the greedy character-matching loop runs over *string
    positions* (≤ width iterations), each step a vectorized op across the
    whole batch. Bit-identical to the scalar reference ``_jaro_winkler_one``
    / DuckDB's ``jaro_winkler_similarity``: empty either side → 0.0; boost
    iff jaro > 0.7; prefix ≤ 4; weight 0.1.

    Processed in row chunks so the ~8 live (chunk, width) temporaries stay
    cache-resident: with 32 concurrent workers the full-batch version is
    memory-bandwidth-bound and core-count scaling collapses.
    """
    n = len(s1)
    if n == 0:
        return pd.Series([], dtype=np.float64)
    width = max(int(s1.fillna("").str.len().max() or 0), int(s2.fillna("").str.len().max() or 0))
    if width == 0:
        return pd.Series(np.zeros(n, dtype=np.float64))
    a, la = _codes_matrix(s1, width)
    b, lb = _codes_matrix(s2, width)

    chunk = max(1, 262144 // max(width, 1))  # ~1MB of uint32 codes per side
    if n > chunk:
        parts = [
            _jw_codes_block(a[i : i + chunk], la[i : i + chunk], b[i : i + chunk], lb[i : i + chunk], width)
            for i in range(0, n, chunk)
        ]
        return pd.Series(np.concatenate(parts))
    return pd.Series(_jw_codes_block(a, la, b, lb, width))


def _jw_codes_block(a, la, b, lb, width) -> np.ndarray:
    n = len(la)
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    cols = np.arange(width, dtype=np.int64)
    b_matched = np.zeros((n, width), dtype=bool)
    a_matched = np.zeros((n, width), dtype=bool)
    valid_b = cols[None, :] < lb[:, None]

    for i in range(width):
        active = i < la
        if not active.any():
            break
        lo = i - window
        hi = i + window + 1
        cand = (
            (b == a[:, i : i + 1])
            & ~b_matched
            & valid_b
            & (cols[None, :] >= lo[:, None])
            & (cols[None, :] < hi[:, None])
            & active[:, None]
        )
        hit = cand.any(axis=1)
        j = cand.argmax(axis=1)
        rows = np.nonzero(hit)[0]
        b_matched[rows, j[rows]] = True
        a_matched[rows, i] = True

    m = a_matched.sum(axis=1)

    # k-th matched char of a (in i order) vs k-th matched char of b (in j
    # order): scatter by per-row match rank, count half-transpositions.
    rank_a = np.cumsum(a_matched, axis=1) - 1
    rank_b = np.cumsum(b_matched, axis=1) - 1
    am = np.zeros((n, width), dtype=a.dtype)
    bm = np.zeros((n, width), dtype=b.dtype)
    ra, ca = np.nonzero(a_matched)
    rb, cb = np.nonzero(b_matched)
    am[ra, rank_a[ra, ca]] = a[ra, ca]
    bm[rb, rank_b[rb, cb]] = b[rb, cb]
    in_m = cols[None, :] < m[:, None]
    t = ((am != bm) & in_m).sum(axis=1) // 2

    m_f = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m_f / la + m_f / lb + (m_f - t) / m_f) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)

    pw = min(4, width)
    eq4 = (a[:, :pw] == b[:, :pw]) & (cols[None, :pw] < np.minimum(la, lb)[:, None])
    prefix = np.cumprod(eq4, axis=1).sum(axis=1).astype(np.float64)
    out = np.where(jaro > 0.7, jaro + 0.1 * prefix * (1.0 - jaro), jaro)

    equal = (la == lb) & (a == b).all(axis=1)
    out = np.where(equal, 1.0, out)
    out = np.where((la == 0) | (lb == 0), 0.0, out)
    return out


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


def _jaccard_hashed_batch(sa: pd.Series, sb: pd.Series) -> pd.Series:
    """Batch Jaccard over distinct-int-hash arrays, fully vectorized.

    The native ``array_intersect`` builds a boxed hash set per row; at 6M+
    pairs x ~250 elements that allocation rate collapses into GC and the
    stage scales INVERSELY with cores (measured 24s@8 -> 96s@32 on
    identical input). Here: pack (row, value) into one uint64 per element
    (value < 2^32 by construction, row < 2^32 per Arrow batch), sort the
    concatenated a+b keys, count adjacent duplicates per row — one C-speed
    sort per batch, zero per-row Python in the element math.
    """
    inter, la, lb, null_mask = _inter_counts_batch(sa, sb)
    n = len(sa)
    if n == 0:
        return pd.Series([], dtype=np.float64)
    union = la + lb - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = inter / union.astype(np.float64)
    out = np.where(union > 0, jac, 0.0)
    if null_mask.any():
        out = np.where(null_mask, np.nan, out)
    return pd.Series(out)


def _inter_counts_batch(
    sa: pd.Series, sb: pd.Series
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(inter, |a|, |b|, null_mask) per row — the shared pack-sort-bincount
    intersection kernel behind the Jaccard and containment UDFs."""
    n = len(sa)
    if n == 0:
        z = np.array([], dtype=np.int64)
        return z, z, z, np.array([], dtype=bool)
    a_arrays = sa.to_numpy()
    b_arrays = sb.to_numpy()
    # Null-safe: a null text column yields a None array element; treat it as
    # empty for the math and emit null (NaN) for that row, matching the
    # native expression's null-in -> null-out contract. pandas isna is a C
    # kernel (element-is-None on object dtype) — no per-row Python.
    null_mask = sa.isna().to_numpy() | sb.isna().to_numpy()
    if null_mask.any():
        empty = np.array([], dtype=np.int64)
        a_arrays = np.array([empty if x is None else x for x in a_arrays], dtype=object)
        b_arrays = np.array([empty if x is None else x for x in b_arrays], dtype=object)
    la = np.fromiter((len(x) for x in a_arrays), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b_arrays), dtype=np.int64, count=n)
    rows_a = np.repeat(np.arange(n, dtype=np.uint64), la)
    rows_b = np.repeat(np.arange(n, dtype=np.uint64), lb)
    vals_a = (np.concatenate(a_arrays) if la.sum() else np.array([], dtype=np.int64)).astype(np.uint64)
    vals_b = (np.concatenate(b_arrays) if lb.sum() else np.array([], dtype=np.int64)).astype(np.uint64)
    both = np.concatenate([(rows_a << np.uint64(32)) | vals_a, (rows_b << np.uint64(32)) | vals_b])
    both.sort()
    dup = both[1:] == both[:-1]
    shared_rows = (both[1:][dup] >> np.uint64(32)).astype(np.int64)
    inter = np.bincount(shared_rows, minlength=n)
    return inter, la, lb, null_mask


@pandas_udf(DoubleType())
def jaccard_hashed_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return _jaccard_hashed_batch(a, b)


@pandas_udf(DoubleType())
def containment_hashed_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Broder containment C(a→b) = |a ∩ b| / |a| over distinct-int-hash
    arrays — the asymmetric near-dup measure (a quote or syndicated article
    is CONTAINED in its host page even when Jaccard is tiny). Same
    pack-sort-bincount kernel as the Jaccard UDF; |a| = 0 → 0.0."""
    inter, la, _lb, null_mask = _inter_counts_batch(a, b)
    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = inter / la.astype(np.float64)
    out = np.where(la > 0, c, 0.0)
    if null_mask.any():
        out = np.where(null_mask, np.nan, out)
    return pd.Series(out)
