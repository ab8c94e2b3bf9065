"""IVF assignment-kernel tests: the vectorized pandas-UDF path and the
crossJoin + HOF-fold path must be value-identical (same distances into the
same scaled-floor rounding device, same (dist, cid) tie-break), because the
physical path is chosen by centroid count — a plan decision must never
change results."""

from __future__ import annotations

import numpy as np
import pytest


def _toy_vectors(n=60, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    # include duplicated vectors so distance TIES exercise the cid tie-break
    base = rng.rand(max(4, n // 3), dim)
    rows = [
        (int(i), [float(x) for x in base[i % len(base)]]) for i in range(n)
    ]
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _toy_vectors(), "vec_id long, embedding array<double>"
    ).localCheckpoint()


def _collect_assign(df):
    return sorted((r[0], r.cid) for r in df.collect())


def test_assign_cells_vectorized_equals_crossjoin(spark, emb, monkeypatch):
    """Forcing the crossJoin fallback (cap=0) must reproduce the vectorized
    path's assignments exactly, including on duplicate-vector ties."""
    import entity_matchers_spark.operators.similarity_search as ss

    cents = ss._centroids(emb, "vec_id", "embedding", 7)
    fast = _collect_assign(
        ss._assign_cells(emb, cents, "vec_id", "embedding", "x", 3)
    )
    monkeypatch.setattr(ss, "_ASSIGN_UDF_MAX_CENTROIDS", 0)
    slow = _collect_assign(
        ss._assign_cells(emb, cents, "vec_id", "embedding", "x", 3)
    )
    assert fast == slow
    assert len(fast) == emb.count() * 3


def test_assign_cells_matches_numpy_reference(spark, emb):
    """Nearest-centroid assignment (n=1) equals a plain numpy argmin over
    the same scaled-floor-rounded L2, ties on centroid id ascending."""
    import entity_matchers_spark.operators.similarity_search as ss

    stride = 7
    rows = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    cids = sorted(i for i in rows if i % stride == 0)
    C = np.vstack([rows[c] for c in cids])
    want = {}
    for i, v in rows.items():
        acc = np.zeros(len(cids))
        for dd in range(v.size):
            acc += (v[dd] - C[:, dd]) ** 2
        d = np.floor(np.sqrt(acc) * 1e6 + 0.5) / 1e6
        want[i] = cids[int(np.argmin(d))]  # argmin is first-min = cid-asc tie-break
    cents = ss._centroids(emb, "vec_id", "embedding", stride)
    got = dict(
        _collect_assign(ss._assign_cells(emb, cents, "vec_id", "embedding", "x", 1))
    )
    assert got == want


def test_ivf_string_ids(spark, monkeypatch):
    """String ids work end-to-end: centroid sampling falls back to the
    md5-prefix hash, both assignment paths agree, and the nearest-centroid
    choice matches a numpy replay of the same rule."""
    import hashlib

    import entity_matchers_spark.operators.similarity_search as ss

    vecs = {f"doc_{i:03d}": v for (i, v) in _toy_vectors(n=50, seed=5)}
    emb = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id string, embedding array<double>"
    ).localCheckpoint()
    stride = 5
    md5pick = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % stride == 0
    cid_list = sorted(k for k in vecs if md5pick(k))
    assert cid_list, "fixture must yield a non-empty centroid sample"
    cents = ss._centroids(emb, "vec_id", "embedding", stride)
    assert sorted(r.cid for r in cents.collect()) == cid_list

    fast = _collect_assign(ss._assign_cells(emb, cents, "vec_id", "embedding", "x", 2))
    monkeypatch.setattr(ss, "_ASSIGN_UDF_MAX_CENTROIDS", 0)
    slow = _collect_assign(ss._assign_cells(emb, cents, "vec_id", "embedding", "x", 2))
    assert fast == slow

    C = np.vstack([vecs[c] for c in cid_list])
    nearest = {}
    for (j, cid) in ss._assign_cells(
        emb, cents, "vec_id", "embedding", "x", 1
    ).select("x_id", "cid").collect():
        nearest[j] = cid
    for i, v in vecs.items():
        v = np.asarray(v)
        acc = np.zeros(len(cid_list))
        for dd in range(v.size):
            acc += (v[dd] - C[:, dd]) ** 2
        d = np.floor(np.sqrt(acc) * 1e6 + 0.5) / 1e6
        assert nearest[i] == cid_list[int(np.argmin(d))]


def test_ivf_topk_recalls_probed_bruteforce(spark, emb):
    """ivf_topk's per-query ranking equals brute-force cosine top-k
    restricted to the probed cells' members (IVF is exact within its
    candidate set)."""
    from entity_matchers_spark.operators.similarity_search import ivf_topk

    qs = emb.where("vec_id % 10 = 0")
    out = ivf_topk(emb, qs, k=3, nprobe=2, centroid_stride=7,
                   id_col="vec_id", vec_col="embedding")
    rows = out.collect()
    assert rows, "ivf_topk returned nothing"
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rnk, r.neighbor_id, r.cos))
    for q, lst in by_q.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        coss = [x[2] for x in lst]
        assert coss == sorted(coss, reverse=True)
        assert all(n != q for _, n, _ in lst)
