"""BM25 retrieval and BPE merge statistics against scalar references."""

import math

import pytest

from entity_matchers_spark.operators.retrieval import bm25_topk
from entity_matchers_spark.operators.text_analysis import bpe_merge_counts


def test_bm25_topk_hand_check(spark):
    """4-doc corpus, one query: scores match a scalar BM25 (Lucene idf,
    k1=1.2 b=0.75, fixed-point micro-point contributions), self-match
    excluded, ties rank by doc_id."""
    docs = [
        (0, "cat dog cat"),
        (1, "cat fish"),
        (2, "dog dog dog bird"),
        (3, "fish bird"),
    ]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    queries = spark.createDataFrame([(0, "cat dog")], "query_id long, text string")
    out = bm25_topk(corpus, queries, k=3).collect()

    # scalar reference
    toks = {d: t.split() for d, t in docs}
    tf = {d: {w: ts.count(w) for w in set(ts)} for d, ts in toks.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df = {}
    for d in tf:
        for w in tf[d]:
            df[w] = df.get(w, 0) + 1

    def w_fp(term, d):
        idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
        num = tf[d][term] * (1.2 + 1.0)
        den = tf[d][term] + 1.2 * (1.0 - 0.75 + 0.75 * dl[d] / avgdl)
        return round(idf * num / den * 1e6)

    expect = {}
    for d in (1, 2, 3):  # doc 0 is the query itself -> excluded
        s = sum(w_fp(t, d) for t in ("cat", "dog") if t in tf[d])
        if s != 0:
            expect[d] = s
    order = sorted(expect, key=lambda d: (-expect[d], d))

    assert [r["doc_id"] for r in out] == order
    assert [r["rank"] for r in out] == list(range(1, len(order) + 1))
    for r in out:
        assert r["query_id"] == 0
        assert abs(r["score"] - round(expect[r["doc_id"]] / 1e6, 6)) < 1e-12
    # doc 2 (three 'dog') must beat doc 1 (one 'cat', saturated tf)
    assert out[0]["doc_id"] == 2


def test_bm25_excludes_self_and_respects_k(spark):
    corpus = spark.createDataFrame(
        [(i, "alpha beta") for i in range(6)], "doc_id long, text string"
    )
    queries = spark.createDataFrame([(0, "alpha")], "query_id long, text string")
    out = bm25_topk(corpus, queries, k=2).collect()
    assert len(out) == 2
    assert all(r["doc_id"] != 0 for r in out)
    # identical scores -> ties broken by ascending doc_id
    assert [r["doc_id"] for r in out] == [1, 2]


def test_bpe_merge_counts_hand_check(spark):
    """Adjacent-pair counts over token arrays; top-n ordered by
    (count desc, pair asc); single-token docs contribute nothing."""
    docs = [
        (0, "a b a b c"),  # pairs: a b, b a, a b, b c
        (1, "a b"),        # a b
        (2, "c"),          # no pairs
        (3, "b c a"),      # b c, c a
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bpe_merge_counts(df, top_n=10).collect()
    got = [(r["rank"], r["pair"], r["cnt"]) for r in out]
    assert got == [
        (1, "a b", 3),
        (2, "b c", 2),
        (3, "b a", 1),
        (4, "c a", 1),
    ]


def test_winnowing_fingerprints_hand_check(spark):
    """Scalar winnowing reference: k-gram md5 hashes, w-window minima,
    rightmost tie rule, dedup. Also: the guarantee that two docs sharing
    a (w+k-1)-char substring share a fingerprint."""
    import hashlib

    from entity_matchers_spark.operators.text_analysis import winnowing_fingerprints

    k, w = 3, 4
    docs = [
        (0, "abcdefghijkl"),
        (1, "zzzzzzzz"),          # all identical grams -> ties everywhere
        (2, "xy"),                # shorter than k -> no grams, no rows
        (3, "qrabcdefgh"),        # shares 'abcdefgh' (w+k-1=6+ chars) with doc 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = winnowing_fingerprints(df, k=k, w=w).collect()
    got = {(r["id"], r["pos"], r["fp"]) for r in out}

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16)

    expect = set()
    for d, t in docs:
        t = t.lower()
        hs = [h(t[i : i + k]) for i in range(len(t) - k + 1)]
        n = len(hs)
        if n == 0:
            continue
        starts = range(max(n - w + 1, 1)) if n >= w else [0]
        for s in starts:
            win = hs[s : s + w]
            m = min(win)
            pos = max(i for i in range(s, min(s + w, n)) if hs[i] == m)
            expect.add((d, pos, m))
    assert got == expect
    assert not any(r["id"] == 2 for r in out)
    # shared-substring guarantee: docs 0 and 3 share at least one fp value
    fps0 = {fp for d, _, fp in got if d == 0}
    fps3 = {fp for d, _, fp in got if d == 3}
    assert fps0 & fps3


def test_tfidf_pair_cosine_hand_case(spark):
    """Fixed-point weights replayed driver-side; stopword overlap scores
    lower than rare-token overlap."""
    import math

    from entity_matchers_spark.operators.retrieval import tfidf_pair_cosine

    docs = spark.createDataFrame(
        [(1, "the rare zebra"), (2, "the rare yak"), (3, "the the common")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    got = {(r.id_a, r.id_b): (r.dot, r.tfidf_cos)
           for r in tfidf_pair_cosine(pairs, docs).collect()}

    def idf_q(df):
        return round(100.0 * (math.log((1.0 + 3) / (1.0 + df)) + 1.0))

    w = {  # (doc, token) -> weight
        (1, "the"): idf_q(3), (1, "rare"): idf_q(2), (1, "zebra"): idf_q(1),
        (2, "the"): idf_q(3), (2, "rare"): idf_q(2), (2, "yak"): idf_q(1),
        (3, "the"): 2 * idf_q(3), (3, "common"): idf_q(1),
    }
    def norm(d):
        return math.sqrt(sum(v * v for (doc, _), v in w.items() if doc == d))
    dot12 = w[(1, "the")] * w[(2, "the")] + w[(1, "rare")] * w[(2, "rare")]
    dot13 = w[(1, "the")] * w[(3, "the")]
    assert got[(1, 2)] == (dot12, round(dot12 / (norm(1) * norm(2)), 6))
    assert got[(1, 3)] == (dot13, round(dot13 / (norm(1) * norm(3)), 6))
    # rare-token overlap dominates stopword overlap
    assert got[(1, 2)][1] > got[(1, 3)][1]
