"""A-ES weighted sampling — verified against a driver-side Python replay of
the exact key construction (md5-uniform, ln(u)/w, 1e9 quantization) and
against the paper's semantics (k largest u^(1/w) keys per stratum)."""

from __future__ import annotations

import hashlib
import math

import pytest


def _u(salt: str, doc_id: int) -> float:
    h = int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16)
    return (h + 0.5) / 4294967296.0


def _key_q(salt: str, doc_id: int, w: float, quant: int = 10**9) -> int:
    # Spark F.round is HALF_UP (half away from zero); Python's round() is
    # banker's. Emulate HALF_UP explicitly so a key landing exactly on .5
    # can't make the replay disagree with a correct operator.
    x = math.log(_u(salt, doc_id)) / w * quant
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


@pytest.fixture()
def weighted_docs(spark):
    rows = [
        # (doc_id, stratum, weight)
        *[(i, "en", float(1 + i % 7)) for i in range(40)],
        *[(100 + i, "de", 10.0 ** (i % 4)) for i in range(30)],  # heavy skew
        (900, "fr", 5.0),
        (901, "fr", 0.0),   # zero weight: excluded
        (902, "fr", -3.0),  # negative weight: excluded
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, lang string, w double")


def test_weighted_sample_matches_python_reference(spark, weighted_docs):
    from entity_matchers_spark.operators.sampling import weighted_sample

    rows, df = weighted_docs
    k = 8
    got = {
        (r.doc_id): (r.lang, r.key_q, r.rn)
        for r in weighted_sample(df, k, "w", strata_cols=("lang",)).collect()
    }

    # Python replay: per stratum, rank by (key_q desc, id asc), keep top k.
    by_stratum: dict[str, list[tuple[int, int]]] = {}
    for doc_id, lang, w in rows:
        if w <= 0:
            continue
        by_stratum.setdefault(lang, []).append((_key_q("aes:", doc_id, w), doc_id))
    expect = {}
    for lang, keyed in by_stratum.items():
        keyed.sort(key=lambda t: (-t[0], t[1]))
        for rn, (kq, doc_id) in enumerate(keyed[:k], start=1):
            expect[doc_id] = (lang, kq, rn)

    assert got == expect
    assert 901 not in got and 902 not in got  # non-positive weights excluded


def test_weighted_sample_k_larger_than_stratum_keeps_all(spark, weighted_docs):
    from entity_matchers_spark.operators.sampling import weighted_sample

    _, df = weighted_docs
    out = weighted_sample(df, 1000, "w", strata_cols=("lang",))
    # every positive-weight row survives; rn is a permutation 1..n per stratum
    assert out.count() == 71
    fr = [r.rn for r in out.where("lang = 'fr'").collect()]
    assert sorted(fr) == [1]


def test_weighted_sample_global_no_strata(spark, weighted_docs):
    from entity_matchers_spark.operators.sampling import weighted_sample

    rows, df = weighted_docs
    out = weighted_sample(df, 10, "w").collect()
    assert len(out) == 10
    # global ranking means one consistent rn 1..10 across all strata
    assert sorted(r.rn for r in out) == list(range(1, 11))
    # matches the Python replay's global top-10
    keyed = sorted(
        ((_key_q("aes:", i, w), i) for i, _l, w in rows if w > 0),
        key=lambda t: (-t[0], t[1]),
    )
    assert {r.doc_id for r in out} == {i for _kq, i in keyed[:10]}


def test_weighted_sample_weight_bias(spark):
    """Statistical sanity: with inclusion ∝ weight, a 10×-heavier doc must be
    selected far more often across independent salts."""
    from entity_matchers_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i < 10 else 1.0) for i in range(110)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy_hits = 0
    trials = 12
    for t in range(trials):
        picked = {r.doc_id for r in weighted_sample(df, 11, "w", salt=f"s{t}:").collect()}
        heavy_hits += len([i for i in picked if i < 10])
    # Expected heavy inclusions/trial ≈ 5.3 of 11 (10 docs w=10 vs 100 w=1);
    # uniform sampling would give ~1. Demand a wide margin above uniform.
    assert heavy_hits >= trials * 3


def test_cluster_split_never_straddles(spark):
    """Every cluster lands whole in one split; fractions are roughly
    honored at the cluster level; the decision is deterministic."""
    from entity_matchers_spark.operators.sampling import cluster_split

    rows = [(i, i // 3) for i in range(600)]  # clusters of 3
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    out = cluster_split(df).collect()
    by_cluster: dict[int, set[str]] = {}
    counts: dict[str, int] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
        counts[r.split] = counts.get(r.split, 0) + 1
    assert all(len(s) == 1 for s in by_cluster.values())  # no straddle
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] > counts["valid"] and counts["train"] > counts["test"]
    out2 = cluster_split(df).collect()
    assert {(r.doc_id, r.split) for r in out2} == {(r.doc_id, r.split) for r in out}
