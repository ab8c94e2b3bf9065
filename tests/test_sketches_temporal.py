"""HLL sketch and temporal-join operators: accuracy, merge algebra, and
brute-force equivalence (the registry oracles check engine parity; these
check the operators against first-principles references)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from entity_matchers_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from entity_matchers_spark.operators.temporal import (
    asof_join,
    interval_overlap_join,
)


def test_hll_estimate_within_error_bound(spark):
    # 5000 distinct values: standard-range branch; 1.04/sqrt(4096) ≈ 1.6%
    # expected relative error — assert a generous 3-sigma 5%.
    df = spark.range(20000).select((F.col("id") % 5000).alias("v"), F.lit("g").alias("g"))
    est = hll_distinct(df, "v", ["g"]).collect()[0]["est_distinct"]
    assert abs(est - 5000) / 5000 < 0.05


def test_hll_small_range_linear_counting(spark):
    # 150 distinct -> linear-counting branch; error there is sub-percent.
    df = spark.range(3000).select((F.col("id") % 150).alias("v"), F.lit("g").alias("g"))
    est = hll_distinct(df, "v", ["g"]).collect()[0]["est_distinct"]
    assert abs(est - 150) / 150 < 0.02


def test_hll_merge_equals_direct_union_sketch(spark):
    # The module's core contract: merging per-part register tables gives
    # EXACTLY the sketch of the union — not an approximation of it.
    df = spark.range(10000).select(
        (F.col("id") % 3000).alias("v"),
        (F.col("id") % 4).cast("string").alias("part"),
    )
    regs = hll_registers(df, "v", ["part"])
    merged_est = hll_estimate(
        hll_merge(regs.withColumn("g", F.lit("all")), ["g"]), ["g"]
    ).collect()[0]["est_distinct"]
    direct_est = hll_distinct(
        df.withColumn("g", F.lit("all")), "v", ["g"]
    ).collect()[0]["est_distinct"]
    assert merged_est == direct_est


def _brute_asof(left_rows, right_rows):
    out = {}
    for lid, key, lts in left_rows:
        best = None
        for rkey, rts, pay in right_rows:
            if rkey == key and rts <= lts and (best is None or rts > best[0]):
                best = (rts, pay)
        out[lid] = best
    return out


def test_asof_join_matches_brute_force(spark):
    left_rows = [(i, i % 3, t) for i, t in enumerate([5, 10, 15, 2, 7, 30, 1, 10])]
    right_rows = [(k, t, f"p{k}-{t}") for k in range(3) for t in (3, 10, 20)]
    left = spark.createDataFrame(left_rows, "lid long, k long, t long")
    right = spark.createDataFrame(right_rows, "k long, rt long, pay string")
    got = {
        r["lid"]: r["pay"]
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt", payload_cols=["pay"]
        ).collect()
    }
    want = _brute_asof(left_rows, right_rows)
    assert set(got) == set(want)
    for lid, best in want.items():
        assert got[lid] == (best[1] if best else None), lid
    # tie semantics: left t == right rt is INCLUSIVE (lid 1: t=10 -> rt=10)
    assert got[1] == "p1-10"


def test_interval_overlap_matches_cross_join(spark):
    # Intervals crafted to cover: multi-bucket spans, zero-length points,
    # exact boundary touching (closed-interval semantics), and key misses.
    a_rows = [(i, i % 2, s, e) for i, (s, e) in enumerate(
        [(0, 100), (50, 50), (990, 2100), (300, 310), (2048, 2048)]
    )]
    b_rows = [(i, i % 2, s, e) for i, (s, e) in enumerate(
        [(100, 120), (40, 60), (2100, 2200), (311, 400), (0, 5000)]
    )]
    a = spark.createDataFrame(a_rows, "a_id long, k long, a_s long, a_e long")
    b = spark.createDataFrame(b_rows, "b_id long, k long, b_s long, b_e long")
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bucket_seconds=64, keys=["k"]
        ).collect()
    }
    want = {
        (ai, bi)
        for (ai, ak, as_, ae), (bi, bk, bs, be) in itertools.product(a_rows, b_rows)
        if ak == bk and as_ <= be and bs <= ae
    }
    assert got == want and len(want) > 0
    # each pair exactly once (the first-shared-bucket guard, no dedup pass)
    rows = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", bucket_seconds=64, keys=["k"]
    ).collect()
    assert len(rows) == len(got)


def test_bloom_probe_equals_membership_join(spark):
    """The broadcast-bitmap probe and the k-semi-join expression implement
    the SAME pinned position function: identical hits on every gram,
    and never a false negative for true members."""
    from entity_matchers_spark.operators.sketches import (
        bloom_build,
        bloom_membership_join,
        bloom_probe_flags,
    )

    ref = spark.createDataFrame([(i * 2654435761 % (1 << 32),) for i in range(2000)], "g long")
    # queries: half true members, half fresh values
    q_rows = [(i * 2654435761 % (1 << 32),) for i in range(1000)] + [
        ((i * 40503 + 7) % (1 << 32),) for i in range(5000, 6000)
    ]
    q = spark.createDataFrame(q_rows, "g long")
    m, k = 1 << 14, 3
    bm = bloom_build(ref, m_bits=m, k=k)
    got_bitmap = {r.g: r.hit for r in bloom_probe_flags(q, bm, m_bits=m, k=k).collect()}
    got_join = {r.g: r.hit for r in bloom_membership_join(q, ref, m_bits=m, k=k).collect()}
    assert got_bitmap == got_join
    members = {r.g for r in ref.collect()}
    for g, hit in got_bitmap.items():
        if g in members:
            assert hit == 1  # no false negatives, ever
    # with 2000 items in 2^14 bits / k=3 the FP rate is small but nonzero;
    # assert it stays under 10% so the sketch is actually discriminating
    non_members = [g for g in got_bitmap if g not in members]
    fp = sum(got_bitmap[g] for g in non_members)
    assert fp / max(1, len(non_members)) < 0.10


def test_countmin_never_underestimates_and_merges(spark):
    from entity_matchers_spark.operators.sketches import (
        cm_build, cm_estimate, cm_merge,
    )
    import pyspark.sql.functions as F

    rows = (
        [("a", "s1")] * 50 + [("b", "s1")] * 7 + [("c", "s2")] * 31
        + [("d", "s2")] * 1 + [("e", "s1")] * 13
    )
    df = spark.createDataFrame(rows, "tok string, src string")
    probes = df.select("tok").distinct()
    truth = {r.tok: r.c for r in df.groupBy("tok").agg(F.count("*").alias("c")).collect()}

    # wide sketch: estimates are exact here (5 items, 16384 counters)
    sk = cm_build(df, "tok")
    est = {r.tok: r.est for r in cm_estimate(probes, sk, "tok").collect()}
    assert est == truth

    # merge linearity: per-source sketches summed == direct global sketch
    merged = cm_merge(cm_build(df, "tok", group_cols=["src"]), [])
    direct = {(r.j, r.cell): r.cnt for r in sk.collect()}
    rolled = {(r.j, r.cell): r.cnt for r in merged.collect()}
    assert rolled == direct

    # tiny width forces collisions: estimates may rise but NEVER fall
    sk4 = cm_build(df, "tok", width=4)
    est4 = {r.tok: r.est for r in cm_estimate(probes, sk4, "tok", width=4).collect()}
    assert all(est4[t] >= c for t, c in truth.items())
    assert sum(est4.values()) > sum(truth.values())  # collisions really occurred
