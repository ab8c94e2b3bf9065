"""Containment near-dup — verified against a brute-force Python gram replay,
including the asymmetric case (small doc inside big doc) that Jaccard-based
near-dup cannot find."""

from __future__ import annotations

import hashlib

import pytest


def _grams(text: str, n: int = 7) -> set[int]:
    t = text.lower()
    return {
        int(hashlib.md5(t[i : i + n].encode()).hexdigest()[:8], 16)
        for i in range(len(t) - n + 1)
    }


@pytest.fixture()
def contain_docs(spark):
    quote = "the quick brown fox jumps over the lazy dog near the river bank today"
    host = (
        "breaking news from the newswire desk this morning: "
        + quote
        + " — reporters on the scene add extensive additional commentary, "
        "background paragraphs, weather notes, market summaries and a long "
        "tail of unrelated syndication boilerplate that makes this page much "
        "larger than the quoted passage it embeds somewhere inside its body."
    )
    rows = [
        (0, quote),            # contained in 1
        (1, host),             # contains 0
        (2, quote + "!!"),     # near-identical to 0 (both directions)
        (3, "completely unrelated text about gardening and winter tomatoes"),
        (4, ""),               # empty: no grams, never a left side
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_matches_bruteforce(spark, contain_docs):
    from entity_matchers_spark.operators.dedup import containment_neardup_pairs

    rows, df = contain_docs
    t = 0.8
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_neardup_pairs(df, threshold=t).collect()
    }

    gram_sets = {i: _grams(txt) for i, txt in rows}
    expect = {}
    for a, ga in gram_sets.items():
        if not ga:
            continue
        for b, gb in gram_sets.items():
            if a == b:
                continue
            c = len(ga & gb) / len(ga)
            if c >= t:
                expect[(a, b)] = c

    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=0)

    # the asymmetric pair IS found: quote ⊂ host …
    assert (0, 1) in got
    # … while its Jaccard is nowhere near any dedup threshold
    g0, g1 = gram_sets[0], gram_sets[1]
    assert len(g0 & g1) / len(g0 | g1) < 0.4
    # and the reverse direction (host → quote) is NOT containment-high
    assert (1, 0) not in got


def test_containment_prefix_filter_zero_recall_loss(spark):
    """Randomized corpus: the prefix-filtered result equals brute force —
    the exactness claim, exercised at a threshold (0.75) whose t*sz hits
    integral values."""
    import random

    from entity_matchers_spark.operators.dedup import containment_neardup_pairs

    rng = random.Random(11037)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omikron"]
    base = [" ".join(rng.choices(vocab, k=rng.randint(8, 20))) for _ in range(12)]
    rows = []
    did = 0
    for b in base:
        rows.append((did, b)); did += 1
        if rng.random() < 0.5:  # embed a copy inside a larger host
            rows.append((did, " ".join(rng.choices(vocab, k=6)) + " " + b)); did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.75
    got = {(r.id_a, r.id_b) for r in containment_neardup_pairs(df, threshold=t).collect()}
    gram_sets = {i: _grams(txt) for i, txt in rows}
    expect = {
        (a, b)
        for a, ga in gram_sets.items() if ga
        for b, gb in gram_sets.items()
        if a != b and len(ga & gb) / len(ga) >= t
    }
    assert got == expect
    assert expect  # fixture actually produced containment pairs


def test_blocking_rule_audit_unique_attribution(spark):
    """Synthetic two-rule blocker where coverage attribution is known:
    rule A uniquely covers one gold pair, rule B another, one pair is
    covered by both (not unique), one gold pair is uncovered."""
    from entity_matchers_spark.operators.blocking import blocking_rule_audit
    import pyspark.sql.functions as F

    blocks = spark.createDataFrame(
        [
            # rule A blocks: {1,2} share kA1 (gold), {5,6} share kA2 (both-rule pair)
            (1, "A", "kA1"), (2, "A", "kA1"), (5, "A", "kA2"), (6, "A", "kA2"),
            # rule B blocks: {3,4} share kB1 (gold), {5,6} share kB2 (same pair again)
            (3, "B", "kB1"), (4, "B", "kB1"), (5, "B", "kB2"), (6, "B", "kB2"),
            # singleton keys contribute keys but no pairs
            (7, "A", "kA3"), (8, "B", "kB3"),
        ],
        "id long, rule string, block_id string",
    )
    gold = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 9)], "id_a long, id_b long"
    )
    out = {r.rule: r for r in blocking_rule_audit(blocks, gold).collect()}
    a, b = out["A"], out["B"]
    assert a.n_keys == 3 and b.n_keys == 3
    assert a.n_cands == 2 and b.n_cands == 2  # one pair per 2-doc block
    assert a.n_gold == 4 and b.n_gold == 4
    assert a.n_covered == 2 and b.n_covered == 2  # each rule covers 2 gold pairs
    assert a.n_unique == 1 and b.n_unique == 1   # (1,2) only-A; (3,4) only-B
    assert a.completeness == 0.5 and b.completeness == 0.5
