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
