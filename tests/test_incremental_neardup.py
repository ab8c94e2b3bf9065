"""Incremental (delta-vs-index) near-dup — the daily-crawl dedup step:
delta×indexed and delta×delta pairs are found exactly; indexed×indexed
pairs are never emitted even when the standing corpus contains them."""

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
def corpus_with_delta(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "journalists file identical syndicated copy about it every morning"
    )
    other = (
        "completely different prose about alpine meadow ecology, snowmelt "
        "hydrology and the seasonal migration of herbivores across ridges"
    )
    rows = [
        # standing corpus: 10-13 (two internal near-dup pairs!)
        (10, base),
        (11, base + " extra"),
        (12, other),
        (13, other + " indeed"),
        # delta: 20-22 (20 dups an indexed doc, 21 dups another delta doc)
        (20, base + "!"),
        (21, "fresh unseen content about deep sea vents and tube worms okay"),
        (22, "fresh unseen content about deep sea vents and tube worms yes"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_neardup_exact_and_delta_scoped(spark, corpus_with_delta):
    from entity_matchers_spark.operators.dedup import incremental_neardup_pairs

    rows, df = corpus_with_delta
    delta = df.where("doc_id >= 20").select("doc_id")
    t = 0.7
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in incremental_neardup_pairs(df, delta, threshold=t).collect()
    }

    gram_sets = {i: _grams(txt) for i, txt in rows}
    delta_ids = {20, 21, 22}
    expect = {}
    for a in gram_sets:
        for b in gram_sets:
            if a >= b or (a not in delta_ids and b not in delta_ids):
                continue
            ga, gb = gram_sets[a], gram_sets[b]
            u = len(ga | gb)
            j = len(ga & gb) / u if u else 0.0
            if j >= t:
                expect[(a, b)] = j

    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=0)

    # the fixture's standing corpus HAS internal near-dups …
    g10, g11 = gram_sets[10], gram_sets[11]
    assert len(g10 & g11) / len(g10 | g11) >= t
    # … and they are correctly absent from the incremental result
    assert (10, 11) not in got and (12, 13) not in got
    # while delta×indexed and delta×delta pairs are present
    assert any(a < 20 <= b or b < 20 <= a or (a >= 20 and b >= 20) for a, b in got)
    assert (21, 22) in got
    assert (10, 20) in got or (11, 20) in got
