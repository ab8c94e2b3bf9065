"""End-to-end curation pipeline: filter → scrub → dedup → select → pack,
with planted blocklisted / PII-bearing / duplicated docs whose fate each
stage must decide, plus the kill-and-resume identity the checkpoint
contract promises."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from entity_matchers_spark.plans.curation import CurationConfig, CurationPipeline


@pytest.fixture()
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = []
    for i in range(30):
        rows.append((i, f"https://site{i % 7}.com/page/{i}", "en",
                     f"{base} variant {i} with extra tokens number {i * 7}"))
    # exact duplicate pair: 40 duplicates 41's text
    rows.append((40, "https://site1.com/dup/a", "en", base + " duplicated body"))
    rows.append((41, "https://site2.com/dup/b", "en", base + " duplicated body"))
    # near-duplicates: one token changed on a long shared body
    long = " ".join(f"tok{j}" for j in range(60))
    rows.append((50, "https://site3.com/near/a", "en", long + " ending one"))
    rows.append((51, "https://site4.com/near/b", "en", long + " ending two"))
    # blocklisted domain
    rows.append((60, "https://ads.spamfarm.io/buy", "en", base + " spam spam"))
    # PII-bearing doc
    rows.append((70, "https://site5.com/contact", "en",
                 base + " reach me at alice@example.com or +12125551234 now"))
    # too short for the quality floor
    rows.append((80, "https://site6.com/stub", "en", "tiny stub"))
    return spark.createDataFrame(rows, "id long, url string, lang string, text string")


def test_curation_stages_and_resume(spark, corpus, tmp_path_factory):
    cfg = CurationConfig(
        blocked_domains=("spamfarm.io",),
        min_tokens=5,
        seq_len=32,
        n_shards=4,
    )
    root_a = str(tmp_path_factory.mktemp("cur_a"))
    root_b = str(tmp_path_factory.mktemp("cur_b"))

    pipe = CurationPipeline(spark, root_a, cfg)
    packed = pipe.run(corpus)
    packed_rows = sorted(tuple(r) for r in packed.collect())
    kept_ids = {r[0] for r in packed_rows}

    # filter: blocklisted domain and sub-floor doc are gone
    assert 60 not in kept_ids and 80 not in kept_ids
    # dedup: exactly one of the exact-dup pair survives (the min id)
    assert 40 in kept_ids and 41 not in kept_ids
    # near-dup: exactly one of the near-pair survives (the min id)
    assert 50 in kept_ids and 51 not in kept_ids
    # scrub: the PII doc survives but its committed text is redacted
    scrubbed = (
        pipe.read("scrub").where(F.col("id") == 70).select("text").first().text
    )
    assert "<EMAIL>" in scrubbed and "alice@example.com" not in scrubbed
    assert "<PHONE>" in scrubbed

    # pack invariants: (shard, pos) unique; token stream is gapless
    assert len({(r[1], r[2]) for r in packed_rows}) == len(packed_rows)
    total = sum(r[3] for r in packed_rows)
    assert max(r[4] + r[3] for r in packed_rows) == total
    for _id, _sh, _pos, n_tok, start, first_seq, last_seq, offset in packed_rows:
        assert first_seq * cfg.seq_len + offset == start
        assert last_seq == (start + max(n_tok - 1, 0)) // cfg.seq_len

    # kill-after-dedup resume: identical final output, no stage re-built
    p1 = CurationPipeline(spark, root_b, cfg)
    p1.run(corpus, through="dedup")
    assert p1.is_committed("dedup") and not p1.is_committed("select")
    resumed = CurationPipeline(spark, root_b, cfg).run(corpus)
    assert sorted(tuple(r) for r in resumed.collect()) == packed_rows

    shutil.rmtree(root_a, ignore_errors=True)
    shutil.rmtree(root_b, ignore_errors=True)


def test_gopher_filter_rule_provenance(spark):
    """Each Gopher rule fires on a doc engineered to fail exactly it;
    a clean doc keeps=1; flags compose into keep correctly."""
    from entity_matchers_spark.operators.text_analysis import gopher_filter

    good = "the quick brown fox jumps over a lazy dog near the old red barn " * 2
    docs = [
        (0, good),                                  # passes everything
        (1, "the cat sat"),                         # too few tokens
        (2, "the " + "cat " * 39),                  # top-token mass (cat 39/40)
        (3, ("the dog ran " * 14)),                 # duplicate bigrams
        (4, "zz " * 30),                            # no stop words + rep fails
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["id"]: r
        for r in gopher_filter(
            df, min_tokens=10, max_top_share=0.3, max_dup_bigrams=0.5
        ).collect()
    }
    assert out[0]["keep"] == 1 and all(
        out[0][c] == 0
        for c in ("fail_tokens", "fail_mean_len", "fail_stop",
                  "fail_rep_token", "fail_rep_bigram")
    )
    assert out[1]["fail_tokens"] == 1 and out[1]["keep"] == 0
    assert out[2]["fail_rep_token"] == 1 and out[2]["keep"] == 0
    assert out[3]["fail_rep_bigram"] == 1 and out[3]["keep"] == 0
    assert out[4]["fail_stop"] == 1 and out[4]["keep"] == 0
