"""Web-corpus operators: URL canonicalization, PII scrub, unigram LM score."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from entity_matchers_spark.operators.web import (
    canonicalize_urls,
    pii_scrub,
    unigram_lm_scores,
    url_duplicates,
)


def test_canonicalize_urls_rules(spark):
    cases = [
        # (raw, canonical)
        ("HTTPS://WWW.Example.COM:443/A/", "https://example.com/A"),
        ("http://example.com:80/", "http://example.com/"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("https://sub.Example.com/p?utm_source=a&q=1&fbclid=zz#frag",
         "https://sub.example.com/p?q=1"),
        ("https://example.com/p?utm_sourcery=keepme", "https://example.com/p?utm_sourcery=keepme"),
        ("http://example.com", "http://example.com/"),
        ("https://example.com/?gclid=1", "https://example.com/"),
        ("http://www.news.example.co/Path/Sub/?b=2&a=1", "http://news.example.co/Path/Sub?b=2&a=1"),
    ]
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(cases)], "id long, url string")
    got = {r["id"]: r["url_canon"] for r in canonicalize_urls(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_canonicalize_domain(spark):
    df = spark.createDataFrame(
        [(0, "https://www.a.b.example.org/x"), (1, "http://example.com/")],
        "id long, url string",
    )
    rows = {r["id"]: r["domain"] for r in canonicalize_urls(df).collect()}
    assert rows == {0: "example.org", 1: "example.com"}


def test_url_duplicates_collapses_variants(spark):
    df = spark.createDataFrame(
        [
            (0, "https://example.com/a"),
            (1, "HTTPS://WWW.example.com:443/a/#x"),
            (2, "https://example.com/a?utm_source=rss"),
            (3, "https://example.com/b"),
        ],
        "id long, url string",
    )
    rows = {r["id"]: r["n_same_url"] for r in url_duplicates(df).collect()}
    assert rows == {0: 3, 1: 3, 2: 3, 3: 1}


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "write to a.b+c@mail.example.org or admin@ex.net thanks"),
            (1, "server 192.168.0.1 and 10.0.255.7 up"),
            (2, "call +447946012345 today"),
            (3, "nothing to see here 1.2.3 (not an ip) user at example dot com"),
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in pii_scrub(df).collect()}
    assert (rows[0]["n_email"], rows[0]["n_ipv4"], rows[0]["n_phone"]) == (2, 0, 0)
    assert rows[0]["clean_text"] == "write to <EMAIL> or <EMAIL> thanks"
    assert (rows[1]["n_email"], rows[1]["n_ipv4"]) == (0, 2)
    assert rows[1]["clean_text"] == "server <IPV4> and <IPV4> up"
    assert rows[2]["n_phone"] == 1
    assert rows[2]["clean_text"] == "call <PHONE> today"
    assert (rows[3]["n_email"], rows[3]["n_ipv4"], rows[3]["n_phone"]) == (0, 0, 0)


def test_unigram_lm_scores_hand_check(spark):
    # corpus: "a a b" + "a c" -> counts a=3, b=1, c=1, total=5
    df = spark.createDataFrame([(0, "a a b"), (1, "a c")], "doc_id long, text string")
    rows = {r["id"]: r for r in unigram_lm_scores(df).collect()}
    lp = lambda c: math.log(c / 5.0)
    assert rows[0]["n_tokens"] == 3
    assert abs(rows[0]["mean_logprob"] - round((2 * lp(3) + lp(1)) / 3, 6)) < 1e-9
    assert rows[1]["n_tokens"] == 2
    assert abs(rows[1]["mean_logprob"] - round((lp(3) + lp(1)) / 2, 6)) < 1e-9


def test_nb_quality_scores_hand_check(spark):
    """NB fit/score against a scalar reference: weak labels from
    md5(source) mod 4, Laplace LLR weights in fixed-point micro-nats,
    per-doc integer sum + prior."""
    import hashlib

    from entity_matchers_spark.operators.web import nb_quality_scores

    def label(src: str) -> int:
        return int(int(hashlib.md5(f"nbq:{src}".encode()).hexdigest()[:8], 16) % 4 == 0)

    pos = next(s for i in range(100) if label(s := f"s{i}") == 1)
    neg = next(s for i in range(100) if label(s := f"s{i}") == 0)
    docs = [
        (0, "good good clean", pos),
        (1, "good clean", pos),
        (2, "spam spam junk", neg),
        (3, "junk good", neg),
        (4, "rareword clean", pos),  # 'rareword' count 1 -> pruned from vocab
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = {r["id"]: r for r in nb_quality_scores(df).collect()}

    # scalar reference
    toks = {d: (t.lower().split(), label(s)) for d, t, s in docs}
    cnt: dict[str, list[int]] = {}
    for _, (ts, l) in toks.items():
        for t in ts:
            c = cnt.setdefault(t, [0, 0])
            c[l] += 1
    cnt = {t: c for t, c in cnt.items() if c[0] + c[1] >= 2}
    n_neg = sum(c[0] for c in cnt.values())
    n_pos = sum(c[1] for c in cnt.values())
    v = len(cnt)
    w_fp = {
        t: round(
            math.log(((c[1] + 1) * (n_neg + v)) / ((c[0] + 1) * (n_pos + v))) * 1e6
        )
        for t, c in cnt.items()
    }
    npos_docs = sum(l for _, (_, l) in toks.items())
    prior_fp = round(math.log(npos_docs / (len(docs) - npos_docs)) * 1e6)

    assert set(out) == {0, 1, 2, 3, 4}
    for d, (ts, l) in toks.items():
        sfp = prior_fp + sum(w_fp.get(t, 0) for t in ts)
        assert out[d]["label_hq"] == l
        assert out[d]["n_tokens"] == len(ts)
        assert abs(out[d]["score"] - round(sfp / 1e6, 6)) < 1e-12
        assert out[d]["pred_hq"] == int(sfp > 0)
    # the weak labels separate: hq docs score above the lq spam docs
    assert out[0]["score"] > out[2]["score"]


def test_url_filter_domain_and_keyword_rules(spark):
    """Blocklisted registrable domains catch their subdomains; keywords
    match anywhere in the canonical URL; clean rows keep=1."""
    from entity_matchers_spark.operators.web import url_filter

    df = spark.createDataFrame(
        [
            (0, "https://www.goodnews.com/story"),
            (1, "http://spam-casino.biz/win"),          # domain + 'casino' kw
            (2, "https://cdn.adsite.io/pixel.gif"),     # subdomain of blocked
            (3, "https://blog.example.org/casino-tips"),  # keyword only
            (4, "https://blog.example.org/cooking"),
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame([("spam-casino.biz",), ("adsite.io",)], "domain string")
    rows = {r["id"]: r for r in url_filter(df, bl, keywords=("casino", "xxx")).collect()}
    assert (rows[0]["blocked_domain"], rows[0]["blocked_kw"], rows[0]["keep"]) == (0, 0, 1)
    assert rows[1]["blocked_domain"] == 1 and rows[1]["blocked_kw"] == 1 and rows[1]["keep"] == 0
    assert rows[2]["blocked_domain"] == 1 and rows[2]["keep"] == 0
    assert rows[3]["blocked_domain"] == 0 and rows[3]["blocked_kw"] == 1 and rows[3]["keep"] == 0
    assert rows[4]["keep"] == 1


def test_ccnet_lm_buckets_hand_check(spark):
    """Per-language unigram LM in fixed-point micro-nats; tercile buckets
    assigned by cutoff comparison (3*n_better vs n_lang_docs), ties share
    a bucket; languages bucket independently."""
    import math

    from entity_matchers_spark.operators.web import ccnet_lm_buckets

    docs = [
        (0, "x x x x", "aa"),   # all common tokens -> highest logprob
        (1, "x x y y", "aa"),
        (2, "y z z q", "aa"),   # rare tokens -> lowest logprob
        (3, "m m", "bb"),
        (4, "m n", "bb"),
        (5, "n n o", "bb"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = {r["id"]: r for r in ccnet_lm_buckets(df).collect()}

    # scalar reference: per-lang unigram fit, micro-nat weights, cutoffs
    by_lang: dict[str, list[tuple[int, list[str]]]] = {}
    for d, t, lang in docs:
        by_lang.setdefault(lang, []).append((d, t.split()))
    expect: dict[int, tuple[float, str]] = {}
    for lang, items in by_lang.items():
        cnt: dict[str, int] = {}
        for _, ts in items:
            for t in ts:
                cnt[t] = cnt.get(t, 0) + 1
        n_lang = sum(cnt.values())
        w = {t: round(math.log(c / n_lang) * 1e6) for t, c in cnt.items()}
        means = {d: sum(w[t] for t in ts) / len(ts) for d, ts in items}
        n_docs = len(items)
        for d, ts in items:
            n_better = sum(1 for m in means.values() if m > means[d])
            bucket = (
                "head"
                if 3 * n_better < n_docs
                else ("middle" if 3 * n_better < 2 * n_docs else "tail")
            )
            expect[d] = (round(means[d] / 1e6, 6), bucket)

    assert set(out) == set(expect)
    for d, (mean_lp, bucket) in expect.items():
        assert out[d]["bucket"] == bucket, d
        assert abs(out[d]["mean_logprob"] - mean_lp) < 1e-12
    # sanity: the all-common-token doc heads its language, the rare one tails
    assert out[0]["bucket"] == "head"
    assert out[2]["bucket"] == "tail"


def test_crawl_delta_statuses(spark):
    """added / removed / changed / unchanged all classified correctly from
    content hashes under a full-outer join."""
    from entity_matchers_spark.operators.web import crawl_delta

    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "brand new")], "doc_id long, text string"
    )
    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")], "doc_id long, text string"
    )
    out = {r["id"]: r["status"] for r in crawl_delta(new, old).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
