"""Corpus determinism + extraction byte-identity (FIXTURES.md §1, §3)."""

from __future__ import annotations

import json
import os

from entity_matchers_spark.corpus import labeled_pairs, render_html, web_pages
from entity_matchers_spark.extraction import extract_text_bytes, with_extracted_text

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "extraction.json")


def test_corpus_deterministic_across_parallelism(spark):
    a = web_pages(spark, 60).orderBy("page_id").collect()
    b = web_pages(spark, 60).repartition(13).orderBy("page_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_corpus_shape(spark):
    pages = web_pages(spark, 200).collect()
    by_entity = {}
    for r in pages:
        by_entity.setdefault(r.entity_id, []).append(r)
        assert r.url.startswith("https://")
        assert r.lang in {"en", "fr", "de", "ja"}
    sizes = [len(v) for v in by_entity.values()]
    singletons = sum(1 for s in sizes if s == 1)
    assert 0.15 < singletons / len(sizes) < 0.45  # ~30% extras
    assert max(sizes) <= 6


def test_extraction_inverts_rendering_byte_identical(spark):
    pages = web_pages(spark, 100)
    bad = (
        with_extracted_text(pages)
        .where("extracted_text != text")
        .count()
    )
    assert bad == 0


def test_extraction_goldens():
    """Committed golden bytes: extraction output is pinned across versions
    (the reference's byte-exact preprocessor invariant)."""
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    assert len(goldens) >= 5
    for g in goldens:
        html = bytes.fromhex(g["html_hex"])
        assert extract_text_bytes(html).encode("utf-8").hex() == g["text_hex"]


def test_extraction_handles_junk():
    assert extract_text_bytes(b"<html>no main</html>") == ""
    assert extract_text_bytes(None) == ""
    assert extract_text_bytes(render_html("a & b < c", 7)) == "a & b < c"


def test_labeled_pairs_protocol(spark):
    lp = labeled_pairs(spark, 80).collect()
    assert all(r.id_a < r.id_b for r in lp)
    assert {r.fold for r in lp} <= set(range(5))
    splits = {r.split for r in lp}
    assert splits == {"test", "train", "valid"}
    pos = sum(1 for r in lp if r.label == 1)
    neg = sum(1 for r in lp if r.label == 0)
    assert pos > 0 and neg > 0


def test_synthetic_documents_deterministic_and_vocab_scaled(spark):
    """The vocab-scaled audit corpus must be partition-independent and
    reproducible (pure hash of doc_id, position, n_docs), with vocabulary
    actually growing with corpus size and a linear planted dup mass."""
    from pyspark.sql import functions as F

    from entity_matchers_spark.corpus import synthetic_documents

    a = synthetic_documents(spark, 300).repartition(1).collect()
    b = synthetic_documents(spark, 300).repartition(13).collect()
    assert sorted((r.doc_id, r.text) for r in a) == sorted(
        (r.doc_id, r.text) for r in b
    )
    assert len(a) == 300

    def vocab(n):
        return (
            synthetic_documents(spark, n)
            .select(F.explode(F.split("text", " ")).alias("t"))
            .agg(F.countDistinct("t"))
            .collect()[0][0]
        )

    v300, v900 = vocab(300), vocab(900)
    # distinct tokens grow roughly with corpus size (doc draws cover most
    # of the 40*n vocabulary)
    assert v900 > 2.0 * v300
