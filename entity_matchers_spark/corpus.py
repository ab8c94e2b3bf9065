"""Deterministic synthetic web-page corpus with planted entity clusters.

Per FIXTURES.md §1 and the input_hint shape: table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
plus a ``labeled_pairs`` table. The generator precedent is the reference's
IDS* sampler — controlled cluster structure with ~30% non-matchable extras
(/root/reference/SampKG-OpenEA/src/sampkg/generator/generator.py:35-72,
README.md:280-281) and deterministic perturbation à la
/root/reference/src/preprocess_datasets/anonymize_dataset.py:6-101.

Determinism rule: every cell is a pure function of (entity_id, variant) via
md5 — independent of partitioning, parallelism, and wall clock. Generation
is distributed: ``spark.range(K)`` → native explode of the variant sequence
→ one ``mapInPandas`` that renders text/html per row (Arrow-batched).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basil cedar dahlia elm fern grove hazel iris jade "
    "kelp lotus maple nettle olive pine quartz rose sage thyme umber violet "
    "willow yarrow zephyr"
).split()

DOMAINS = [f"site{i}.example.com" for i in range(40)]
LANGS = ["en", "en", "en", "en", "en", "en", "fr", "de", "ja"]
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

MAX_VARIANTS = 8  # page_id = entity_id * MAX_VARIANTS + variant


def _h(*parts: object) -> int:
    """Stable 64-bit hash of the argument tuple (pure, seed-free)."""
    key = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(key).digest()[:8], "big")


def _entity_tokens(entity_id: int) -> tuple[str, list[str]]:
    """(name, body tokens) for an entity — name carries a unique slug so
    planted clusters are recoverable; body is vocab word soup."""
    name = f"entity-{_h(entity_id, 'name') % (1 << 32):08x} " + " ".join(
        VOCAB[_h(entity_id, "nw", i) % len(VOCAB)] for i in range(2)
    )
    n_body = 12 + _h(entity_id, "len") % 9
    body = [VOCAB[_h(entity_id, "body", i) % len(VOCAB)] for i in range(n_body)]
    return name, body


def _variant_text(entity_id: int, variant: int) -> str:
    """Perturbed page text: token drop + token swap + case noise, all
    hash-driven (anonymize_dataset.py-style deterministic obfuscation)."""
    name, body = _entity_tokens(entity_id)
    body = list(body)
    if variant > 0:
        # drop one token
        del body[_h(entity_id, variant, "drop") % len(body)]
        # swap two tokens
        i = _h(entity_id, variant, "s1") % len(body)
        j = _h(entity_id, variant, "s2") % len(body)
        body[i], body[j] = body[j], body[i]
        # occasionally uppercase the name
        if _h(entity_id, variant, "case") % 3 == 0:
            name = name.upper()
    return name + " " + " ".join(body)


def _escape(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render_html(text: str, page_id: int) -> bytes:
    """Template wrapper with per-row tag noise; ``extract_text`` must invert
    this byte-identically (FIXTURES.md §3)."""
    noise = f"{_h(page_id, 'noise') % (1 << 24):06x}"
    title = _escape(text[:40])
    return (
        f'<html><head><title>{title}</title><meta charset="utf-8"/></head>'
        f'<body data-noise="{noise}"><nav>skip {noise}</nav>'
        f'<p class="main">{_escape(text)}</p>'
        f'<div class="footer">generated {noise}</div></body></html>'
    ).encode("utf-8")


PAGE_SCHEMA = StructType(
    [
        StructField("page_id", LongType()),
        StructField("entity_id", LongType()),
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _render_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for entity_id, variant in zip(pdf["entity_id"], pdf["variant"]):
            entity_id, variant = int(entity_id), int(variant)
            page_id = entity_id * MAX_VARIANTS + variant
            text = _variant_text(entity_id, variant)
            # Zipf-ish domain skew: square the unit hash so low domains are hot
            u = (_h(entity_id, variant, "dom") % 10_000) / 10_000.0
            domain = DOMAINS[int(u * u * len(DOMAINS))]
            slug = text[: text.find(" ")] + f"-v{variant}"
            rows.append(
                {
                    "page_id": page_id,
                    "entity_id": entity_id,
                    "url": f"https://{domain}/{slug}",
                    "warc_ts": EPOCH + pd.Timedelta(seconds=17 * page_id),
                    "html": render_html(text, page_id),
                    "text": text,
                    "lang": LANGS[_h(entity_id, "lang") % len(LANGS)],
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in PAGE_SCHEMA.fields])


def web_pages(spark: SparkSession, num_entities: int = 1000) -> DataFrame:
    """Distributed deterministic corpus: ~30% singleton entities, the rest
    with 2-6 page variants (≈2.9 pages/entity)."""
    ents = spark.range(num_entities).select(F.col("id").alias("entity_id"))
    # variants: hash-derived, ~30% singletons
    h = F.conv(F.substring(F.md5(F.concat(F.col("entity_id").cast("string"), F.lit(":nv"))), 1, 8), 16, 10).cast("long")
    with_v = ents.withColumn(
        "n_variants", F.when(h % 10 < 3, F.lit(1)).otherwise(2 + (h % 5))
    )
    exploded = with_v.select(
        "entity_id", F.explode(F.sequence(F.lit(0), F.col("n_variants") - 1)).alias("variant")
    )
    return exploded.mapInPandas(_render_batch, PAGE_SCHEMA)


DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def synthetic_documents(
    spark: SparkSession,
    n_docs: int,
    vocab_per_doc: float = 40.0,
    tokens_lo: int = 40,
    tokens_hi: int = 60,
    dup_pct: int = 5,
) -> DataFrame:
    """Deterministic ``documents``-shaped corpus whose token VOCABULARY
    grows proportionally with corpus size (``V = vocab_per_doc * n_docs``)
    — the real-web regime, where new pages bring new names, slugs and
    numbers, unlike the fixed-50-word testdata fixture.

    Purpose: the growth audit's vocabulary-scaled row. On a fixed-vocab
    corpus the background gram-overlap distribution never thins as the
    corpus grows, so ANY rarity-based candidate filter shows a ~quadratic
    candidate count with a small constant (the adversarial regime); with
    vocabulary ∝ size, two random docs share ever fewer grams and the
    prefix/banding filters go toward linear. Generating both rows makes
    that argument a measurement instead of prose.

    ~``dup_pct``% of docs are near-duplicates of a recent earlier doc
    (one token dropped + one swapped), planting a linear true-pair mass.
    Every token is a pure function of (doc_id, position, n_docs) via md5 —
    partitioning- and wall-clock-independent, no external data.
    """
    vocab_size = max(100, int(vocab_per_doc * n_docs))

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def base_tokens(doc: int) -> list[str]:
            n_tok = tokens_lo + _h(n_docs, doc, "n") % max(1, tokens_hi - tokens_lo + 1)
            return [
                f"w{_h(n_docs, doc, 't', k) % vocab_size:x}" for k in range(n_tok)
            ]

        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                if doc_id > 0 and _h(n_docs, doc_id, "dup") % 100 < dup_pct:
                    src = doc_id - 1 - _h(n_docs, doc_id, "src") % min(doc_id, 50)
                    toks = base_tokens(src)
                    del toks[_h(n_docs, doc_id, "drop") % len(toks)]
                    i = _h(n_docs, doc_id, "s1") % len(toks)
                    j = _h(n_docs, doc_id, "s2") % len(toks)
                    toks[i], toks[j] = toks[j], toks[i]
                else:
                    toks = base_tokens(doc_id)
                rows.append({"doc_id": doc_id, "text": " ".join(toks)})
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    return spark.range(n_docs).mapInPandas(_render, DOC_SCHEMA)


def labeled_pairs(spark: SparkSession, num_entities: int = 1000) -> DataFrame:
    """(id_a, id_b, label, fold, split) — positives = intra-entity page
    pairs; negatives = cross-entity first-variant pairs; 5 folds with the
    reference's 70/20/10 test/train/valid split
    (/root/reference/src/preprocess_datasets/create_k_folds.py:6-31)."""
    pages = web_pages(spark, num_entities).select("page_id", "entity_id")
    a = pages.select(F.col("page_id").alias("id_a"), F.col("entity_id").alias("e"))
    b = pages.select(F.col("page_id").alias("id_b"), F.col("entity_id").alias("e"))
    pos = (
        a.join(b, "e")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1).alias("label"))
    )
    firsts = pages.where(F.col("page_id") % MAX_VARIANTS == 0)
    f1 = firsts.select(F.col("page_id").alias("id_a"), F.col("entity_id").alias("e"))
    f2 = firsts.select(F.col("page_id").alias("id_b"), ((F.col("entity_id") + 1) % num_entities).alias("e"))
    neg = f1.join(f2, "e").where(F.col("id_a") != F.col("id_b")).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        F.lit(0).alias("label"),
    )
    pairs = pos.unionByName(neg)
    ph = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("id_a"), F.col("id_b"), F.lit("fold"))), 1, 8),
        16,
        10,
    ).cast("long")
    decile = F.floor(ph / 5) % 10
    return (
        pairs.withColumn("fold", (ph % 5).cast("int"))
        .withColumn(
            "split",
            F.when(decile < 7, F.lit("test"))
            .when(decile < 9, F.lit("train"))
            .otherwise(F.lit("valid")),
        )
    )
