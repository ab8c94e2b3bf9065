"""HTML → text extraction stage.

The analog of the reference's deterministic raw-dump preprocessors
(/root/reference/src/preprocess_datasets/preprocess_dbpedia.py:37-63):
a pure, versioned function whose output is byte-identical per url across
runs and parallelism levels (BASELINE.json invariant; goldens in
tests/goldens/).

Implementation: ``mapInPandas`` (Arrow-batched, never per-row Python in the
driver). Normalization order is locked (tag extract → entity decode) per
SURVEY.md §7's risk register.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

EXTRACTOR_VERSION = "1"

_MAIN_RE = re.compile(rb'<p class="main">(.*?)</p>', re.DOTALL)


def extract_text_bytes(html: bytes) -> str:
    """Pure extraction function: main-paragraph bytes → entity-decoded text.

    Kept deliberately byte-exact and versioned; swapping in a real boilerplate
    remover (trafilatura-class) later means bumping EXTRACTOR_VERSION and
    regenerating goldens — the function contract stays.
    """
    if html is None:
        return ""
    m = _MAIN_RE.search(html)
    if not m:
        return ""
    raw = m.group(1).decode("utf-8", errors="strict")
    return raw.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def with_extracted_text(df: DataFrame, html_col: str = "html", out_col: str = "extracted_text") -> DataFrame:
    """Append ``out_col`` extracted from ``html_col`` via mapInPandas,
    preserving all input columns."""
    out_fields = df.schema.fields + [StructField(out_col, StringType())]
    schema = StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [extract_text_bytes(h) for h in pdf[html_col]]
            yield pdf

    return df.mapInPandas(run, schema)
