"""HTML → text extraction: the pipeline's per-row invariant.

The reference extracts text with the transform chain
``remove_html → remove_newlines → normalize_spaces``
(/root/reference/core/transformer.py:18,24,25). BASELINE.json's
``input_hint`` requires our extraction to be *byte-identical per url* to
that chain — enforced by tests/test_text_extraction.py against the
reference functions run as oracles.

The default path is pure Catalyst (regexp_replace chains compile into
whole-stage codegen and run JVM-side over the parquet scan). Java and
Python regex agree on the reference's patterns for well-formed UTF-8
input; an Arrow-batched fallback (`extract_text_udf`) executing the
reference chain with Python ``re`` is provided for exotic corpora where
the engines could diverge (e.g. non-ASCII whitespace in ``str.split``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from datamatcher_spark.norm.transforms import TRANSFORMS

_TAG_RE = re.compile(r"<[^<]+?>")


def extract_text_expr(html: Column) -> Column:
    """Catalyst expression: html (binary or string) → extracted text."""
    s = F.when(html.isNull(), F.lit(None).cast("string")).otherwise(
        html.cast("string")
    )
    s = TRANSFORMS["remove_html"](s)
    s = TRANSFORMS["remove_newlines"](s)
    s = TRANSFORMS["normalize_spaces"](s)
    return s


def extract_text_py(html: str | bytes | None) -> str | None:
    """Driver/test-side oracle: the same chain in pure Python, matching the
    reference transforms exactly (transformer.py:18,24,25)."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8")
    s = _TAG_RE.sub("", str(html))
    s = s.replace("\n", " ").replace("\r", "")
    return " ".join(s.split())


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:  # pragma: no cover
    """Arrow-batched fallback running the exact Python chain."""
    return html.map(extract_text_py)
