"""The per-row invariant from BASELINE.json input_hint: extracted text must
be byte-identical per url to the reference chain
remove_html → remove_newlines → normalize_spaces
(/root/reference/core/transformer.py:18,24,25)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datamatcher_spark.norm.text import extract_text_expr, extract_text_py
from tests.conftest import spark_one_col

HTML_CASES = [
    "<html><body><h1>Title</h1><p>Body text.</p></body></html>",
    "<div class='a'>nested <span>tags</span> here</div>",
    "a < b and c << d",  # bare < never closed
    "<p>unclosed paragraph",
    "mal<<formed>> stuff <",
    "<a\nhref='x'>multi\nline\ttag</a>",
    "text with\r\nwindows\rnewlines\n",
    "  doubled   spaces\tand\ttabs  ",
    "<b>ZAŻÓŁĆ</b> gęślą <i>jaźń</i>",
    "<p>price&nbsp;1&nbsp;234</p>",  # entities are NOT decoded by the chain
    "",
    "<>",
    "<x>",
    "a<>b",
]


def ref_chain(ref, html: str) -> str:
    s = ref.tr.apply_transform(html, "remove_html")
    s = ref.tr.apply_transform(s, "remove_newlines")
    s = ref.tr.apply_transform(s, "normalize_spaces")
    return s


def test_extract_text_byte_identical_string_input(spark, ref):
    expected = [ref_chain(ref, h) for h in HTML_CASES]
    got = spark_one_col(spark, HTML_CASES, extract_text_expr)
    assert got == expected


def test_extract_text_byte_identical_binary_input(spark, ref):
    payloads = [h.encode("utf-8") for h in HTML_CASES]
    expected = [ref_chain(ref, h) for h in HTML_CASES]
    got = spark_one_col(spark, payloads, extract_text_expr, in_type="binary")
    assert got == expected


def test_python_oracle_agrees_with_reference(ref):
    for h in HTML_CASES:
        assert extract_text_py(h) == ref_chain(ref, h)


def test_synthetic_pages_invariant(spark):
    """Every synthesized page satisfies extractor(html) == text exactly."""
    from datamatcher_spark.sources.synth import generate_pages

    pages = generate_pages(spark, n_docs=300, seed=7)
    bad = (
        pages.withColumn("extracted", extract_text_expr(F.col("html")))
        .filter(~F.col("extracted").eqNullSafe(F.col("text")))
        .count()
    )
    assert bad == 0
