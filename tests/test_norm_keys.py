"""normalize_key / is_empty / EAN-variant expressions vs the reference
functions executed as oracles on the same adversarial inputs."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datamatcher_spark.norm import (
    ean_variants_expr,
    is_empty_expr,
    normalize_for_fuzzy_expr,
    normalize_key_expr,
)
from tests.conftest import spark_one_col

ADVERSARIAL = [
    None,
    "",
    "   ",
    "N/A",
    "#n/a",
    "brak",
    "BRAK",
    "nan",
    "None",
    "-",
    "123",
    "123.0",
    "-123.0",
    "0123.0",
    "12.50",
    "1-2.0",
    "abc.0",
    "  spaced   out  key ",
    "UPPER lower",
    "0001234",
    "0",
    "000",
    "Elektronika > TV > Telewizory",
    'Cat "A" > B / C',
    "a\\b>c",
    "tab\tseparated",
    "x  y   z",
    "ZAŻÓŁĆ gęślą",
]

OPTION_GRID = [
    {},
    {"case_insensitive": True},
    {"strip_leading_zeros": True},
    {"case_insensitive": True, "strip_leading_zeros": True},
    {"strip_decimal": False},
    {"treat_empty_as_null": False},
    {"normalize_paths": True},
    {"normalize_paths": True, "case_insensitive": True},
]


@pytest.mark.parametrize("opts", OPTION_GRID, ids=[str(o) for o in OPTION_GRID])
def test_normalize_key_matches_reference(spark, ref, opts):
    expected = [ref.kn.normalize_key(v, opts) for v in ADVERSARIAL]
    got = spark_one_col(
        spark, ADVERSARIAL, lambda c: normalize_key_expr(c, **opts)
    )
    assert got == expected


def test_is_empty_matches_reference(spark, ref):
    expected = [ref.kn.is_empty(v) for v in ADVERSARIAL]
    got = spark_one_col(spark, ADVERSARIAL, is_empty_expr)
    assert got == expected


def test_ean_variants_match_reference(spark, ref):
    ds = ref.ds.DataSource()
    keys = [
        "078484099216",
        "78484099216",
        "0",
        "000",
        "12345678901234",
        "123456789012345",  # >14 digits: no padding beyond original set
        "ABC123",
        "123.0",
        "  456 ",
    ]
    expected = []
    for k in keys:
        ks = k.strip()
        if ks.endswith(".0") and ks[:-2].replace("-", "").isdigit():
            ks = ks[:-2]
        expected.append(sorted(ds._generate_ean_variants(ks)))
    got = spark_one_col(spark, keys, ean_variants_expr)
    assert [sorted(g) for g in got] == expected


def test_normalize_for_fuzzy_matches_reference(spark, ref):
    vals = [
        "Hello-World_Test.Case",
        "a,b/c\\d(e)f[g]h\"i'j",
        "  MULTI   space  ",
        "",
        "ok",
    ]
    expected = [ref.fm.normalize_for_fuzzy(v) for v in vals]
    got = spark_one_col(spark, vals, normalize_for_fuzzy_expr)
    assert got == expected


@settings(max_examples=30, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
    )
)
def test_normalize_key_idempotent_py_oracle(ref, s):
    """normalize(normalize(x)) == normalize(x) on the reference oracle —
    guards the fixpoint assumption our single-pass expressions rely on."""
    once = ref.kn.normalize_key(s, {})
    assert ref.kn.normalize_key(once, {}) == once


def test_variant_closure(spark, ref):
    """Any zero-padded form of a digit key shares a variant with any other
    form (blocking-correctness invariant behind the exploded join)."""
    forms = ["123", "0123", "00123", "00000000000123"]
    outs = spark_one_col(spark, forms, ean_variants_expr)
    for a, b in itertools.combinations(outs, 2):
        assert set(a) & set(b)
