"""Blocking-key / business-key normalization as pure Catalyst expressions.

Semantics mirror the reference engine's key handling (see SURVEY.md §2.8):
  * ``normalize_key``      — /root/reference/utils/key_normalizer.py:12-77
  * ``is_empty`` sentinels — /root/reference/utils/key_normalizer.py:9,80-101
  * EAN variant expansion  — /root/reference/core/data_source.py:171-202
  * path canonicalization  — /root/reference/utils/key_normalizer.py:62-76
                             and /root/reference/dopasywatorStruktur 1.py:7-26
  * fuzzy pre-normalization— /root/reference/utils/fuzzy_matcher.py:144-161

Everything here is a Column-in → Column-out builder: no I/O, no UDFs,
fully whole-stage-codegen'able, so Catalyst can push these below joins
and into parquet scans. These expressions ARE the stage-1 blocking keys
of the web-scale pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Upper-cased sentinel set considered "empty" (reference EMPTY_VALUES,
# key_normalizer.py:9 — case-insensitive match, so one upper-cased set).
EMPTY_SENTINELS_UPPER = ["NULL", "N/A", "#N/A", "-", "BRAK", "NAN", "NONE"]

# "digits-and-dashes with at least one digit, ending in .0" — the exact
# reference guard `s.endswith('.0') and s[:-2].replace('-','').isdigit()`.
_FLOATIFIED_INT_RE = r"^[-0-9]*[0-9][-0-9]*\.0$"


def pystrip_expr(c: Column) -> Column:
    """Python ``str.strip()`` semantics (all whitespace, not just spaces —
    Spark's ``trim`` strips 0x20 only).

    r7: ``btrim`` over the exact Java-regex ``\\s`` class
    ``[ \\t\\n\\x0B\\f\\r]`` — char-set trim is equivalent to stripping
    ``^\\s+|\\s+$`` (same set, ends only) and skips the regex engine on
    every key of every normalize-heavy aggregate (guide §1.2 step 2:
    per-task work)."""
    return F.btrim(c.cast("string"), F.lit(" \t\n\x0b\f\r"))


def is_empty_expr(c: Column) -> Column:
    """True where the value is null / blank / a sentinel empty.

    Reference: utils/key_normalizer.py:80-101 (pd.isna | blank | sentinel,
    case-insensitive). Float NaN stringifies to 'NaN' and is caught by the
    sentinel list, matching pandas' isna treatment.
    """
    s = pystrip_expr(c)
    return c.isNull() | (s == "") | F.upper(s).isin(EMPTY_SENTINELS_UPPER)


def _strip_floatified(s: Column) -> Column:
    """Remove Excel's trailing '.0' from integer-looking strings.

    The cheap ``endswith('.0')`` guard short-circuits the regex for the
    overwhelmingly common keys without the suffix (codegen's && skips the
    second operand) — the regex itself requires the suffix, so the guard
    never changes the outcome."""
    return F.when(
        s.endswith(".0") & s.rlike(_FLOATIFIED_INT_RE),
        F.substring(s, 1, F.length(s) - 2),
    ).otherwise(s)


def normalize_path_expr(s: Column) -> Column:
    """Canonicalize a category path: 'Elektronika > TV' → 'elektronika/tv'.

    Reference: utils/key_normalizer.py:62-76 (same sequential replaces).
    """
    s = F.replace(s, F.lit('"'), F.lit(""))
    s = F.replace(s, F.lit("'"), F.lit(""))
    s = F.replace(s, F.lit(" > "), F.lit("/"))
    s = F.replace(s, F.lit(">"), F.lit("/"))
    s = F.replace(s, F.lit(" / "), F.lit("/"))
    s = F.replace(s, F.lit("\\"), F.lit("/"))
    s = F.replace(s, F.lit(" "), F.lit(""))
    s = F.lower(s)
    s = F.regexp_replace(s, r"/+", "/")
    s = F.regexp_replace(s, r"^/+|/+$", "")
    return s


def normalize_key_expr(
    c: Column,
    *,
    case_insensitive: bool = False,
    strip_leading_zeros: bool = False,
    treat_empty_as_null: bool = True,
    strip_decimal: bool = True,
    normalize_paths: bool = False,
) -> Column:
    """The engine's blocking-key expression.

    Option-for-option equivalent of the reference ``normalize_key``
    (utils/key_normalizer.py:12-77): trim → sentinel-empty→null →
    '.0' strip → double-space collapse → optional lower / zero-strip /
    path canonicalization. Returns a string Column (nullable).
    """
    s = pystrip_expr(c)
    empty = c.isNull() | (s == "") | F.upper(s).isin(EMPTY_SENTINELS_UPPER)

    if strip_decimal:
        s = _strip_floatified(s)
    # collapse runs of 2+ spaces (reference loops `'  '→' '` to fixpoint);
    # the contains('  ') guard skips the regex for single-spaced keys —
    # identical output (a string without '  ' is a fixpoint already)
    s = F.when(
        s.contains("  "), F.regexp_replace(s, r" {2,}", " ")
    ).otherwise(s)
    if case_insensitive:
        s = F.lower(s)
    if strip_leading_zeros:
        stripped = F.regexp_replace(s, r"^0+", "")
        s = F.when(stripped == "", F.lit("0")).otherwise(stripped)
    if normalize_paths:
        s = normalize_path_expr(s)

    if treat_empty_as_null:
        return F.when(empty, F.lit(None).cast("string")).otherwise(s)
    # reference returns the *stripped* original when empties are kept
    return F.when(empty, pystrip_expr(c)).otherwise(s)


def ean_variants_expr(c: Column) -> Column:
    """All zero-padding variants of a numeric key, as array<string>.

    Index-side variant expansion ("transform the INDEX, not the query",
    reference core/data_source.py:117-202): for a digit key, emit the
    original, the zero-stripped form, and every zero-padded form up to 14
    chars. Non-digit keys map to [key]. Explode this before the join so
    ANY format on the probe side hits — the probe key needs only minimal
    cleanup (trim + '.0' strip).
    """
    s = _strip_floatified(pystrip_expr(c))
    is_digits = s.rlike(r"^[0-9]+$")
    stripped0 = F.regexp_replace(s, r"^0+", "")
    stripped = F.when(stripped0 == "", F.lit("0")).otherwise(stripped0)
    padded = F.filter(
        F.array(*[F.lpad(stripped, n, "0") for n in range(1, 15)]),
        lambda v: F.length(v) >= F.length(stripped),
    )
    variants = F.array_distinct(F.concat(F.array(s), padded))
    return F.when(
        s.isNull() | (s == ""), F.array(s)
    ).when(is_digits, variants).otherwise(F.array(s))


def probe_key_expr(c: Column) -> Column:
    """Minimal probe-side cleanup: trim, null-out 'nan'/blank, strip '.0'.

    Mirrors the probe path of the reference lookup
    (core/data_source.py:210-228): the index holds all variants, the
    probe key is taken nearly as-is.
    """
    s = pystrip_expr(c)
    s = F.when((s == "") | (F.lower(s) == "nan"), F.lit(None).cast("string")).otherwise(s)
    return _strip_floatified(s)


def normalize_for_fuzzy_expr(c: Column) -> Column:
    """Pre-normalization before fuzzy scoring: lower, punctuation→space,
    collapse runs of spaces, trim. Reference: utils/fuzzy_matcher.py:144-161.
    """
    s = F.lower(pystrip_expr(c))
    s = F.regexp_replace(s, r'[-_.,/\\()\[\]"\']', " ")
    s = F.regexp_replace(s, r" {2,}", " ")
    return pystrip_expr(s)


def norm_domain_expr(url: Column) -> Column:
    """Normalized registrable host for domain blocking: lowercase host,
    strip a leading 'www.'. The web-scale analogue of the reference's
    normalized business key (stage-1 deterministic block key).
    """
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")
