"""Scalar transform registry as Catalyst Column-expression builders.

Re-expresses the reference TRANSFORMS registry
(/root/reference/core/transformer.py:9-26) declaratively. Each builder is
``Column -> Column``; the registry stays JVM-side (whole-stage codegen)
except ``title``, whose Python ``str.title()`` semantics (capitalize after
any non-alpha) differ from Spark ``initcap`` (space-delimited words) — that
one is an Arrow-batched pandas UDF, never per-row Python.

Fidelity notes (each verified in tests/test_transforms.py against the
reference functions executed as oracles):
  * reference errors → passthrough (transformer.py:46-48): numeric
    transforms emit strings and fall back to the stringified input when
    the cast fails, matching the reference's stringly-typed engine.
  * Python ``round`` is banker's rounding → ``F.bround``, not ``F.round``.
  * Python ``str.strip()`` strips all whitespace → regexp strip, not
    ``F.trim`` (0x20-only).
"""

from __future__ import annotations

from typing import Callable, Dict

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from datamatcher_spark.norm.keys import pystrip_expr


def _s(c: Column) -> Column:
    return c.cast("string")


def _numeric(c: Column) -> Column:
    """float(str(x)) with ANSI-safe parsing: null when Python would raise."""
    return _s(c).try_cast("double")


def _num_or_passthrough(c: Column, out: Column, *, nan_result: str | None) -> Column:
    """Numeric transform with reference error-passthrough semantics
    (transformer.py:46-48): if float(x) raises, return str(x) unchanged.
    ``nan_result``: what Python produces for float('nan') input — 'nan' for
    round(); None (passthrough, int() raises ValueError) for int casts."""
    d = _numeric(c)
    nan_case = F.lit(nan_result) if nan_result is not None else _s(c)
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(d.isNull(), _s(c))
        .when(F.isnan(d), nan_case)
        .otherwise(out.cast("string"))
    )


@F.pandas_udf(StringType())
def _py_title(s: pd.Series) -> pd.Series:  # pragma: no cover - executor side
    return s.astype("string").str.title().astype(object).where(s.notna(), None)


def _round2_py(v):  # reference round_2: str(round(float(x), 2)), errors pass through
    if v is None:
        return None
    try:
        return str(round(float(v), 2))
    except (ValueError, TypeError, AttributeError):
        return v


@F.pandas_udf(StringType())
def _py_round2(s: pd.Series) -> pd.Series:  # pragma: no cover - executor side
    # Python round() ties on the *binary* double (2.675 → 2.67) where JVM
    # bround ties on the decimal repr (→ 2.68); exactness requires Python.
    return s.map(_round2_py)


def transform_expr(transform_id: str | None, c: Column) -> Column:
    """Apply a named transform (reference transform ids) to a Column."""
    if transform_id is None or transform_id == "none":
        return c
    builder = TRANSFORMS.get(transform_id)
    if builder is None:
        return c
    return builder(c)


def _remove_html(c: Column) -> Column:
    # non-greedy tag strip — the exact reference pattern (transformer.py:18)
    return F.regexp_replace(_s(c), r"<[^<]+?>", "")


def _remove_newlines(c: Column) -> Column:
    return F.replace(F.replace(_s(c), F.lit("\n"), F.lit(" ")), F.lit("\r"), F.lit(""))


def _normalize_spaces(c: Column) -> Column:
    # ' '.join(s.split()): strip + collapse any whitespace runs to one space
    return F.regexp_replace(pystrip_expr(_s(c)), r"\s+", " ")


TRANSFORMS: Dict[str, Callable[[Column], Column]] = {
    "none": lambda c: c,
    "trim": lambda c: pystrip_expr(c),
    "upper": lambda c: F.upper(_s(c)),
    "lower": lambda c: F.lower(_s(c)),
    "title": lambda c: _py_title(_s(c)),
    "round_2": lambda c: _py_round2(_s(c)),
    "round_0": lambda c: _num_or_passthrough(
        c, F.bround(_numeric(c), 0).try_cast("long"), nan_result=None
    ),
    "int": lambda c: _num_or_passthrough(
        c, _numeric(c).try_cast("long"), nan_result=None
    ),
    "remove_html": _remove_html,
    "first_100": lambda c: F.substring(_s(c), 1, 100),
    "first_255": lambda c: F.substring(_s(c), 1, 255),
    "first_500": lambda c: F.substring(_s(c), 1, 500),
    "extract_numbers": lambda c: F.regexp_replace(_s(c), r"[^0-9]", ""),
    "extract_decimal": lambda c: F.replace(
        F.regexp_replace(_s(c), r"[^0-9.,]", ""), F.lit(","), F.lit(".")
    ),
    "remove_newlines": _remove_newlines,
    "normalize_spaces": _normalize_spaces,
}


def regex_transform_expr(c: Column, pattern: str, replacement: str) -> Column:
    """Regex find/replace (reference transformer.py:58-75); invalid patterns
    are rejected at plan time by Spark rather than silently passing through —
    validate with ``validate_regex`` first."""
    return F.when(c.isNull(), F.lit("")).otherwise(
        F.regexp_replace(_s(c), pattern, replacement)
    )


def value_mapping_expr(c: Column, mapping: Dict[str, str]) -> Column:
    """Dict-lookup transform with passthrough on miss
    (reference transformer.py:78-92): lookup key is the stripped string."""
    if not mapping:
        return c
    key = pystrip_expr(c)
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(F.element_at(m, key), _s(c))
    )


def template_expr(template: str, col_for: Callable[[str], Column]) -> Column:
    """Render '{Col1} - {Col2}' templates (reference transformer.py:95-109,
    core/mapping.py:194-213). Placeholders are replaced by the stringified
    column value; nulls render as ''. ``col_for`` maps a placeholder name to
    its Column (lets callers route source- vs target-side columns)."""
    import re as _re

    parts: list[Column] = []
    pos = 0
    for m in _re.finditer(r"\{([^{}]+)\}", template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(F.coalesce(col_for(m.group(1)).cast("string"), F.lit("")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit(template)
    return F.concat(*parts)
