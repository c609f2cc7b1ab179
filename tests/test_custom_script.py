"""Custom-script compiler vs the reference's sandboxed per-value eval.

Oracle: a faithful re-implementation of the reference's
``_execute_custom_script`` semantics (core/matcher.py:117-146 — safe
namespace, any error returns the original value) run per value in plain
Python; the compiled Column must produce the same stringified results.
Documented drift (NULL handling, round ties) is asserted explicitly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datamatcher_spark.norm.custom_script import (
    UnsupportedScript,
    compile_script,
    custom_script_expr,
)


def reference_eval(value, script):
    """Reference semantics: eval an x-expression/lambda over a value,
    errors → original value (re-implemented from the documented contract,
    not copied)."""
    if not script or not script.strip():
        return value
    ns = {
        "__builtins__": {
            "str": str, "int": int, "float": float, "bool": bool,
            "len": len, "abs": abs, "round": round, "min": min, "max": max,
            "sum": sum, "sorted": sorted, "list": list, "dict": dict,
            "upper": str.upper, "lower": str.lower, "strip": str.strip,
            "replace": str.replace, "split": str.split,
            "None": None, "True": True, "False": False,
        }
    }
    try:
        if script.strip().startswith("lambda"):
            return eval(script.strip(), ns)(value)  # noqa: S307
        ns["x"] = value
        return eval(script.strip(), ns)  # noqa: S307
    except Exception:
        return value


VALUES = [
    "hello world", "  padded  ", "UPPER", "MiXeD Case", "",
    "123", "-42", "3.14", "2.5", "abc123", "a,b,c", "x|y",
    "0", "1", "a" * 40, "tab\tsep", "Customer#000000042",
]

SCRIPTS = [
    "x.upper()",
    "x.lower()",
    "x.strip()",
    "lambda x: x.upper()",
    "lambda v: v.lower().strip()",
    "x.replace('a', 'Z')",
    "x + '!'",
    "'pre-' + x",
    "x * 3",
    "len(x)",
    "str(len(x.strip()))",
    "int(x)",
    "float(x)",
    "str(int(x) * 2)",
    "str(int(x) % 7)",
    "str(int(x) // 2)",
    "abs(int(x) - 100)",
    "min(len(x), 5)",
    "max(len(x), 5)",
    "x[0]",
    "x[2]",
    "x[-1]",
    "x[:3]",
    "x[2:5]",
    "x.split(',')[0]",
    "x.split(',')[1]",
    "x.split(',')[-1]",
    "x.zfill(8)",
    "x.startswith('a')",
    "x.endswith('3')",
    "x.upper() if len(x) > 5 else x.lower()",
    "'long' if len(x) > 10 else 'short'",
    "x if x else 'EMPTY'",
    "x.strip().upper() if 'a' in x else x",
    "upper(x)",
    "strip(x)",
    "replace(x, 'a', 'b')",
    "x == 'hello world'",
    "x != ''",
    "int(x) > 100",
    "not x.startswith('a')",
    "x.lower().replace('#', '-') if 'Customer' in x else x.upper()",
    "round(float(x), 1)",
    "round(float(x))",
    "-int(x)",
    "float(x) / 4",
    "int(x) ** 2",
    "(int(x) + 1) * (int(x) - 1)",
    "0 < len(x) < 10",
    # zero-divisor paths: VALUES contains '0', so these hit Python
    # ZeroDivisionError → passthrough; ANSI Spark would raise
    # DIVIDE_BY_ZERO / REMAINDER_BY_ZERO without the try_* compilation
    "10 / int(x)",
    "100 % int(x)",
    "7 // int(x)",
]


def _canon(v):
    """Stringify like the engine does (merge land is stringly-typed)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return str(v).lower()  # Spark boolean→string is 'true'/'false'
    if isinstance(v, float):
        return repr(v)
    return str(v)


@pytest.fixture(scope="module")
def script_results(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "x string")
    cols = {f"s{i}": custom_script_expr(s, F.col("x")) for i, s in enumerate(SCRIPTS)}
    rows = df.select("x", *[c.alias(n) for n, c in cols.items()]).collect()
    return {r.x: {f"s{i}": r[f"s{i}"] for i in range(len(SCRIPTS))} for r in rows}


def test_scripts_match_reference_eval(script_results):
    bad = []
    for i, script in enumerate(SCRIPTS):
        for v in VALUES:
            expected = reference_eval(v, script)
            got = script_results[v][f"s{i}"]
            exp_s = _canon(expected)
            if exp_s != got:
                bad.append((script, v, exp_s, got))
    assert not bad, f"{len(bad)} mismatches, e.g. {bad[:8]}"


def test_unsupported_scripts_pass_through(spark):
    """Out-of-grammar scripts behave like reference eval errors: the
    column comes back unchanged."""
    scripts = [
        "import os",                 # SyntaxError in eval mode
        "__import__('os')",          # unknown name form
        "x.__class__",               # attribute access (not a method call)
        "open('/etc/passwd')",       # unknown builtin
        "sorted(x)",                 # unsupported builtin (list result)
        "{'a': x}",                  # dict literal
        "[c for c in x]",            # comprehension
        "x @ x",                     # unsupported operator
        "lambda x, y: x",            # two-arg lambda
        "x.center(5)",               # unsupported method
    ]
    df = spark.createDataFrame([("abc",), ("42",)], "x string")
    row = df.select(
        *[custom_script_expr(s, F.col("x")).alias(f"s{i}") for i, s in enumerate(scripts)],
        "x",
    ).collect()
    for r in row:
        for i in range(len(scripts)):
            assert r[f"s{i}"] == r.x


def test_value_level_errors_pass_through(spark):
    """int('abc') raises in Python → reference returns the original value;
    compiled form must do the same via try_cast NULL + coalesce."""
    df = spark.createDataFrame(
        [("abc",), ("12",), ("2.5",), ("",), (None,)], "x string"
    )
    out = {
        r.x: r.y
        for r in df.select(
            "x", custom_script_expr("str(int(x) * 2)", F.col("x")).alias("y")
        ).collect()
    }
    assert out["abc"] == "abc"      # int('abc') raises → passthrough
    assert out["12"] == "24"
    assert out["2.5"] == "2.5"      # int('2.5') raises → passthrough
    assert out[""] == ""
    assert out[None] is None        # documented drift: NULL in → NULL out


def test_ansi_overflow_and_zero_div_pass_through(spark):
    """Spark 4 ANSI mode (the default on this repo's sessions) raises
    DIVIDE_BY_ZERO / REMAINDER_BY_ZERO / CAST_OVERFLOW / ARITHMETIC_OVERFLOW
    as job-killing exceptions; the reference's per-row try/except returns
    the original value. The compiled try_* forms must passthrough — the
    job must never crash on a bad value.

    Documented drift: where Python's arbitrary-precision ints SUCCEED
    (int(1e300), bigint*bigint overflow) the compiled form passes the
    original value through instead of producing a 300-digit integer.
    """
    big = "9223372036854775807"  # Long.MAX_VALUE
    df = spark.createDataFrame(
        [("0",), ("4",), ("-3",), ("1e300",), (big,)], "x string"
    )
    scripts = {
        "div0": "10 / int(x)",
        "mod0": "10 % int(x)",
        "fdiv0": "10 // int(x)",
        "overflow_cast": "int(float(x))",
        "overflow_mul": "int(x) * int(x)",
        "overflow_add": "int(x) + 1",
    }
    rows = {
        r.x: r
        for r in df.select(
            "x",
            *[custom_script_expr(s, F.col("x")).alias(n) for n, s in scripts.items()],
        ).collect()
    }
    # zero divisor → passthrough (Python ZeroDivisionError → original value)
    assert rows["0"].div0 == "0"
    assert rows["0"].mod0 == "0"
    assert rows["0"].fdiv0 == "0"
    # normal values still compute, with Python semantics
    assert rows["4"].div0 == "2.5"
    assert rows["-3"].mod0 == "-2"      # sign of divisor
    assert rows["-3"].fdiv0 == "-4"     # floor, not trunc
    assert rows["4"].overflow_cast == "4"
    assert rows["4"].overflow_mul == "16"
    # overflow → passthrough, never a crashed job (drift: Python bigint succeeds)
    assert rows["1e300"].overflow_cast == "1e300"
    assert rows[big].overflow_mul == big
    assert rows[big].overflow_add == big


def test_compile_rejects_at_compile_time():
    with pytest.raises((UnsupportedScript, SyntaxError)):
        compile_script("__import__('os').system('id')", F.lit("x"))
    with pytest.raises((UnsupportedScript, SyntaxError)):
        compile_script("x;", F.lit("x"))


def test_mapping_integration(spark):
    """custom_script slots into ColumnMapping after the named transform."""
    from datamatcher_spark.operators.merge import ColumnMapping, apply_mappings

    df = spark.createDataFrame(
        [(1, "old", "  New Val  ")], "id int, target string, src_val string"
    )
    m = ColumnMapping(
        source_column="val", target_column="target",
        transform="trim", custom_script="x.upper() + '!'",
    )
    row = apply_mappings(df, [m]).collect()[0]
    assert row.target == "NEW VAL!"
    assert row["__change_target"] == "changed"
