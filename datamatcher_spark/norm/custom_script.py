"""Catalyst-safe custom-script transform — the reference's eval sandbox
compiled to Column expressions.

The reference's only user-extensibility surface is a per-value sandboxed
``eval`` of an ``x``-expression or ``lambda x: ...`` with a whitelisted
builtin namespace, where ANY error returns the original value
(/root/reference/core/matcher.py:117-146, applied per mapping at
core/matcher.py:333-334). Per-row Python eval is exactly what a 100 TB
Spark job must never do, so this module parses the same grammar with
``ast`` and compiles it into Catalyst Column expressions: whitelisted
node types only, builtins and str-methods mapped to
``pyspark.sql.functions`` — the whole script stays inside whole-stage
codegen (``title()`` is the one Arrow-batched exception, reusing the
Python-parity pandas UDF from the transform registry).

Error semantics mirror the reference at both levels:

* script level — unparseable or out-of-grammar scripts make
  ``custom_script_expr`` return the input column unchanged (the
  reference returns the value when eval raises);
* value level — operations that raise per value in Python
  (``int('abc')``, out-of-range subscripts) compile to ``try_cast`` /
  ``element_at`` and surface as NULL, and the top-level wrapper
  coalesces NULL results back to the original value: the same
  observable output as the reference's per-row ``try/except``.

Typed compilation: every node compiles to ``(Column, tag)`` with tag in
{'str', 'int', 'float', 'bool', 'none'} so Python semantics survive the
translation — ``int + int`` stays integral (``str(int(x) * 2)`` gives
``'10'``, never ``'10.0'``), ``/`` is true division, ``+`` concatenates
when either side is a string, ``%`` uses Python's sign-of-divisor rule.

Documented drift from per-value eval (asserted in tests):
* NULL in → NULL out for every script (``str(None)`` would be ``'None'``
  in Python; SQL NULL propagation is saner and the wrapper's passthrough
  makes the difference unobservable in merge pipelines);
* ``round`` ties break on the decimal representation (``F.bround``)
  rather than the binary double.
"""

from __future__ import annotations

import ast

from pyspark.sql import Column
from pyspark.sql import functions as F

from datamatcher_spark.norm.keys import pystrip_expr

__all__ = ["UnsupportedScript", "compile_script", "custom_script_expr"]


class UnsupportedScript(ValueError):
    """Script parses but uses grammar outside the compilable subset."""


STR, INT, FLT, BOOL, NONE = "str", "int", "float", "bool", "none"
_NUMERIC = (INT, FLT)

Typed = tuple  # (Column, tag)


def _num(c: Column, tag: str) -> Column:
    """Coerce a typed value into arithmetic position (Python float(str)
    semantics for strings: unparseable → NULL → passthrough upstream)."""
    if tag == STR:
        return c.try_cast("double")
    if tag == BOOL:
        return c.cast("int")
    return c


def _unify(a: Typed, b: Typed) -> tuple[Column, Column, str]:
    """Unify two typed values for a common-type context (IfExp)."""
    (ca, ta), (cb, tb) = a, b
    if ta == tb:
        return ca, cb, ta
    if ta in _NUMERIC and tb in _NUMERIC:
        return ca.cast("double"), cb.cast("double"), FLT
    if NONE in (ta, tb):
        other = tb if ta == NONE else ta
        return ca, cb, other
    return ca.cast("string"), cb.cast("string"), STR


def _truthy(c: Column, tag: str) -> Column:
    """Python truthiness as a predicate: '' / 0 / None are falsy."""
    if tag == BOOL:
        return F.coalesce(c, F.lit(False))
    if tag == STR:
        return c.isNotNull() & (c != "")
    if tag in _NUMERIC:
        return c.isNotNull() & (c != 0)
    if tag == NONE:
        return F.lit(False)
    raise UnsupportedScript(f"truthiness of {tag}")


class _Compiler(ast.NodeVisitor):
    def __init__(self, var: str, x: Column, x_tag: str):
        self.var = var
        self.x = x
        self.x_tag = x_tag

    def generic_visit(self, node: ast.AST) -> Typed:
        # any node type without an explicit handler is outside the grammar
        raise UnsupportedScript(f"node {type(node).__name__}")

    @staticmethod
    def _const_of(node: ast.AST, types: tuple) -> object:
        """Compile-time constant (Spark fns like bround/lpad need Python
        ints, split needs the literal separator string)."""
        if isinstance(node, ast.Constant) and isinstance(node.value, types):
            return node.value
        raise UnsupportedScript("compile-time constant required")

    # -- leaves ------------------------------------------------------------
    def visit_Name(self, node: ast.Name) -> Typed:
        if node.id != self.var:
            raise UnsupportedScript(f"unknown name {node.id!r}")
        return self.x, self.x_tag

    def visit_Constant(self, node: ast.Constant) -> Typed:
        v = node.value
        if isinstance(v, bool):
            return F.lit(v), BOOL
        if isinstance(v, int):
            return F.lit(v), INT
        if isinstance(v, float):
            return F.lit(v), FLT
        if isinstance(v, str):
            return F.lit(v), STR
        if v is None:
            return F.lit(None), NONE
        raise UnsupportedScript(f"constant {v!r}")

    # -- operators ---------------------------------------------------------
    def visit_BinOp(self, node: ast.BinOp) -> Typed:
        lc, lt = self.visit(node.left)
        rc, rt = self.visit(node.right)
        op = type(node.op)
        if op is ast.Add and (lt == STR or rt == STR):
            if lt == STR and rt == STR:
                return F.concat(lc, rc), STR
            raise UnsupportedScript("str + non-str")
        if op is ast.Mult and lt == STR and rt == INT:
            return F.repeat(lc, rc.try_cast("int")), STR
        if op is ast.Mult and lt == INT and rt == STR:
            return F.repeat(rc, lc.try_cast("int")), STR
        ln, rn = _num(lc, lt), _num(rc, rt)
        both_int = lt in (INT, BOOL) and rt in (INT, BOOL)
        out_tag = INT if both_int else FLT
        # ANSI mode (Spark 4 default) turns value-level arithmetic errors
        # into job-killing exceptions: /0 and %0 raise DIVIDE_BY_ZERO /
        # REMAINDER_BY_ZERO, bigint overflow raises ARITHMETIC_OVERFLOW
        # (where Python's arbitrary-precision ints would succeed). The
        # reference's per-row try/except returns the original value in
        # every such case, so compile to the try_* variants: NULL at the
        # failing value, restored to the original by the top-level
        # coalesce — never a crashed job.
        if op is ast.Add:
            return (F.try_add(ln, rn) if both_int else ln + rn), out_tag
        if op is ast.Sub:
            return (F.try_subtract(ln, rn) if both_int else ln - rn), out_tag
        if op is ast.Mult:
            return (F.try_multiply(ln, rn) if both_int else ln * rn), out_tag
        if op is ast.Div:  # Python true division; /0 → NULL → passthrough
            return F.try_divide(ln.cast("double"), rn.cast("double")), FLT
        if op is ast.FloorDiv:
            q = F.floor(F.try_divide(ln.cast("double"), rn.cast("double")))
            return (q, INT) if both_int else (q.cast("double"), FLT)
        if op is ast.Mod:  # Python %: sign of the divisor; %0 → NULL
            m = F.try_mod(F.try_add(F.try_mod(ln, rn), rn), rn)
            return m, out_tag
        if op is ast.Pow:
            p = F.pow(ln.cast("double"), rn.cast("double"))
            if both_int and isinstance(node.right, ast.Constant) and node.right.value >= 0:
                return p.try_cast("long"), INT
            return p, FLT
        raise UnsupportedScript(f"operator {op.__name__}")

    def visit_UnaryOp(self, node: ast.UnaryOp) -> Typed:
        c, t = self.visit(node.operand)
        if isinstance(node.op, ast.USub):
            return -_num(c, t), (t if t in _NUMERIC else FLT)
        if isinstance(node.op, ast.Not):
            return ~_truthy(c, t), BOOL
        raise UnsupportedScript(f"unary {type(node.op).__name__}")

    def visit_BoolOp(self, node: ast.BoolOp) -> Typed:
        preds = [_truthy(*self.visit(v)) for v in node.values]
        out = preds[0]
        for p in preds[1:]:
            out = (out & p) if isinstance(node.op, ast.And) else (out | p)
        return out, BOOL

    def visit_Compare(self, node: ast.Compare) -> Typed:
        # chained comparisons AND pairwise, like Python
        items = [self.visit(node.left)] + [self.visit(c) for c in node.comparators]
        preds = []
        for (lc, lt), (rc, rt), op in zip(items, items[1:], node.ops):
            o = type(op)
            if o in (ast.In, ast.NotIn):
                if lt != STR or rt != STR:
                    raise UnsupportedScript("'in' only on strings")
                p = rc.contains(lc)
                preds.append(~p if o is ast.NotIn else p)
                continue
            if lt == STR and rt == STR:
                la, ra = lc, rc
            elif lt in _NUMERIC + (BOOL,) and rt in _NUMERIC + (BOOL,):
                la, ra = _num(lc, lt), _num(rc, rt)
            elif o in (ast.Eq, ast.NotEq):
                # Python: mixed-type == is False, != is True (no error)
                preds.append(F.lit(o is ast.NotEq))
                continue
            else:
                raise UnsupportedScript(f"compare {lt} vs {rt}")
            preds.append(
                {ast.Eq: la == ra, ast.NotEq: la != ra, ast.Lt: la < ra,
                 ast.LtE: la <= ra, ast.Gt: la > ra, ast.GtE: la >= ra}[o]
            )
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out, BOOL

    def visit_IfExp(self, node: ast.IfExp) -> Typed:
        cond = _truthy(*self.visit(node.test))
        a, b = self.visit(node.body), self.visit(node.orelse)
        ca, cb, tag = _unify(a, b)
        return F.when(cond, ca).otherwise(cb), tag

    # -- subscripts: s[i], s[i:j], x.split(sep)[i] ---------------------------
    def visit_Subscript(self, node: ast.Subscript) -> Typed:
        val, tag = self.visit(node.value)
        if isinstance(node.slice, ast.Slice):
            lo, hi, step = node.slice.lower, node.slice.upper, node.slice.step
            if step is not None or tag != STR:
                raise UnsupportedScript("only plain str slices")

            def _const(n, default):
                if n is None:
                    return default
                if isinstance(n, ast.Constant) and isinstance(n.value, int) and n.value >= 0:
                    return n.value
                raise UnsupportedScript("slice bounds must be non-negative ints")

            lo_v = _const(lo, 0)
            hi_v = _const(hi, None)
            length = F.lit(2_147_483_647) if hi_v is None else F.lit(max(hi_v - lo_v, 0))
            return F.substring(val, lo_v + 1, length), STR
        idx, idx_tag = self.visit(node.slice)
        if idx_tag != INT:
            raise UnsupportedScript("subscript index must be int")
        pos = idx.try_cast("int")  # index beyond int32 → NULL → passthrough
        if tag == STR:
            # Python s[i]: IndexError out of range → NULL → passthrough;
            # Spark substring with a negative pos already counts from the end
            one = F.when(pos >= 0, F.substring(val, pos + 1, 1)).otherwise(
                F.substring(val, pos, 1)
            )
            valid = F.when(pos >= 0, F.length(val) > pos).otherwise(
                F.length(val) >= -pos
            )
            return F.when(valid, one).otherwise(F.lit(None).cast("string")), STR
        if tag == "strlist":
            # try_element_at: 1-based, supports negative, out-of-range →
            # NULL (plain element_at THROWS under Spark 4 ANSI mode) —
            # NULL then passes the original value through, matching
            # Python's IndexError → reference passthrough
            return F.try_element_at(
                val, F.when(pos >= 0, pos + 1).otherwise(pos)
            ), STR
        raise UnsupportedScript(f"subscript on {tag}")

    # -- calls ---------------------------------------------------------------
    def visit_Call(self, node: ast.Call) -> Typed:
        if node.keywords:
            raise UnsupportedScript("keyword arguments")
        if isinstance(node.func, ast.Name):
            return self._builtin(node.func.id, node.args)
        if isinstance(node.func, ast.Attribute):
            target = self.visit(node.func.value)
            return self._method(node.func.attr, target, node.args)
        raise UnsupportedScript("call form")

    def _builtin(self, name: str, raw: list[ast.AST]) -> Typed:
        args = None if name in ("round",) else [self.visit(a) for a in raw]
        if name == "str" and len(args) == 1:
            c, t = args[0]
            return c.cast("string"), STR
        if name == "int" and len(args) == 1:
            c, t = args[0]
            if t == STR:
                # Python int(str) accepts surrounding whitespace only;
                # '2.5' raises → try_cast NULL → passthrough
                return pystrip_expr(c).try_cast("bigint"), INT
            # trunc toward zero, like Python; try_cast because ANSI raises
            # CAST_OVERFLOW on e.g. int(float('1e300')) where Python succeeds
            return _num(c, t).try_cast("long"), INT
        if name == "float" and len(args) == 1:
            c, t = args[0]
            return (c.try_cast("double") if t == STR
                    else _num(c, t).cast("double")), FLT
        if name == "len" and len(args) == 1:
            c, t = args[0]
            if t == "strlist":
                return F.size(c).cast("long"), INT
            return F.length(c.cast("string")).cast("long"), INT
        if name == "abs" and len(args) == 1:
            c, t = args[0]
            return F.abs(_num(c, t)), (t if t in _NUMERIC else FLT)
        if name == "round" and raw:
            c, t = self.visit(raw[0])
            n = _num(c, t)
            if len(raw) == 1:
                return F.bround(n, 0).try_cast("long"), INT
            if len(raw) == 2:
                nd = self._const_of(raw[1], (int,))
                return F.bround(n, nd), FLT
            raise UnsupportedScript("round arity")
        if name in ("min", "max") and args and len(args) >= 2:
            cols = [c for c, _ in args]
            tags = {t for _, t in args}
            fn = F.least if name == "min" else F.greatest
            if tags <= {INT}:
                return fn(*cols), INT
            if tags <= set(_NUMERIC):
                return fn(*[c.cast("double") for c in cols]), FLT
            if tags == {STR}:
                return fn(*cols), STR
            raise UnsupportedScript("min/max mixed types")
        # the reference namespace exposes str methods as plain functions
        # ('upper': str.upper → upper(x)); route them through _method
        if name in ("upper", "lower", "strip", "replace", "split") and raw:
            target = self.visit(raw[0])
            return self._method(name, target, raw[1:])
        raise UnsupportedScript(f"builtin {name}")

    def _method(self, name: str, target: Typed, raw: list[ast.AST]) -> Typed:
        c, t = target
        if t != STR:
            raise UnsupportedScript(f".{name} on {t}")
        args = [self.visit(a) for a in raw] if name not in ("zfill", "split") else None
        if name == "upper" and not raw:
            return F.upper(c), STR
        if name == "lower" and not raw:
            return F.lower(c), STR
        if name == "strip":
            if not raw:
                return pystrip_expr(c), STR  # Python strips ALL whitespace
            chars, ct = args[0]
            if ct != STR:
                raise UnsupportedScript("strip(chars)")
            return F.btrim(c, chars), STR
        if name == "lstrip" and not raw:
            return F.regexp_replace(c, r"^\s+", ""), STR
        if name == "rstrip" and not raw:
            return F.regexp_replace(c, r"\s+$", ""), STR
        if name == "title" and not raw:
            from datamatcher_spark.norm.transforms import _py_title

            return _py_title(c), STR
        if name == "replace" and raw and len(raw) == 2:
            (a, at), (b, bt) = args
            if at != STR or bt != STR:
                raise UnsupportedScript("replace args")
            return F.replace(c, a, b), STR
        if name in ("startswith", "endswith") and raw and len(raw) == 1:
            a, at = args[0]
            if at != STR:
                raise UnsupportedScript(f"{name} arg")
            return (c.startswith(a) if name == "startswith" else c.endswith(a)), BOOL
        if name == "zfill" and len(raw) == 1:
            width = self._const_of(raw[0], (int,))

            # lpad truncates when already longer (Python zfill never does),
            # and Python keeps a leading sign in front of the zeros
            def _z(s: Column, w: int) -> Column:
                return F.when(F.length(s) >= w, s).otherwise(F.lpad(s, w, "0"))

            signed = F.concat(
                F.substring(c, 1, 1),
                _z(F.substring(c, 2, 2_147_483_647), max(width - 1, 0)),
            )
            has_sign = c.startswith("-") | c.startswith("+")
            return F.when(has_sign, signed).otherwise(_z(c, width)), STR
        if name == "split" and len(raw) == 1:
            import re as _re

            sep = self._const_of(raw[0], (str,))
            if sep == "":
                raise UnsupportedScript("split('') raises in Python too")
            return F.split(c, _re.escape(sep), -1), "strlist"
        raise UnsupportedScript(f"method {name}")


def compile_script(script: str, x: Column, x_tag: str = STR) -> tuple[Column, str]:
    """Compile an 'x'-expression / lambda into (Column, type-tag).

    Raises ``UnsupportedScript`` (or ``SyntaxError``) when the script is
    outside the grammar — callers decide the fallback policy.
    """
    tree = ast.parse(script.strip(), mode="eval")
    body = tree.body
    var = "x"
    if isinstance(body, ast.Lambda):
        if len(body.args.args) != 1 or body.args.defaults or body.args.kwonlyargs:
            raise UnsupportedScript("lambda must take exactly one argument")
        var = body.args.args[0].arg
        body = body.body
    comp = _Compiler(var, x, x_tag)
    out = comp.visit(body)
    if not isinstance(out, tuple):  # generic_visit fell through → unsupported node
        raise UnsupportedScript(f"node {type(body).__name__}")
    return out


def custom_script_expr(script: str | None, col: Column) -> Column:
    """Reference-faithful wrapper: apply a custom script to a column with
    error → passthrough at both script and value level; output is the
    engine's stringly type (merge pipelines compare stringified values).
    """
    if not script or not script.strip():
        return col
    try:
        result, _tag = compile_script(script, col.cast("string"), STR)
    except (SyntaxError, UnsupportedScript, RecursionError):
        return col  # reference behavior: eval error → original value
    return F.coalesce(result.cast("string"), col.cast("string"))
