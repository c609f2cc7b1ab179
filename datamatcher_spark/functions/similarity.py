"""Pairwise string-similarity scorers.

Levenshtein-based similarity stays JVM-side (Spark has a builtin, and the
reference's ``similarity_ratio`` is ``1 − dist/max_len`` —
utils/fuzzy_matcher.py:34-47). Jaro-Winkler has no Spark builtin, so it is
an Arrow-batched pandas UDF: batches cross to Python over Arrow once per
10k rows, never per row (BASELINE.json input_hint: "no per-row Python" at
the Spark API level). The JW implementation is the standard published
algorithm (Winkler 1990) with the usual p=0.1, 4-char prefix cap.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def levenshtein_sim_expr(a: Column, b: Column) -> Column:
    """1 − levenshtein/max_len; both-empty → 1.0, one-empty → 0.0
    (exact reference semantics, utils/fuzzy_matcher.py:34-47)."""
    la, lb = F.length(a), F.length(b)
    return (
        F.when((la == 0) & (lb == 0), F.lit(1.0))
        .when((la == 0) | (lb == 0), F.lit(0.0))
        .otherwise(
            1.0 - F.levenshtein(a, b).cast("double") / F.greatest(la, lb).cast("double")
        )
    )


def jaro_winkler(s1: str, s2: str) -> float:
    """Plain-Python Jaro-Winkler (standard algorithm, scaling p=0.1)."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    l1, l2 = len(s1), len(s2)
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1.0 - jaro)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover
    """Arrow-batched JW over two string series (nulls → 0.0).

    Two batch-level shortcuts before the per-pair Python kernel:
    * vectorized equality — near-dup candidate pairs very often carry
      IDENTICAL normalized titles (same page mirrored), and s1 == s2 is
      1.0 by definition, so that majority never enters the char loop;
    * per-batch memoization — hub pages pair against many others with
      the same (title_a, title_b) combination inside one block.
    """
    import numpy as np

    av, bv = a.to_numpy(dtype=object), b.to_numpy(dtype=object)
    out = np.zeros(len(a), dtype=np.float64)
    valid = a.notna().to_numpy() & b.notna().to_numpy()
    eq = valid & (av == bv)
    out[eq] = 1.0
    cache: dict = {}
    for i in np.flatnonzero(valid & ~eq):
        key = (av[i], bv[i])
        v = cache.get(key)
        if v is None:
            v = cache[key] = jaro_winkler(*key)
        out[i] = v
    return pd.Series(out, dtype="float64")
