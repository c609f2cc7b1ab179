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


_JW_PAD_A = 0x10FFFF + 1  # sentinels above the Unicode range: a padded
_JW_PAD_B = 0x10FFFF + 2  # position can never equal any real char (or
#                           the other side's pad), so padding is inert
_JW_CLASS = 16            # length-class width for the vector buckets
_JW_MIN_BUCKET = 16       # below this, the scalar kernel is cheaper


def _jw_unique(ua: list, ub: list):  # pragma: no cover - executor side
    """Exact Jaro-Winkler for a list of DISTINCT (non-equal, non-null)
    string pairs, vectorized across pairs (r7, guide §4.2: batch native
    code instead of a per-pair Python loop).

    Pairs are bucketed by (⌈l1/16⌉, ⌈l2/16⌉) length classes; inside a
    bucket the strings are padded char matrices (uint32 code points,
    pad sentinels outside the Unicode range) and the greedy matching
    loop runs once per *char position* over all pairs at once — the
    first-available-slot inner scan becomes argmax over a boolean
    window mask, which preserves the scalar kernel's ascending-j greedy
    order exactly. Transpositions/prefix/final float arithmetic follow
    the scalar expression order operation for operation, so results are
    BIT-IDENTICAL to ``jaro_winkler`` (pinned by the parity test in
    tests/test_round7.py). Buckets smaller than ``_JW_MIN_BUCKET`` (and
    any string numpy cannot hold as UCS-4) fall back to the scalar
    kernel."""
    import numpy as np

    n = len(ua)
    vals = np.zeros(n, dtype=np.float64)
    l1s = np.fromiter((len(s) for s in ua), np.int64, n)
    l2s = np.fromiter((len(s) for s in ub), np.int64, n)
    # empties: equal pairs never reach here, so one side empty → 0.0
    nonempty = (l1s > 0) & (l2s > 0)
    c1 = (l1s - 1) // _JW_CLASS
    c2 = (l2s - 1) // _JW_CLASS
    order = np.lexsort((c2[nonempty], c1[nonempty]))
    members = np.flatnonzero(nonempty)[order]
    bkey = c1[members] * 1_000_003 + c2[members]
    starts = np.flatnonzero(np.r_[True, bkey[1:] != bkey[:-1]])
    bounds = np.r_[starts, len(members)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        idx = members[s:e]
        if len(idx) < _JW_MIN_BUCKET:
            for i in idx:
                vals[i] = jaro_winkler(ua[i], ub[i])
            continue
        l1, l2 = l1s[idx], l2s[idx]
        L1, L2 = int(l1.max()), int(l2.max())
        try:
            S1 = np.array([ua[i] for i in idx], dtype=f"<U{L1}").view(
                np.uint32
            ).reshape(len(idx), L1).astype(np.int64)
            S2 = np.array([ub[i] for i in idx], dtype=f"<U{L2}").view(
                np.uint32
            ).reshape(len(idx), L2).astype(np.int64)
        except (UnicodeEncodeError, ValueError):
            for i in idx:
                vals[i] = jaro_winkler(ua[i], ub[i])
            continue
        # numpy zero-pads short strings; remap pads to the inert sentinels
        ar1 = np.arange(L1)
        ar2 = np.arange(L2)
        S1[ar1[None, :] >= l1[:, None]] = _JW_PAD_A
        S2[ar2[None, :] >= l2[:, None]] = _JW_PAD_B
        w = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
        m1 = np.zeros(S1.shape, dtype=bool)
        m2 = np.zeros(S2.shape, dtype=bool)
        for i in range(L1):
            # scalar: j in [max(0, i-w), min(l2, i+w+1)), first unused
            # match wins — the window/limit masks below are that range,
            # argmax picks the first True (ascending j, same greedy)
            cand = (
                (S2 == S1[:, i : i + 1])
                & ~m2
                & (ar2[None, :] >= (i - w)[:, None])
                & (ar2[None, :] <= (i + w)[:, None])
            )
            found = cand.any(axis=1)
            rows = np.flatnonzero(found)
            if len(rows):
                j = cand[rows].argmax(axis=1)
                m2[rows, j] = True
                m1[rows, i] = True
        matches = m1.sum(axis=1)
        nz = matches > 0
        res = np.zeros(len(idx), dtype=np.float64)
        if nz.any():
            # matched chars in position order, row-major flat — rows with
            # zero matches contribute nothing, so segments line up with
            # the nz rows exactly
            a_seq = S1[m1]
            b_seq = S2[m2]
            mm = matches[nz]
            seg = np.zeros(len(mm), dtype=np.int64)
            np.cumsum(mm[:-1], out=seg[1:])
            t = np.add.reduceat((a_seq != b_seq).astype(np.int64), seg) // 2
            # same expression order as the scalar kernel → same doubles
            jaro = (mm / l1[nz] + mm / l2[nz] + (mm - t) / mm) / 3.0
            pw = min(4, L1, L2)
            eqp = (S1[nz, :pw] == S2[nz, :pw]) if pw else np.zeros(
                (int(nz.sum()), 0), dtype=bool
            )
            prefix = np.cumprod(eqp, axis=1).sum(axis=1)
            res[nz] = jaro + prefix * 0.1 * (1.0 - jaro)
        vals[idx] = res
    return vals


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover
    """Arrow-batched JW over two string series (nulls → 0.0).

    Batch-level structure (r7: the remaining per-pair Python loop is now
    the vectorized ``_jw_unique``):
    * vectorized equality — near-dup candidate pairs very often carry
      IDENTICAL normalized titles (same page mirrored), and s1 == s2 is
      1.0 by definition, so that majority never enters the char kernel;
    * per-batch dedup — hub pages pair against many others with the
      same (title_a, title_b) combination inside one block, so the
      kernel runs once per distinct pair and the batch scatters back.
    """
    import numpy as np

    av, bv = a.to_numpy(dtype=object), b.to_numpy(dtype=object)
    out = np.zeros(len(a), dtype=np.float64)
    valid = a.notna().to_numpy() & b.notna().to_numpy()
    eq = valid & (av == bv)
    out[eq] = 1.0
    rest = np.flatnonzero(valid & ~eq)
    if len(rest):
        keyidx: dict = {}
        ua: list = []
        ub: list = []
        back = np.empty(len(rest), dtype=np.int64)
        for pos, i in enumerate(rest):
            key = (av[i], bv[i])
            k = keyidx.get(key)
            if k is None:
                k = keyidx[key] = len(ua)
                ua.append(av[i])
                ub.append(bv[i])
            back[pos] = k
        out[rest] = _jw_unique(ua, ub)[back]
    return pd.Series(out, dtype="float64")
