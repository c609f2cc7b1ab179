"""Pure-Python twins of the JVM hash expressions, for driver-side
oracles.

``xxh64`` implements the public XXH64 algorithm (Yann Collet's xxHash,
specification at github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md)
with Spark's conventions: seed 42, UTF-8 input bytes, SIGNED 64-bit
result — so ``xxh64(s)`` equals ``F.xxhash64(lit(s))`` bit for bit
(pinned by tests/test_textstats.py::test_pyxxhash_matches_spark).

``simhash_py`` recomputes ``operators.dedup.simhash_udf`` in pure
Python/numpy from the raw text, and ``expected_simhash_pairs`` produces
the full O(n²) hamming-≤-h truth — the import-side of the
``dedup_simhash`` VALUES oracle (same pattern as the multimodal entry:
shared input, independent compute path).
"""

from __future__ import annotations

import re

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

MERSENNE_P = 2_147_483_647


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * _P1 + _P4) & _M


def xxh64(data: bytes | str, seed: int = 42) -> int:
    """XXH64 of ``data`` → SIGNED int64, Spark ``xxhash64`` semantics."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (h ^ (int.from_bytes(data[i:i + 4], "little") * _P1) & _M) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (h ^ (data[i] * _P5) & _M) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def tokens_py(text: str | None) -> list[str]:
    """``functions.minhash.tokens_expr`` twin: lowercase, split on runs
    of whitespace, drop empty tokens."""
    if text is None:
        return []
    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


def simhash_py(text: str | None, bits: int = 64, seed: int = 7,
               _cache: dict | None = None) -> int:
    """``operators.dedup.simhash_udf`` twin over raw text: token hash =
    pmod(xxh64(token), MERSENNE_P), then splitmix64 per-token mix and
    majority bit vote. ``_cache`` memoizes token→hash across documents
    (vocabularies are tiny relative to token streams)."""
    toks = tokens_py(text)
    if not toks:
        return 0
    if _cache is None:
        _cache = {}
    hv_list = []
    for t in toks:
        h = _cache.get(t)
        if h is None:
            h = xxh64(t) % MERSENNE_P
            _cache[t] = h
        hv_list.append(h)
    hv = np.asarray(hv_list, dtype=np.int64).astype(np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    x = hv + np.uint64(0x9E3779B97F4A7C15 + seed)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    votes = ((x[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
    sim = ((votes * 2 > len(hv)).astype(np.uint64) << shifts).sum()
    return int(np.int64(sim))


_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


def expected_simhash_pairs(
    ids: list[int], texts: list[str | None], *, max_hamming: int = 3,
    seed: int = 7,
) -> list[tuple[int, int, int]]:
    """Full O(n²) truth: every (id_a, id_b, hamming) with id_a < id_b and
    hamming(simhash_a, simhash_b) ≤ max_hamming. Vectorized XOR +
    byte-table popcount (numpy < 2 has no bitwise_count)."""
    cache: dict = {}
    sims = np.array(
        [simhash_py(t, seed=seed, _cache=cache) for t in texts], dtype=np.int64
    ).astype(np.uint64)
    n = len(sims)
    order = np.argsort(np.asarray(ids))
    sims = sims[order]
    sids = np.asarray(ids)[order]
    out: list[tuple[int, int, int]] = []
    for i in range(n - 1):
        x = sims[i] ^ sims[i + 1:]
        ham = _POPCNT8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
        hits = np.nonzero(ham <= max_hamming)[0]
        for j in hits:
            out.append((int(sids[i]), int(sids[i + 1 + j]), int(ham[j])))
    return out
