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


def xxh64_chain(data: bytes | str, tail_int: int, seed: int = 42) -> int:
    """Twin of Spark's two-column ``F.xxhash64(str_col, int_lit)``: Spark's
    multi-column hash chains the running hash as the seed, and an
    IntegerType lane is hashed as its 4 little-endian bytes — so the
    result is ``xxh64(int32_le, seed=xxh64(data, seed))``. Pinned bit-equal
    to Spark by tests/test_pyhash_changelog.py."""
    h = xxh64(data, seed)
    return xxh64((tail_int & 0xFFFFFFFF).to_bytes(4, "little"), seed=h & _M)


def round_half_up(x: float, digits: int = 6) -> float:
    """Twin of Spark's ``F.round(col, d)`` on doubles: Java
    ``BigDecimal.valueOf(x)`` (shortest decimal repr, same as Python
    ``repr``) → ``setScale(d, HALF_UP)`` → back to double. Python's
    built-in ``round`` is banker's rounding — diverges on exact .5s."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP
        )
    )


def tokens_py(text: str | None) -> list[str]:
    """``functions.minhash.tokens_expr`` twin: lowercase, split on runs
    of whitespace, drop empty tokens. ``re.ASCII`` pins Python's ``\\s``
    (Unicode: NBSP, U+0085, …) to Java's ASCII-only ``\\s`` so the twin
    tokenizes non-ASCII whitespace exactly like the Spark expression."""
    if text is None:
        return []
    return [t for t in re.split(r"\s+", text.lower(), flags=re.ASCII) if t != ""]


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


def word_shingles_py(toks: list[str], n: int = 3) -> list[str]:
    """``functions.minhash.word_shingles_expr`` twin: word n-grams; docs
    of ≤ n words yield the single whole-text shingle."""
    if len(toks) <= n:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def shingle_hashes_py(shingles: list[str], _cache: dict | None = None) -> list[int]:
    """``shingle_hashes_expr`` twin: first-occurrence-distinct shingles →
    pmod(xxh64, MERSENNE_P). Python ``%`` on a negative int is already
    non-negative — identical to Spark's pmod."""
    if _cache is None:
        _cache = {}
    seen: set[str] = set()
    out: list[int] = []
    for s in shingles:
        if s in seen:
            continue
        seen.add(s)
        h = _cache.get(s)
        if h is None:
            h = xxh64(s) % MERSENNE_P
            _cache[s] = h
        out.append(h)
    return out


def minhash_signature_py(hashes: list[int], k: int = 64, seed: int = 1337) -> list[int]:
    """``minhash_signature_udf`` twin: same seeded universal-hash
    coefficients (shared ``_coeffs``), same int64 numpy arithmetic, same
    MERSENNE_P−1 empty sentinel."""
    from datamatcher_spark.functions.minhash import _coeffs

    a, b = _coeffs(k, seed)
    if not hashes:
        return [MERSENNE_P - 1] * k
    hv = np.asarray(hashes, dtype=np.int64)[None, :]
    av = np.asarray(a, dtype=np.int64)[:, None]
    bv = np.asarray(b, dtype=np.int64)[:, None]
    return ((av * hv + bv) % MERSENNE_P).min(axis=1).tolist()


def lsh_band_keys_py(sig: list[int], bands: int = 16, rows: int = 4) -> list[str]:
    """``lsh_band_keys_expr`` twin: band slice → comma-joined Long.toString
    values → chained xxhash64(band_str, band_index) → 'lsh:<j>:<hash>'."""
    return [
        f"lsh:{j}:" + str(
            xxh64_chain(",".join(str(v) for v in sig[j * rows:(j + 1) * rows]), j)
        )
        for j in range(bands)
    ]


def expected_minhash_pairs(
    ids: list[int],
    texts: list[str | None],
    *,
    shingle_words: int = 3,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    jaccard_threshold: float = 0.6,
    seed: int = 1337,
    max_band_size: int = 500,
) -> list[tuple[int, int, float]]:
    """Full pure-Python recompute of ``operators.dedup
    .minhash_near_duplicates`` — same seeded signatures, same band keys,
    the IDENTICAL band-size truncation, then exact distinct-token-set
    Jaccard on the candidates. The operator's output is truncation- and
    banding-defined, so the oracle replays the exact banding rather than
    an unblocked truth (contrast: the simhash/ngram oracles, whose
    operators guarantee exact recall)."""
    shingle_cache: dict = {}
    buckets: dict[str, list[int]] = {}
    tok_sets: dict[int, set[str]] = {}
    for did, text in zip(ids, texts):
        toks = tokens_py(text)
        hs = shingle_hashes_py(word_shingles_py(toks, shingle_words), shingle_cache)
        sig = minhash_signature_py(hs, k, seed)
        tok_sets[did] = set(toks)
        for bk in lsh_band_keys_py(sig, bands, rows):
            buckets.setdefault(bk, []).append(did)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) > max_band_size:
            continue  # band cap — the left-anti truncation's twin
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))
    out: list[tuple[int, int, float]] = []
    for id_a, id_b in sorted(cand):
        sa, sb = tok_sets[id_a], tok_sets[id_b]
        union = len(sa | sb)
        j = 1.0 if union == 0 else len(sa & sb) / union
        if j >= jaccard_threshold:
            out.append((id_a, id_b, round_half_up(j, 6)))
    return out


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
