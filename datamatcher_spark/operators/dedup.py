"""Deduplication operators for web-scale training-data pipelines.

Five families, each returning DataFrames (never driver-side loops):
  * exact        — hash-groupBy on normalized content
  * fingerprint  — key-collision dedup (token-sort fingerprint)
  * minhash-LSH  — shingle MinHash band blocking → verified Jaccard pairs
  * simhash      — 64-bit simhash, banded hamming join
  * embedding    — cosine near-dup over array<float> vectors

Exact/fingerprint are single-shuffle groupBys. The near-dup families
follow the same shape as the ER pipeline: cheap blocking key → block-
local pair generation → exact verify — every shuffle keyed, every
quadratic bounded by block size.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from datamatcher_spark.functions.minhash import (
    MERSENNE_P,
    jaccard_distinct_sets_expr,
    jaccard_tokens_expr,
    lsh_band_keys_expr,
    minhash_signature_udf,
    shingle_hashes_expr,
    tokens_expr,
    word_shingles_expr,
)
from datamatcher_spark.functions.textstats import fingerprint_expr


@contextmanager
def cache_scope():
    """Explicit persist lifecycle for the near-dup operators.

    Their intermediates (signature / gram-hash / key projections) are
    persisted because both self-join sides and the size census consume
    them and exchange reuse does not cover the pattern (verified: the
    unpersisted minhash plan carries 4 ArrowEvalPython nodes — the
    signature UDF would run 4× over the corpus). A one-shot job can rely
    on executor LRU, but a long-lived session leaks storage memory, so:

        with cache_scope() as caches:
            pairs = minhash_near_duplicates(df, ..., caches=caches)
            pairs.write.parquet(out)       # materialize INSIDE the scope

    Everything persisted by operators handed this list is unpersisted on
    exit. Materialize before the scope closes — the results are lazy.
    """
    caches: list[DataFrame] = []
    try:
        yield caches
    finally:
        for df in caches:
            df.unpersist()


def _persist(df: DataFrame, caches: list | None) -> DataFrame:
    out = df.persist()
    if caches is not None:
        caches.append(out)
    return out


def exact_duplicates(df: DataFrame, id_col: str, text_col: str,
                     normalize: bool = True) -> DataFrame:
    """Exact-duplicate groups: (dup_key, group_size, keep_id, is_duplicate
    per id). ``keep_id`` is the minimum id (deterministic survivor)."""
    content = F.col(text_col).cast("string")
    if normalize:
        content = F.regexp_replace(F.trim(F.lower(content)), r"\s+", " ")
    key = F.md5(content)
    w = Window.partitionBy("dup_key")
    return (
        df.select(F.col(id_col).alias("id"), key.alias("dup_key"))
        .withColumn("group_size", F.count("*").over(w))
        .withColumn("keep_id", F.min("id").over(w))
        .withColumn("is_duplicate", F.col("id") != F.col("keep_id"))
    )


def fingerprint_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fingerprint dedup: word-order / punctuation / case variants collide
    (token-sort + md5)."""
    w = Window.partitionBy("dup_key")
    return (
        df.select(F.col(id_col).alias("id"),
                  fingerprint_expr(F.col(text_col)).alias("dup_key"))
        .withColumn("group_size", F.count("*").over(w))
        .withColumn("keep_id", F.min("id").over(w))
        .withColumn("is_duplicate", F.col("id") != F.col("keep_id"))
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_words: int = 3,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    jaccard_threshold: float = 0.7,
    seed: int = 1337,
    max_band_size: int = 500,
    caches: list | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard ≥ threshold) via MinHash-LSH
    banding + exact token-Jaccard verification. Pass ``caches`` (see
    ``cache_scope``) to release the persisted band table explicitly."""
    # layered: toks materialized first, then shingle hashes built FROM the
    # token column — inlining the token split into the per-gram lambda
    # re-evaluates it per gram position (O(n²)/doc; see word_shingles_expr)
    base = df.select(
        F.col(id_col).alias("id"),
        tokens_expr(F.col(text_col)).alias("toks"),
    ).withColumn(
        "hs",
        shingle_hashes_expr(
            word_shingles_expr(None, shingle_words, tokens=F.col("toks"))
        ),
    ).withColumn("sig", minhash_signature_udf(k, seed)(F.col("hs")))
    # persist: the size census and BOTH sides of the self-join consume
    # this — without it the signature UDF runs 4× over the corpus
    # (verified via .explain: four ArrowEvalPython nodes collapse to one)
    banded = _persist(
        base.select(
            "id", "toks",
            F.explode(lsh_band_keys_expr(F.col("sig"), bands, rows)).alias("bk"),
        ),
        caches,
    )
    # bound band blocks (identical boilerplate pages can make one band huge)
    sizes = banded.groupBy("bk").count().filter(F.col("count") > max_band_size)
    banded = banded.join(F.broadcast(sizes.select("bk")), "bk", "left_anti")

    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, "bk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.toks").alias("toks_a"), F.col("b.toks").alias("toks_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("jaccard", jaccard_tokens_expr(F.col("toks_a"), F.col("toks_b")))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return pairs


def simhash_udf(bits: int = 64, seed: int = 7):
    """token-hash array<long> → simhash long (numpy bit-vote per batch)."""

    @F.pandas_udf(LongType())
    def _sim(hs: pd.Series) -> pd.Series:  # pragma: no cover - executor side
        shifts = np.arange(bits, dtype=np.uint64)

        def one(h):
            if h is None or len(h) == 0:
                return 0
            hv = np.asarray(h, dtype=np.int64).astype(np.uint64)
            # per-token 64-bit mix (splitmix64 finalizer)
            x = hv + np.uint64(0x9E3779B97F4A7C15 + seed)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
            votes = ((x[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
            sim = ((votes * 2 > len(hv)) .astype(np.uint64) << shifts).sum()
            return int(np.int64(sim))

        return hs.map(one)

    return _sim


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    n_chunks: int | None = None,
    seed: int = 7,
    max_block_size: int | None = None,
    caches: list | None = None,
) -> DataFrame:
    """SimHash near-dup pairs with EXACT recall for the advertised
    threshold: 64-bit simhash over token hashes, blocked with the
    chunk-combination scheme of Manku/Jain/Das Sarma (WWW'07 near-dup
    detection). Split the fingerprint into ``n_chunks`` disjoint chunks;
    if hamming(a, b) ≤ h then ≥ (n_chunks − h) chunks are identical
    (pigeonhole), so every combination of (n_chunks − h) chunks is a
    blocking key — pairs within the threshold ALWAYS share ≥ 1 key
    (round-1 single-chunk blocking only guaranteed h ≤ n_chunks − 1 and
    silently under-reported above it). Default n_chunks = h + 2 →
    C(h+2, 2) keys/doc of 2·(64/(h+2)) bits: h=3 → 10 keys of ~25 bits,
    the key space stays fine-grained enough that bucket sizes are content-
    bounded at web scale. ``max_block_size`` optionally truncates
    degenerate buckets (boilerplate fingerprints) at the cost of the
    exactness guarantee inside those buckets — truncation is the caller's
    explicit, logged choice as in the minhash path."""
    from itertools import combinations

    if n_chunks is None:
        n_chunks = max_hamming + 2
    if n_chunks <= max_hamming:
        raise ValueError("n_chunks must exceed max_hamming (pigeonhole)")
    token_hashes = F.transform(
        tokens_expr(F.col(text_col)), lambda t: F.pmod(F.xxhash64(t), F.lit(MERSENNE_P))
    )
    base = df.select(F.col(id_col).alias("id"), token_hashes.alias("th"))
    # persist: both self-join sides reuse the simhash UDF output
    base = _persist(
        base.withColumn("simhash", simhash_udf(64, seed)(F.col("th"))).drop("th"),
        caches,
    )

    # chunk j covers bits [off_j, off_j + width_j): 64 bits spread as
    # evenly as possible over n_chunks
    widths = [64 // n_chunks + (1 if j < 64 % n_chunks else 0) for j in range(n_chunks)]
    offsets = [sum(widths[:j]) for j in range(n_chunks)]

    def chunk_str(j: int) -> Column:
        return (
            F.shiftrightunsigned(F.col("simhash"), offsets[j])
            .bitwiseAND(F.lit((1 << widths[j]) - 1))
            .cast("string")
        )

    need = n_chunks - max_hamming
    keys = F.array(
        *[
            F.concat_ws("|", F.lit(f"m{ci}"), *[chunk_str(j) for j in combo])
            for ci, combo in enumerate(combinations(range(n_chunks), need))
        ]
    )
    banded = base.withColumn("bk", F.explode(keys))
    if max_block_size:
        oversized = banded.groupBy("bk").count().filter(F.col("count") > max_block_size)
        banded = banded.join(F.broadcast(oversized.select("bk")), "bk", "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, "bk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# jaccard_distinct_sets_expr moved to functions.minhash (r4) so the ER
# score stage can share it; imported at the top, still exported from here


def _prefix_len_expr(size_col: Column, threshold: float) -> Column:
    """All-Pairs prefix length |X| − ⌈t·|X|⌉ + 1 (the −1e-9 keeps an
    exactly-integral t·|X| from ceiling one too high in binary float,
    which would SHORTEN the prefix and break the recall guarantee)."""
    return F.greatest(
        F.lit(1),
        (size_col - F.ceil(F.lit(threshold) * size_col - F.lit(1e-9)) + 1).cast("int"),
    )


def ngram_jaccard_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    threshold: float = 0.6,
    order: str = "df",
    max_block_size: int | None = None,
    caches: list | None = None,
) -> DataFrame:
    """Character-n-gram Jaccard near-dups with prefix-filter blocking —
    EXACT recall at ``threshold`` (All-Pairs / Bayardo-Ma-Srikant WWW'07,
    the PPJoin family). Fix for the r2 prefix-24-chars blocker, which
    silently missed pairs whose edits fell in the first 24 chars.

    Order every doc's gram set by a global total order and emit the first
    |X| − ⌈t·|X|⌉ + 1 grams as blocking keys. Pigeonhole: if
    J(A,B) ≥ t then |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and the smallest common
    element (in the global order) must sit inside BOTH prefixes — else one
    set's suffix (⌈t·|X|⌉ − 1 elements) would have to hold the whole
    intersection. So every qualifying pair shares ≥ 1 key, with candidates
    verified by exact gram-set Jaccard: exact precision AND exact recall.

    Candidates are generated SLIM (id, gram-hash, position only — the
    gram arrays join back for the verify; pairs carry ids, as in the ER
    score stage), then pruned by the size filter (t·|A| ≤ |B| ≤ |A|/t)
    and the PPJoin positional filter (Xiao-Wang-Lin-Yu WWW'08) — both
    provable, so recall stays exact. ``order='df'`` (default, what
    All-Pairs prescribes) ranks grams by ascending document frequency so
    prefixes hold the RAREST grams, at the cost of a gram-count pass;
    ``order='hash'`` uses xxhash64 as the total order — zero extra
    passes, same exactness, more candidates (measured 5k docs @ t=0.85:
    26.5 s vs 18.6 s end-to-end).

    Operating regime: thresholds ≥ ~0.8, where prefixes are short and
    selective. At low thresholds on dense same-vocabulary corpora there
    is nothing to prune — measured at t=0.6 on the 5k-doc test corpus,
    56% of ALL pairs are genuine prefix candidates, so the exact join
    degenerates to the quadratic truth it must reproduce. Low-threshold
    recall work belongs to ``minhash_near_duplicates``.
    ``max_block_size`` truncates degenerate buckets at the cost of the
    guarantee inside them — the caller's explicit, logged choice, as in
    the minhash path."""
    norm = F.regexp_replace(F.lower(F.col(text_col).cast("string")), r"\s+", " ")
    # grams live ONLY as sorted distinct 64-bit hashes: the verify then
    # intersects long arrays, not 5-char strings — same Jaccard values
    # (collision odds across a corpus vocabulary are ~|V|²/2⁶⁵), ~10×
    # cheaper per pair, and the same trick the ER score stage uses for
    # its token sets (plans/blocking.py features()). dynamic-start
    # substring needs the SQL expr form.
    base = df.select(
        F.col(id_col).alias("id"),
        norm.alias("__norm"),
    ).withColumn(
        "gh",
        F.sort_array(
            F.array_distinct(
                F.transform(
                    F.expr(
                        f"transform(sequence(0, greatest(length(__norm) - {n}, 0)), "
                        f"i -> substring(__norm, i + 1, {n}))"
                    ),
                    lambda g: F.xxhash64(g),
                )
            )
        ),
    ).drop("__norm")
    base = _persist(base, caches)  # gram-hash arrays are wide; build once

    if order == "df":
        exploded = base.select("id", F.explode("gh").alias("g"))
        dfreq = exploded.groupBy("g").agg(F.count("*").alias("dfreq"))
        # dfreq is one row per distinct gram (16 B each) — broadcast it so
        # the rank join is map-side; only the per-doc regroup shuffles.
        # At vocabulary sizes beyond broadcast range, drop the hint and
        # this degrades to a sort-merge join, still linear.
        ranked = (
            exploded.join(F.broadcast(dfreq), "g")
            .groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("dfreq", "g"))).alias("rg"))
        )
        banded = ranked.select(
            "id",
            F.size("rg").alias("sz"),
            F.posexplode(
                F.slice(F.col("rg"), F.lit(1), _prefix_len_expr(F.size("rg"), threshold))
            ).alias("pos", "s"),
        ).select("id", "sz", "pos", F.col("s.g").alias("bk"))
        # persist: both self-join sides (and the optional size census)
        # consume this, and the df-order pipeline above it (explode →
        # dfreq join → regroup) is the expensive part of the whole
        # operator — without the persist it recomputes per consumer
        # (same lesson as the minhash band table; exchange reuse does
        # not cover the pattern). The hash branch skips this: its prefix
        # is a cheap slice of the already-persisted gram arrays.
        banded = _persist(banded, caches)
    elif order == "hash":
        # gh is already sorted by hash — the slice IS the prefix
        banded = base.select(
            "id",
            F.size("gh").alias("sz"),
            F.posexplode(
                F.slice(F.col("gh"), F.lit(1), _prefix_len_expr(F.size("gh"), threshold))
            ).alias("pos", "bk"),
        )
    else:
        raise ValueError(f"order must be 'hash' or 'df', got {order!r}")

    if max_block_size:
        oversized = banded.groupBy("bk").count().filter(F.col("count") > max_block_size)
        banded = banded.join(F.broadcast(oversized.select("bk")), "bk", "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    # PPJoin positional filter (Xiao-Wang-Lin-Yu WWW'08): the first common
    # gram of a truly-qualifying pair sits at positions (i, j) with every
    # other common gram AFTER it in both orders, so
    # |A∩B| ≤ 1 + min(|A|−i−1, |B|−j−1); require that to reach the
    # J ≥ t overlap α = ⌈t/(1+t)·(|A|+|B|)⌉. Pairs sharing only LATE
    # (common, in df order) prefix grams die here, before the distinct —
    # exact recall is untouched because the bound is checked on every
    # shared key, including the pair's first common gram.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a.sz") + F.col("b.sz"))
        - F.lit(1e-9)
    )
    ubound = 1 + F.least(
        F.col("a.sz") - F.col("a.pos") - 1, F.col("b.sz") - F.col("b.pos") - 1
    )
    pairs = (
        a.join(b, "bk")
        .filter(F.col("a.id") < F.col("b.id"))
        # size filter: J ≥ t ⟹ t·|A| ≤ |B| ≤ |A|/t (cheap, kills
        # length-mismatched pairs before the positional math)
        .filter(
            (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
            & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz"))
        )
        .filter(ubound >= alpha)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ga = base.select(F.col("id").alias("id_a"), F.col("gh").alias("gh_a"))
    gb = base.select(F.col("id").alias("id_b"), F.col("gh").alias("gh_b"))
    return (
        pairs.join(ga, "id_a")
        .join(gb, "id_b")
        # cheap size prune before the intersect: J ≥ t ⟹ t·|A| ≤ |B|
        .filter(
            (F.size("gh_b") >= F.lit(threshold) * F.size("gh_a"))
            & (F.size("gh_a") >= F.lit(threshold) * F.size("gh_b"))
        )
        .withColumn(
            "jaccard", jaccard_distinct_sets_expr(F.col("gh_a"), F.col("gh_b"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def cosine_sim_expr(a: Column, b: Column) -> Column:
    """Exact cosine similarity of two array<float/double> columns, fully
    JVM-side via zip_with + aggregate."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def _hyperplane_key_expr(vec: Column, planes: "np.ndarray", tag: str) -> Column:
    """One LSH table key: sign bits of <v, plane_i> concatenated."""
    bits = [
        (F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) >= 0).cast("int").cast("string")
        for plane in planes
    ]
    return F.concat(F.lit(f"{tag}:"), *bits)


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 11,
    dims: int | None = None,
    caches: list | None = None,
) -> DataFrame:
    """Embedding-cosine near-dups via random-hyperplane LSH (Charikar,
    STOC'02 SimHash for cosine) with an OR-construction: ``n_tables``
    independent tables of ``n_planes`` sign bits each; a pair at angle θ
    collides in ≥1 table with p = 1 − (1 − (1 − θ/π)^planes)^tables
    (≈0.99 for cosine ≥ 0.95 at 8×8). Candidates are verified with exact
    JVM-side cosine, so precision is exact and only recall is
    probabilistic. Buckets bound the quadratic: the self-join touches
    O(Σ bucket²), never O(n²). Set n_planes=0 for the single-bucket exact
    mode (oracle-checkable on small inputs only)."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    if n_planes > 0:
        if dims is None:
            first = base.select(F.size("v").alias("d")).first()
            if first is None:  # empty input → empty, correctly-typed pairs
                id_type = base.schema["id"].dataType.simpleString()
                return df.sparkSession.createDataFrame(
                    [], f"id_a {id_type}, id_b {id_type}, cosine double"
                )
            dims = int(first.d)
        rng = np.random.RandomState(seed)
        keys = [
            _hyperplane_key_expr(
                F.col("v"), rng.standard_normal((n_planes, dims)), f"t{t}"
            )
            for t in range(n_tables)
        ]
        # persist: both self-join sides and every table key reuse the
        # projected vectors — the cached projection is (id, vec, key), no
        # wide intermediate; release via the caches list / cache_scope
        base = _persist(base.withColumn("bk", F.explode(F.array(*keys))), caches)
    else:
        base = base.withColumn("bk", F.lit("all"))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, "bk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a", "id_b",
            F.round(cosine_sim_expr(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
