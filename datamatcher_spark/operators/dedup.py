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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from datamatcher_spark.functions.minhash import (
    MERSENNE_P,
    jaccard_tokens_expr,
    lsh_band_keys_expr,
    minhash_signature_udf,
    shingle_hashes_expr,
    tokens_expr,
    word_shingles_expr,
)
from datamatcher_spark.functions.textstats import fingerprint_expr


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
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard ≥ threshold) via MinHash-LSH
    banding + exact token-Jaccard verification."""
    base = df.select(
        F.col(id_col).alias("id"),
        tokens_expr(F.col(text_col)).alias("toks"),
        shingle_hashes_expr(word_shingles_expr(F.col(text_col), shingle_words)).alias("hs"),
    ).withColumn("sig", minhash_signature_udf(k, seed)(F.col("hs")))
    # persist: the size census and BOTH sides of the self-join consume
    # this — without it the signature UDF runs 4× over the corpus
    # (verified via .explain: four ArrowEvalPython nodes collapse to one)
    banded = base.select(
        "id", "toks", F.explode(lsh_band_keys_expr(F.col("sig"), bands, rows)).alias("bk")
    ).persist()
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
    base = base.withColumn("simhash", simhash_udf(64, seed)(F.col("th"))).drop("th").persist()

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


def ngram_jaccard_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    threshold: float = 0.6,
    prefix_chars: int = 24,
) -> DataFrame:
    """Character-n-gram Jaccard near-dups with cheap prefix blocking:
    candidates share the normalized first ``prefix_chars`` chars (catches
    boilerplate-prefixed copies), verified by exact n-gram-set Jaccard."""
    norm = F.regexp_replace(F.lower(F.col(text_col).cast("string")), r"\s+", " ")
    # dynamic-start substring needs the SQL expr form
    base = df.select(
        F.col(id_col).alias("id"),
        norm.alias("__norm"),
        F.substring(norm, 1, prefix_chars).alias("bk"),
    ).withColumn(
        "grams",
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, greatest(length(__norm) - {n}, 0)), "
                f"i -> substring(__norm, i + 1, {n}))"
            )
        ),
    ).drop("__norm").persist()  # gram arrays are wide; build once
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, "bk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            jaccard_tokens_expr(F.col("a.grams"), F.col("b.grams")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .withColumn("jaccard", F.round("jaccard", 6))
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
        # projected vectors; released explicitly once the plan no longer
        # needs it is impossible for a lazy result, so rely on LRU — the
        # cached projection is (id, vec, key), no wide intermediate
        base = base.withColumn("bk", F.explode(F.array(*keys))).persist()
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
