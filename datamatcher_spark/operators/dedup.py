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
    max_hamming: int = 6,
    seed: int = 7,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit simhash over token hashes, blocked by
    the four 16-bit chunks (pigeonhole: hamming ≤ 6 with 4 chunks → at
    least one chunk may still differ; 4 chunks guarantee recall for
    hamming ≤ 3, probabilistic above), verified with exact bit_count."""
    token_hashes = F.transform(
        tokens_expr(F.col(text_col)), lambda t: F.pmod(F.xxhash64(t), F.lit(MERSENNE_P))
    )
    base = df.select(F.col(id_col).alias("id"), token_hashes.alias("th"))
    # persist: both self-join sides reuse the simhash UDF output
    base = base.withColumn("simhash", simhash_udf(64, seed)(F.col("th"))).drop("th").persist()
    chunks = F.array(
        *[
            F.concat(F.lit(f"c{j}:"),
                     F.shiftrightunsigned(F.col("simhash"), j * 16)
                     .bitwiseAND(F.lit(0xFFFF)).cast("string"))
            for j in range(4)
        ]
    )
    banded = base.withColumn("bk", F.explode(chunks))
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


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    dims: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dups: random-hyperplane LSH bucket (one
    sign-bit key per plane group) → exact cosine verify within buckets.
    For guaranteed-exact small inputs set n_planes=0 (single bucket)."""
    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    if n_planes > 0:
        if dims is None:
            dims = len(base.select("v").first().v)
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((n_planes, dims))
        bits = [
            (F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in planes[p]]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ) >= 0).cast("int").cast("string")
            for p in range(n_planes)
        ]
        base = base.withColumn("bk", F.concat(*bits)).persist()
    else:
        base = base.withColumn("bk", F.lit("all"))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, "bk")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.round(cosine_sim_expr(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
