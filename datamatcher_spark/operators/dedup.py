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


# Persists made WITHOUT a cache_scope (the declared-query surface returns
# lazy DataFrames, so there is no scope that can outlive materialization).
# Spark's ContextCleaner never reclaims Dataset-level caches — the
# CacheManager holds strong refs until unpersist — so in a long session
# each dedup query would leak its intermediates into storage memory for
# the rest of the session (measured: 174 MB after the three headline
# dedup queries at sf1.0, growing linearly with corpus size). Every
# public near-dup operator therefore releases the PREVIOUS orphans at
# entry: a query's own caches live until the next operator call, never
# longer. Trade-off, accepted: re-invoking the same query rebuilds its
# caches from scratch (honest re-measurement; no cross-run reuse).
_ORPHANS: list[DataFrame] = []


def release_orphaned_caches() -> int:
    """Unpersist intermediates left by scope-less operator calls.
    Returns how many were released. Safe at any time: unpersist only
    drops cached blocks — plans referencing them stay correct."""
    n = len(_ORPHANS)
    for df in _ORPHANS:
        try:
            df.unpersist()
        except Exception:
            pass  # session may be gone; nothing to release
    _ORPHANS.clear()
    return n


def _persist(df: DataFrame, caches: list | None) -> DataFrame:
    out = df.persist()
    (_ORPHANS if caches is None else caches).append(out)
    return out


def _spread(df: DataFrame) -> DataFrame:
    """Decouple compute parallelism from the input's file layout.

    The corpus tables ship as single-row-group parquet (measured: the
    sf0.1 documents/orders/lineitem files each hold ONE row group), and
    parquet row groups are the unit of scan parallelism — Spark plans
    byte-range splits, but every split that doesn't contain the row
    group's start reads zero rows, so the whole scan lands on ONE task
    no matter what maxPartitionBytes/openCostInBytes say. Every
    expression fused into that scan stage (shingling, gram hashing,
    fingerprints, signature UDFs) then runs on one core of the cluster.
    A round-robin repartition to the session's default parallelism
    moves only the scan's narrow projection (id + text, ~KB/row) and
    unbinds everything downstream (guide §2.1/§6: partitioning must be
    scale-adaptive, never inherited from an accident of file layout).
    Results are partition-invariant: every consumer below is either a
    deterministic per-row expression, an aggregate, or a window with an
    explicit total order.

    ADAPTIVE: when the plan's input files already carry enough row
    groups to feed half the cores, the scan parallelizes by itself and
    the repartition would be a pure exchange tax — skip it. The check
    reads only parquet footers (driver-side metadata, ~ms per file, the
    same class of planning I/O Spark's own file index does); any
    surprise (non-local URI, non-parquet, missing footer) falls back to
    repartitioning, the safe direction for compute-dense consumers."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        files = df.inputFiles()
        if files:
            import pyarrow.parquet as pq

            n_rg = 0
            for uri in files:
                path = uri[7:] if uri.startswith("file:///") else uri
                n_rg += pq.ParquetFile(path).metadata.num_row_groups
                if n_rg >= max(2, par // 2):
                    return df  # layout already feeds the cores
    except Exception:
        pass
    return df.repartition(par)


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
        _spread(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select(F.col("id"), key.alias("dup_key"))
        .withColumn("group_size", F.count("*").over(w))
        .withColumn("keep_id", F.min("id").over(w))
        .withColumn("is_duplicate", F.col("id") != F.col("keep_id"))
    )


def fingerprint_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fingerprint dedup: word-order / punctuation / case variants collide
    (token-sort + md5)."""
    w = Window.partitionBy("dup_key")
    return (
        _spread(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select("id", fingerprint_expr(F.col(text_col)).alias("dup_key"))
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
    broadcast_verify_rows: int = 250_000,
    caches: list | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard ≥ threshold) via MinHash-LSH
    banding + exact token-Jaccard verification. Pass ``caches`` (see
    ``cache_scope``) to release the persisted band table explicitly.

    r7 shape (guide §2.3 / §8 — shuffle keys, not payloads): the band
    table is SLIM (id, band key), so the self-join exchanges ~30 B/row
    instead of carrying every doc's full token array once per band (the
    r6 shape shuffled each token array 16×, then moved two token arrays
    per surviving pair through the dedup). Token sets join back onto the
    deduped pairs for the verify — as sorted-distinct 64-bit hashes, so
    the per-pair Jaccard intersects fixed-width longs (identical values:
    |A∩B|/|A∪B| over distinct token hashes equals the string-set form,
    collision odds ~|vocab|²/2⁶⁵ — the representation the ER score stage
    has always used). ``broadcast_verify_rows`` picks the verify-join
    strategy (broadcast below, shuffle-hash above — the scoring-stage
    cutover pattern)."""
    if caches is None:
        release_orphaned_caches()
    # one spread input feeds both the signature build and the token-set
    # verify (identical exchange → reused); see _spread on why the raw
    # scan is single-task
    df = _spread(df.select(F.col(id_col), F.col(text_col)))
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
            "id",
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
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # sorted-distinct token-hash sets, computed once per doc for the
    # verify joins (both sides + the count read this cache)
    tokh = _persist(
        df.select(
            F.col(id_col).alias("id"),
            F.array_sort(
                F.array_distinct(
                    F.transform(tokens_expr(F.col(text_col)), lambda t: F.xxhash64(t))
                )
            ).alias("th"),
        ),
        caches,
    )
    n_docs = tokh.count()
    ta = tokh.select(F.col("id").alias("id_a"), F.col("th").alias("th_a"))
    tb = tokh.select(F.col("id").alias("id_b"), F.col("th").alias("th_b"))
    if n_docs <= broadcast_verify_rows:
        ta, tb = F.broadcast(ta), F.broadcast(tb)
    else:
        ta, tb = ta.hint("shuffle_hash"), tb.hint("shuffle_hash")
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn(
            "jaccard", jaccard_distinct_sets_expr(F.col("th_a"), F.col("th_b"))
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_udf(bits: int = 64, seed: int = 7):
    """token-hash array<long> → simhash long.

    r7: vectorized across the whole Arrow batch — one splitmix64 mix of
    the concatenated token hashes, then per-bit segment sums via
    ``np.add.reduceat`` (the per-row form paid a numpy dispatch plus an
    (n_tokens × 64) materialization per document). Bit-identical votes
    and fingerprints (same mix, same majority rule; pinned against the
    pure-Python replay in functions/pyhash.py)."""

    @F.pandas_udf(LongType())
    def _sim(hs: pd.Series) -> pd.Series:  # pragma: no cover - executor side
        n = len(hs)
        vals = [None if h is None else np.asarray(h, dtype=np.int64)
                for h in hs]
        lens = np.array([0 if v is None else len(v) for v in vals])
        nonempty = lens > 0
        out = np.zeros(n, dtype=np.int64)
        if nonempty.any():
            concat = np.concatenate(
                [v for v in vals if v is not None and len(v)]
            ).astype(np.uint64)
            # per-token 64-bit mix (splitmix64 finalizer)
            x = concat + np.uint64(0x9E3779B97F4A7C15 + seed)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
            ne_lens = lens[nonempty]
            starts = np.zeros(len(ne_lens), dtype=np.int64)
            np.cumsum(ne_lens[:-1], out=starts[1:])
            sim = np.zeros(len(ne_lens), dtype=np.uint64)
            one = np.uint64(1)
            for i in range(bits):
                votes = np.add.reduceat((x >> np.uint64(i)) & one, starts)
                sim |= (votes * 2 > ne_lens).astype(np.uint64) << np.uint64(i)
            out[nonempty] = sim.view(np.int64)
        return pd.Series(out)

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

    if caches is None:
        release_orphaned_caches()
    if n_chunks is None:
        n_chunks = max_hamming + 2
    if n_chunks <= max_hamming:
        raise ValueError("n_chunks must exceed max_hamming (pigeonhole)")
    token_hashes = F.transform(
        tokens_expr(F.col(text_col)), lambda t: F.pmod(F.xxhash64(t), F.lit(MERSENNE_P))
    )
    base = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), token_hashes.alias("th")
    )
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


_SKETCH_PARTS = 32  # vocab partitions in the count sketch (rank mod 32)


def _bitset_udf(n_words: int):
    """array of set-rank indices → struct of
      * ``bs``: ⌈V/64⌉-word array<long> bitset (little-endian per word)
      * ``sk``: 8-long packed count sketch — 32 partition counts
        (|X ∩ {ranks ≡ p mod 32}|), four 16-bit lanes per long.
    One Arrow crossing; per-row work is a vectorized scatter + bincount.
    Lanes never saturate: a partition count is bounded by ⌈V/32⌉ and the
    dense path only runs for V ≤ dense_vocab_max (≤ 16,384 → ≤ 512)."""

    @F.pandas_udf("struct<bs: array<bigint>, sk: array<bigint>>")
    def _bs(rg: pd.Series) -> pd.DataFrame:  # pragma: no cover - executor side
        shifts = np.arange(4, dtype=np.uint64) * np.uint64(16)

        def one(r):
            w = np.zeros(n_words, dtype=np.uint64)
            if r is not None and len(r):
                rr = np.asarray(r, dtype=np.int64)
                np.bitwise_or.at(
                    w, rr >> 6, np.uint64(1) << (rr & 63).astype(np.uint64)
                )
                c = np.bincount(rr & (_SKETCH_PARTS - 1),
                                minlength=_SKETCH_PARTS).astype(np.uint64)
            else:
                c = np.zeros(_SKETCH_PARTS, dtype=np.uint64)
            sk = (c.reshape(-1, 4) << shifts[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            return w.view(np.int64), sk.view(np.int64)

        pairs = rg.map(one)
        return pd.DataFrame(
            {"bs": pairs.map(lambda p: p[0]), "sk": pairs.map(lambda p: p[1])}
        )

    return _bs


def _sketch_min_sum(sk_a: Column, sk_b: Column) -> Column:
    """Σ_p min(count_A[p], count_B[p]) over the 32 packed partition
    counts — an EXACT upper bound on |A∩B| (the intersection inside
    partition p has at most min of the two partition sizes), evaluated
    as flat shift/mask arithmetic so whole-stage codegen keeps the
    method small enough for the JIT (an array-lambda or a per-word
    ``element_at`` popcount here blew past HotSpot's huge-method limit
    and ran as interpreted bytecode — measured 117 s vs the join's 16 s
    floor at 185e6 rows)."""
    mask = F.lit(0xFFFF)
    terms = []
    for j in range(_SKETCH_PARTS // 4):
        la, lb = F.element_at(sk_a, j + 1), F.element_at(sk_b, j + 1)
        for lane in range(4):
            sh = 16 * lane
            terms.append(
                F.least(
                    F.shiftrightunsigned(la, sh).bitwiseAND(mask),
                    F.shiftrightunsigned(lb, sh).bitwiseAND(mask),
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _ngram_dense_df_order(
    base: DataFrame,
    dfreq: DataFrame,
    vocab_size: int,
    threshold: float,
    max_block_size: int | None,
    broadcast_verify_rows: int,
    caches: list | None,
) -> DataFrame:
    """df-order All-Pairs join specialized for SMALL vocabularies (guide
    §2.3 "shuffle keys and metadata" + §1.2 "fix the distributed
    algorithm first").

    Motivation (measured, sf1.0 = 50k docs): the corpus vocabulary is
    2,041 distinct 5-gram hashes and even the rarest gram appears in
    ~2.9k docs, so single-gram prefix buckets reach 2,820 members and the
    block self-join emits 1.84e9 raw rows. The r6 shape then paid a
    distinct over ~185e6 post-filter CANDIDATE rows (a multi-GB spilling
    exchange — each true candidate is re-found through ~30 shared prefix
    grams) plus two wide joins re-attaching ~200-element gram arrays to
    ~90e6 pairs. Driver-measured 803 s at sf1.0.

    This path changes the representation, never the math:
      * grams are mapped to DENSE RANKS 0..V−1 ordered by (dfreq, gram) —
        the identical total order the sparse df-order path sorts by, so
        prefixes, buckets, size filter and positional filter admit
        EXACTLY the same candidate set;
      * each doc's gram set additionally becomes a ⌈V/64⌉-word BITSET;
        |A∩B| is then a popcount of ANDed words (~V/64 cheap ops) instead
        of a hash-set intersect of ~|A| longs per pair;
      * the verify runs INLINE on the un-deduplicated candidate stream
        (bitsets attached map-side by a broadcast — or shuffle-hash at
        scale — hash join), and only the J ≥ t survivors reach
        dropDuplicates. The ~185e6-row exchange disappears; the dedup
        shuffles ~|output| rows.

    Jaccard values are identical to the sparse path: ranks are a
    bijection of the distinct gram hashes, so |A∩B| and |A|+|B|−|A∩B|
    are unchanged. Measured sf1.0: 803 s (r6 sparse) → see
    OPTIMIZATION_r07.md (this path)."""
    from pyspark.sql.window import Window

    exploded = base.select("id", F.explode("gh").alias("g"))
    # rank = position in the global (dfreq, g) order — the same order the
    # sparse path establishes via array_sort(struct(dfreq, g)). The rank
    # window runs on the dfreq table (V rows, V ≤ dense_vocab_max), so
    # the single-partition sort is bounded and tiny.
    rankmap = (
        dfreq.withColumn(
            "rk", F.row_number().over(Window.orderBy("dfreq", "g")) - 1
        ).select("g", "rk")
    )
    n_words = (vocab_size + 63) // 64
    # persist: rg feeds BOTH self-join sides (prefix slices) and the
    # bitset + count sketch feed both verify sides — one rank join + one
    # Arrow crossing total
    bits = _persist(
        exploded.join(F.broadcast(rankmap), "g")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("rk")).alias("rg"))
        .select(
            "id",
            F.size("rg").alias("sz"),
            "rg",
            _bitset_udf(n_words)(F.col("rg")).alias("enc"),
        )
        .select("id", "sz", "rg", F.col("enc.bs").alias("bs"),
                F.col("enc.sk").alias("sk")),
        caches,
    )
    n_docs = bits.count()  # materializes the cache; drives the join choice

    banded = bits.select(
        "id",
        "sz",
        F.posexplode(
            F.slice(F.col("rg"), F.lit(1), _prefix_len_expr(F.col("sz"), threshold))
        ).alias("pos", "rk"),
    )
    if max_block_size:
        oversized = banded.groupBy("rk").count().filter(F.col("count") > max_block_size)
        banded = banded.join(F.broadcast(oversized.select("rk")), "rk", "left_anti")

    a, b = banded.alias("a"), banded.alias("b")
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a.sz") + F.col("b.sz"))
        - F.lit(1e-9)
    )
    ubound = 1 + F.least(
        F.col("a.sz") - F.col("a.pos") - 1, F.col("b.sz") - F.col("b.pos") - 1
    )
    raw = (
        a.join(b, "rk")
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
            & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz"))
        )
        .filter(ubound >= alpha)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
    )
    ba = bits.select(F.col("id").alias("id_a"), F.col("bs").alias("bs_a"),
                     F.col("sk").alias("sk_a"))
    bb = bits.select(F.col("id").alias("id_b"), F.col("bs").alias("bs_b"),
                     F.col("sk").alias("sk_b"))
    # explicit join strategy, never the static estimate (the scoring-stage
    # lesson): broadcast the per-doc bitsets when they fit comfortably,
    # else co-partition with shuffle-hash — the 10^12-doc plan.
    if n_docs <= broadcast_verify_rows:
        ba, bb = F.broadcast(ba), F.broadcast(bb)
    else:
        ba, bb = ba.hint("shuffle_hash"), bb.hint("shuffle_hash")
    # pair-level overlap requirement α = ⌈t/(1+t)·(|A|+|B|)⌉ (J ≥ t ⟺
    # |A∩B| ≥ α): checked first against the cheap codegen'd sketch bound,
    # so the interpreted array popcount only ever runs on sketch
    # survivors (And short-circuits left-to-right)
    pair_alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("sz_a") + F.col("sz_b")) - F.lit(1e-9)
    )
    inter = F.aggregate(
        F.zip_with(F.col("bs_a"), F.col("bs_b"), lambda x, y: F.bit_count(x.bitwiseAND(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double")
    union = (F.col("sz_a") + F.col("sz_b")).cast("double") - inter
    jaccard = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
    return (
        raw.join(ba, "id_a")
        .join(bb, "id_b")
        .filter(
            (_sketch_min_sum(F.col("sk_a"), F.col("sk_b")) >= pair_alpha)
            & (jaccard >= threshold)
        )
        # candidate multiplicity (one row per shared prefix gram) is
        # collapsed AFTER the verify: survivors are ~|output| rows, so
        # this exchange is trivial where the r6 pre-verify distinct
        # shuffled every candidate. Project first — the dedup exchange
        # must carry (id, id, double), not the bitsets.
        .select("id_a", "id_b", F.round(jaccard, 6).alias("jaccard"))
        .dropDuplicates(["id_a", "id_b"])
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
    dense_vocab_max: int = 16384,
    broadcast_verify_rows: int = 250_000,
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
    the minhash path.

    r7: when the measured vocabulary is small (≤ ``dense_vocab_max``
    distinct grams — the df-order pass counts it for free), the df-order
    branch switches to ``_ngram_dense_df_order``: identical candidate
    set and identical Jaccard values, but grams become dense ranks, the
    verify intersects ⌈V/64⌉-word bitsets instead of gram-hash arrays,
    and the pair dedup moves AFTER the verify so the candidate stream is
    never exchanged (the r6 shape's dominant cost at sf1.0 — see the
    helper's docstring for the measured numbers). ``broadcast_verify_rows``
    is the verify-join strategy cutover (broadcast vs shuffle-hash), the
    same pattern as the ER score stage's feature join."""
    if caches is None:
        release_orphaned_caches()
    norm = F.regexp_replace(F.lower(F.col(text_col).cast("string")), r"\s+", " ")
    # grams live ONLY as sorted distinct 64-bit hashes: the verify then
    # intersects long arrays, not 5-char strings — same Jaccard values
    # (collision odds across a corpus vocabulary are ~|V|²/2⁶⁵), ~10×
    # cheaper per pair, and the same trick the ER score stage uses for
    # its token sets (plans/blocking.py features()). dynamic-start
    # substring needs the SQL expr form.
    base = _spread(df.select(F.col(id_col), F.col(text_col))).select(
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
        # persist: the vocabulary census below and the rank/dfreq join
        # both consume this one-row-per-distinct-gram table (tiny)
        dfreq = _persist(
            exploded.groupBy("g").agg(F.count("*").alias("dfreq")), caches
        )
        vocab_size = dfreq.count()
        if vocab_size <= dense_vocab_max:
            return _ngram_dense_df_order(
                base, dfreq, vocab_size, threshold, max_block_size,
                broadcast_verify_rows, caches,
            )
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
    if caches is None:
        release_orphaned_caches()
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
