"""Dedup family on constructed corpora with known duplicate structure,
plus the real documents testdata table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datamatcher_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    fingerprint_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_duplicates,
    simhash_near_duplicates,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog and runs far away today"),
    (2, "The quick brown fox jumps over the lazy dog and runs far away today"),  # exact dup of 1
    (3, "the  QUICK brown fox Jumps over the lazy dog and runs far away, today"),  # fmt variant
    (4, "The quick brown fox jumps over the lazy dog and runs away today"),  # near dup (drop 'far')
    (5, "Spark executes declarative dataframe plans with whole stage codegen runtime"),
    (6, "Totally unrelated content about cooking pasta with tomato sauce basil"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_duplicates(docs):
    out = {r.id: r for r in exact_duplicates(docs, "doc_id", "text").collect()}
    assert out[2].is_duplicate and out[2].keep_id == 1
    assert not out[1].is_duplicate
    assert out[1].group_size == 2
    assert not out[3].is_duplicate  # punctuation differs → not exact


def test_fingerprint_duplicates(docs):
    out = {r.id: r for r in fingerprint_duplicates(docs, "doc_id", "text").collect()}
    # 1, 2 AND 3 collide (case/punct/word-order insensitive)
    assert out[3].is_duplicate and out[3].keep_id == 1
    assert not out[4].is_duplicate  # token actually removed → distinct


def test_minhash_near_duplicates(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", shingle_words=2, jaccard_threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 4) in pairs  # near dup recovered
    assert not any(5 in p or 6 in p for p in pairs)


def test_simhash_near_duplicates(docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_duplicates(docs, "doc_id", "text", max_hamming=8).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (1, 4) in pairs
    assert all(5 not in k and 6 not in k for k in pairs)


def test_ngram_jaccard_duplicates(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_duplicates(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (1, 2) in pairs and (1, 4) in pairs
    assert not any(6 in p for p in pairs)


def test_cache_scope_releases_persisted_rdds(spark):
    """The near-dup operators persist intermediates (UDF outputs feed
    both self-join sides); cache_scope must release every one of them —
    a long-lived session must not leak storage memory."""
    from datamatcher_spark.operators.dedup import cache_scope

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)

    def persisted_ids() -> set:
        # id-based census: earlier tests' localCheckpoint RDDs are
        # cleaned ASYNCHRONOUSLY by the ContextCleaner, so a raw size
        # comparison races; set difference only sees OUR additions
        it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = persisted_ids()
    with cache_scope() as cs:
        minhash_near_duplicates(docs, "doc_id", "text", caches=cs).count()
        simhash_near_duplicates(docs, "doc_id", "text", caches=cs).count()
        ngram_jaccard_duplicates(
            docs, "doc_id", "text", threshold=0.85, caches=cs
        ).count()
        # minhash bands + minhash token-hash sets (r7 slim-join verify) +
        # simhash base + ngram gram arrays + ngram's dfreq census + the
        # dense-path rank/bitset table (r7 — both self-join sides and
        # both verify sides consume them)
        assert len(cs) == 6
        assert len(persisted_ids() - before) == 6
    assert len(persisted_ids() - before) == 0


def _brute_ngram_pairs(texts: dict, n: int, threshold: float) -> dict:
    """O(n²) exact char-n-gram Jaccard in plain Python."""
    import itertools
    import re

    def grams(t):
        s = re.sub(r"\s+", " ", t.lower())
        return {s[i:i + n] for i in range(max(len(s) - n, 0) + 1)}

    g = {i: grams(t) for i, t in texts.items()}
    out = {}
    for a, b in itertools.combinations(sorted(g), 2):
        u = len(g[a] | g[b])
        j = len(g[a] & g[b]) / u if u else 0.0
        if j >= threshold:
            out[(a, b)] = round(j, 6)
    return out


@pytest.mark.parametrize("order", ["hash", "df"])
def test_ngram_jaccard_exact_recall_head_edits(spark, order):
    """The r2 prefix-24 blocker missed near-dups edited in the first 24
    chars; the All-Pairs prefix filter must find them ALL — recall 1.0 vs
    a brute-force O(n²) oracle on a corpus of head-edited copies."""
    base = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(60).collect()
    }
    texts = dict(base)
    for i, (doc_id, t) in enumerate(sorted(base.items())):
        if i % 3 == 0 and len(t) > 30:
            # head edit: mutate INSIDE the first 24 chars, keep the tail
            texts[doc_id + 1_000_000] = "ZQX" + t[3:]
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_duplicates(
            df, "doc_id", "text", n=5, threshold=0.6, order=order
        ).collect()
    }
    expect = _brute_ngram_pairs(texts, 5, 0.6)
    planted = {k for k in expect if k[1] >= 1_000_000}
    assert planted, "corpus must actually contain head-edited near-dups"
    assert set(got) == set(expect)          # recall AND precision = 1.0
    for k, j in expect.items():
        assert abs(got[k] - j) < 1e-6


def test_embedding_near_duplicates(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    # exact mode (single bucket)
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.99, n_planes=0
        ).collect()
    }
    assert pairs == {(1, 2)}
    # LSH mode still finds the planted pair
    pairs_lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.99, n_planes=6, dims=4
        ).collect()
    }
    assert (1, 2) in pairs_lsh


def test_on_real_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = exact_duplicates(docs, "doc_id", "text")
    assert out.count() == docs.count()
    nd = minhash_near_duplicates(docs, "doc_id", "text", jaccard_threshold=0.8)
    # symmetric, canonical, self-free
    assert nd.filter("id_a >= id_b").count() == 0


def test_embedding_lsh_recall_on_planted(spark):
    """Planted-pair recall gate for the scale path (multi-table hyperplane
    LSH): the LSH plan must recover every pair the exact single-bucket
    plan finds on the real embeddings table + deterministic perturbed
    copies (the catalog's embedding_near_dup_lsh shape)."""
    from datamatcher_spark.queries_catalog import _planted_embeddings

    corpus = _planted_embeddings(spark, "/root/testdata/sf0.001")
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(
            corpus, "vec_id", "v", threshold=0.95, n_planes=0
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(
            corpus, "vec_id", "v", threshold=0.95, n_planes=8, n_tables=8
        ).collect()
    }
    assert exact, "fixture must plant at least one near-dup pair"
    assert lsh <= exact          # precision exact (verified cosine)
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.95        # 8x8 OR-construction, seeded


def test_embedding_near_duplicates_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = embedding_near_duplicates(df, "vec_id", "embedding", n_planes=8)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "cosine"]


def test_simhash_exact_recall_guarantee(spark):
    """Pigeonhole exactness: every pair within max_hamming must be found,
    verified against a brute-force O(n^2) hamming computation."""
    import itertools

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3).collect()
    }
    # brute force over the same seeded simhash values
    from datamatcher_spark.operators.dedup import simhash_udf
    from datamatcher_spark.functions.minhash import MERSENNE_P, tokens_expr
    from pyspark.sql import functions as F

    th = F.transform(tokens_expr(F.col("text")),
                     lambda t: F.pmod(F.xxhash64(t), F.lit(MERSENNE_P)))
    sims = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", simhash_udf(64, 7)(th).alias("sh")).collect()
    }
    expect = {}
    for a, b in itertools.combinations(sorted(sims), 2):
        h = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
        if h <= 3:
            expect[(a, b)] = h
    assert got == expect
