"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1-2).

Generates the pipeline's input table
``pages(url, warc_ts, html, text, lang)`` plus ground truth:
``truth(url, cluster_id)`` and ``labeled_pairs(url_a, url_b, label,
block_key)``.

Planted structure: rows come in clusters of size 1-6 sharing a canonical
document, mutated by case changes, punctuation swaps, token drops /
reorders, small typos in title and url slug, and www./trailing-slash/query
url variants — exactly the variation axes the reference handles via
``normalize_for_fuzzy`` + Levenshtein (utils/fuzzy_matcher.py) and that our
Jaro-Winkler + Jaccard scoring must absorb. Domains are Zipf-distributed so
head domains create real blocking skew; a small fraction of clusters spans
two domains so only the MinHash-LSH band keys (not domain blocking) can
recover them.

Generation is *distributed and partition-invariant*: one `mapInPandas`
over `spark.range(n_clusters)` with a per-cluster-seeded RNG, so the same
(seed, n_docs) yields byte-identical rows at any parallelism — this is
what lets the N vs 4N scaling benchmark run on identical input. `text` is
computed by the exact reference extraction chain applied to `html`, making
the byte-identity invariant true by construction (and testable).
"""

from __future__ import annotations

import datetime as dt
import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datamatcher_spark.norm.text import extract_text_py

_SYLLABLES = [
    "al", "be", "cor", "dan", "el", "for", "gan", "hel", "in", "jor",
    "kal", "lum", "mar", "nor", "op", "pra", "quil", "ros", "sol", "tur",
    "ul", "ver", "wex", "xan", "yor", "zel", "ba", "ce", "di", "fu",
]


def _vocab(n: int = 900) -> list[str]:
    words, i = [], 0
    while len(words) < n:
        a = _SYLLABLES[i % len(_SYLLABLES)]
        b = _SYLLABLES[(i // len(_SYLLABLES) + i) % len(_SYLLABLES)]
        c = _SYLLABLES[(i * 7 + 3) % len(_SYLLABLES)]
        words.append(a + b + (c if i % 3 == 0 else ""))
        i += 1
    return sorted(set(words))[:n]


VOCAB = _vocab()
CLUSTER_SIZE_P = np.array([0.35, 0.25, 0.15, 0.12, 0.08, 0.05])
LANGS = np.array(["en", "en", "en", "en", "en", "en", "en", "pl", "de", "en"])
EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)


def _domain_cdf(n_domains: int) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_domains + 1), 1.15)
    return np.cumsum(w / w.sum())


def _typo(rng: np.random.RandomState, s: str) -> str:
    if len(s) < 4:
        return s
    i = int(rng.randint(1, len(s) - 2))
    op = rng.randint(3)
    if op == 0:  # swap adjacent
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    if op == 1:  # drop
        return s[:i] + s[i + 1:]
    return s[:i] + s[i] + s[i:]  # double


def _mutate_title(rng: np.random.RandomState, title: str) -> str:
    r = rng.randint(5)
    if r == 0:
        return title
    if r == 1:
        return title.upper()
    if r == 2:
        return title.lower()
    if r == 3:
        return title.replace(" ", " - ", 1)
    return _typo(rng, title)


def _mutate_body(rng: np.random.RandomState, words: list[str]) -> list[str]:
    words = list(words)
    r = rng.randint(4)
    if r == 0 and len(words) > 10:  # drop a small token span
        i = int(rng.randint(0, len(words) - 4))
        del words[i : i + int(rng.randint(1, 4))]
    elif r == 1 and len(words) > 10:  # local reorder
        i = int(rng.randint(0, len(words) - 6))
        seg = words[i : i + 5]
        rng.shuffle(seg)
        words[i : i + 5] = seg
    elif r == 2:  # punctuation injection
        i = int(rng.randint(0, len(words)))
        words.insert(i, "—")
    return words


def _render_html(rng: np.random.RandomState, title: str, body_words: list[str]) -> str:
    mid = max(1, len(body_words) // 2)
    p1 = " ".join(body_words[:mid])
    p2 = " ".join(body_words[mid:])
    pad = "  " if rng.randint(3) == 0 else " "
    noise = "a < b comparison" if rng.randint(10) == 0 else ""
    unclosed = "<br" if rng.randint(20) == 0 else ""
    return (
        f"<html>\n<head><title>{title}</title></head>\n<body>\n"
        f"  <h1>{title}</h1>\n"
        f"  <p class='lead'>{p1}</p>\n"
        f" {pad}<p>{p2}{pad}{noise}</p>{unclosed}\n"
        f"</body>\n</html>"
    )


def _gen_cluster(seed: int, cluster_id: int, n_domains: int, dom_cdf: np.ndarray,
                 cross_domain_frac: float) -> list[dict]:
    rng = np.random.RandomState((seed * 1_000_003 + cluster_id) % (2**31 - 1))
    size = int(rng.choice(np.arange(1, 7), p=CLUSTER_SIZE_P))
    dom_i = int(np.searchsorted(dom_cdf, rng.uniform()))
    domain = f"site{dom_i:04d}.example.com"
    # a few clusters span two domains (mirrors/syndication) — only LSH
    # band keys can block these together.
    alt_domain = None
    if size >= 2 and rng.uniform() < cross_domain_frac:
        alt_i = int(np.searchsorted(dom_cdf, rng.uniform()))
        if alt_i != dom_i:
            alt_domain = f"site{alt_i:04d}.example.com"

    title_words = [VOCAB[int(i)] for i in rng.randint(0, len(VOCAB), rng.randint(4, 9))]
    title = " ".join(title_words).capitalize()
    body = [VOCAB[int(i)] for i in rng.randint(0, len(VOCAB), rng.randint(40, 90))]
    slug = "-".join(title_words[:4])
    lang = str(LANGS[rng.randint(len(LANGS))])

    rows = []
    for m in range(size):
        mrng = np.random.RandomState(
            (seed * 2_000_029 + cluster_id * 31 + m) % (2**31 - 1)
        )
        t = title if m == 0 else _mutate_title(mrng, title)
        b = body if m == 0 else _mutate_body(mrng, body)
        mslug = slug if mrng.randint(4) else _typo(mrng, slug)
        dom = alt_domain if (alt_domain and m == size - 1) else domain
        www = "www." if mrng.randint(3) == 0 else ""
        tail = ["", "/", "?utm_source=feed", "?ref=rss"][mrng.randint(4)]
        url = f"https://{www}{dom}/{mslug}-c{cluster_id}m{m}{tail}"
        html = _render_html(mrng, t, b)
        ts = EPOCH + dt.timedelta(seconds=int(cluster_id) * 60 + m)
        rows.append(
            dict(
                url=url,
                warc_ts=ts,
                html=html.encode("utf-8"),
                text=extract_text_py(html),
                lang=lang,
                cluster_id=int(cluster_id),
            )
        )
    return rows


def generate_pages_with_truth(
    spark: SparkSession,
    n_docs: int = 10_000,
    seed: int = 42,
    cross_domain_frac: float = 0.03,
    n_partitions: int | None = None,
) -> DataFrame:
    """pages + cluster_id ground-truth column, generated distributed."""
    avg_size = float(np.arange(1, 7) @ CLUSTER_SIZE_P)
    n_clusters = max(1, int(n_docs / avg_size))
    n_domains = max(20, n_clusters // 40)
    dom_cdf = _domain_cdf(n_domains)
    sc_parts = n_partitions or spark.sparkContext.defaultParallelism

    schema = (
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, cluster_id long"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for cid in pdf["id"].tolist():
                rows.extend(
                    _gen_cluster(seed, int(cid), n_domains, dom_cdf, cross_domain_frac)
                )
            if rows:
                yield pd.DataFrame(rows)

    return (
        spark.range(n_clusters, numPartitions=sc_parts)
        .mapInPandas(gen, schema=schema)
    )


def generate_pages(spark: SparkSession, n_docs: int = 10_000, seed: int = 42,
                   **kw) -> DataFrame:
    """The public input table (FIXTURES.md §1 schema, no truth column)."""
    return generate_pages_with_truth(spark, n_docs, seed, **kw).drop("cluster_id")


def generate_adversarial_pages(
    spark: SparkSession,
    n_base: int = 8_000,
    n_mega: int = 1_200,
    n_boiler: int = 400,
    seed: int = 42,
) -> DataFrame:
    """Skew stress corpus (SURVEY §7 hard part (a); judge r5 item 4): the
    planted-cluster base PLUS two adversarial bands —

    * one MEGA-DOMAIN holding ``n_mega`` docs (≈10% of the corpus at the
      defaults) with mutually-distinct texts: its ``dom:`` block is
      quadratic-poisonous and must be truncated out of pair generation
      with the drop LOGGED to the census, while its docs remain reachable
      through their (naturally small) LSH band keys;
    * one BOILERPLATE band: ``n_boiler`` docs with byte-identical text on
      distinct single-doc domains — every one of their ``lsh:`` band keys
      collects all ``n_boiler`` docs and must be band-cap truncated the
      same way (the head-of-web boilerplate pathology: cookie banners,
      footer legalese).

    Everything is JVM expressions over ``spark.range`` — deterministic and
    partition-invariant by construction. Reference analogue: none (the
    desktop engine never blocks; this is the north rule's skew clause).
    """
    base = generate_pages(spark, n_docs=n_base, seed=seed)
    mega = spark.range(n_mega).selectExpr(
        "concat('https://mega-hub.example/item/', id) AS url",
        "timestamp('2026-01-05 00:00:00') AS warc_ts",
        "cast(concat('<html><head><title>Mega item ', id,"
        " '</title></head><body>catalog</body></html>') AS binary) AS html",
        "concat('mega item ', id, ' alpha', pmod(id * 7, 97),"
        " ' beta', pmod(id * 13, 89), ' gamma', pmod(id * 31, 83),"
        " ' delta', pmod(id * 3, 79)) AS text",
        "'en' AS lang",
    )
    boiler_text = (
        "cookie policy accept terms privacy boilerplate footer navigation "
        "copyright legal notice contact about"
    )
    boiler = spark.range(n_boiler).selectExpr(
        "concat('https://bp-', id, '.example/page') AS url",
        "timestamp('2026-01-06 00:00:00') AS warc_ts",
        "cast('<html><head><title>Legal</title></head><body>x</body></html>'"
        " AS binary) AS html",
        f"'{boiler_text}' AS text",
        "'en' AS lang",
    )
    return base.unionByName(mega).unionByName(boiler)


def generate_labeled_pairs(pages_truth: DataFrame, neg_per_pos: float = 2.0,
                           seed: int = 42) -> DataFrame:
    """labeled_pairs(url_a, url_b, label, block_key) — FIXTURES.md §2.

    Positives: all within-cluster pairs. Hard negatives: same-domain pairs
    from different clusters, deterministically sampled by hash so the set
    is stable across partitionings.
    """
    from datamatcher_spark.norm.keys import norm_domain_expr

    p = pages_truth.select(
        "url", "cluster_id", norm_domain_expr(F.col("url")).alias("block_key")
    )
    a, b = p.alias("a"), p.alias("b")

    pos = (
        a.join(b, F.col("a.cluster_id") == F.col("b.cluster_id"))
        .filter(F.col("a.url") < F.col("b.url"))
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
            F.lit(True).alias("label"),
            F.col("a.block_key").alias("block_key"),
        )
    )
    # same-block negatives, hash-sampled to ~neg_per_pos × positives
    neg_all = (
        a.join(b, F.col("a.block_key") == F.col("b.block_key"))
        .filter(
            (F.col("a.url") < F.col("b.url"))
            & (F.col("a.cluster_id") != F.col("b.cluster_id"))
        )
        .select(
            F.col("a.url").alias("url_a"),
            F.col("b.url").alias("url_b"),
            F.lit(False).alias("label"),
            F.col("a.block_key").alias("block_key"),
        )
    )
    n_pos = pos.count()
    n_neg = neg_all.count()
    if n_neg > 0:
        frac = min(1.0, neg_per_pos * n_pos / n_neg)
        thresh = int(frac * 10_000)
        neg = neg_all.filter(
            F.pmod(F.xxhash64("url_a", "url_b", F.lit(seed)), F.lit(10_000)) < thresh
        )
    else:
        neg = neg_all
    return pos.unionByName(neg)


def corpus_fingerprint(pages: DataFrame) -> str:
    """Order-insensitive corpus digest — proves two runs saw identical input."""
    h = (
        pages.select(F.xxhash64("url", "text", "lang").alias("h"))
        .agg(
            # decimal sum: order-insensitive and overflow-proof under ANSI
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    return hashlib.sha256(f"{h.s}:{h.n}".encode()).hexdigest()[:16]
