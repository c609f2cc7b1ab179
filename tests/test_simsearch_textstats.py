"""Similarity search (brute-force vs IVF recall) and text-analysis
expressions, on the driver testdata tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datamatcher_spark.functions.textstats import (
    bpe_ish_token_count_expr,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)
from datamatcher_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from datamatcher_spark.operators.similarity_search import (
    IVFIndex,
    cosine_topk,
    cosine_topk_per_label,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def _query_vec(emb):
    return [float(x) for x in emb.orderBy("vec_id").first().embedding]


def test_cosine_topk_self_is_first(emb):
    q = _query_vec(emb)
    top = cosine_topk(emb, "embedding", q, k=5).collect()
    assert top[0].vec_id == 0 and abs(top[0].cosine - 1.0) < 1e-6
    sims = [r.cosine for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ivf_recall_vs_bruteforce(emb):
    q = _query_vec(emb)
    exact = [r.vec_id for r in cosine_topk(emb, "embedding", q, k=10).collect()]
    idx = IVFIndex.fit(emb, "embedding", nlist=8, seed=5)
    indexed = idx.assign(emb, "embedding").cache()
    got = [r.vec_id for r in
           idx.search(indexed, "embedding", q, k=10, nprobe=4).collect()]
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.7, (recall, exact, got)
    # nprobe = nlist degenerates to exact
    full = [r.vec_id for r in
            idx.search(indexed, "embedding", q, k=10, nprobe=8).collect()]
    assert full == exact


def test_topk_per_label(emb):
    q = _query_vec(emb)
    out = cosine_topk_per_label(emb, "embedding", q, "label", k=2).collect()
    per = {}
    for r in out:
        per.setdefault(r.label, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    assert all(len(v) <= 2 for v in per.values())


def test_textstats_basics(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog are in the house that is big",),
            ("der Hund ist nicht mit der Katze im Haus für immer",),
            ("to jest nie na do oraz przez która तीन",),
            ("",),
        ],
        "text string",
    )
    rows = df.select(
        lang_id_expr(F.col("text")).alias("lang"),
        token_count_expr(F.col("text")).alias("tc"),
        quality_score_expr(F.col("text")).alias("q"),
        fingerprint_expr(F.col("text")).alias("fp"),
        bpe_ish_token_count_expr(F.col("text")).alias("bc"),
    ).collect()
    assert rows[0].lang == "en" and rows[1].lang == "de" and rows[2].lang == "pl"
    assert rows[3].lang == "und"
    assert rows[0].tc == 12
    assert 0.0 <= rows[0].q <= 1.0
    assert rows[0].bc >= rows[0].tc


def test_fingerprint_collides_variants(spark):
    df = spark.createDataFrame(
        [("The CAT sat!",), ("cat the sat",), ("sat, cat... THE",), ("dog sat",)],
        "text string",
    )
    fps = [r.fp for r in df.select(fingerprint_expr(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, n=30, seed=3).cache()
    feats = extract_features(media, decoder="fake", dim=8).cache()
    assert feats.count() == 30
    assert feats.filter("decode_ok").count() == 30
    row = feats.first()
    assert len(row.feature) == 8 and abs(sum(x * x for x in row.feature) - 1.0) < 1e-3
    # determinism: same payloads → same sha1+features on regeneration
    feats2 = extract_features(synthesize_media(spark, n=30, seed=3), decoder="fake")
    assert feats.select("media_id", "sha1").exceptAll(
        feats2.select("media_id", "sha1")
    ).isEmpty()
    # real decoder path raises by design
    with pytest.raises(Exception, match="NotImplementedError|media libraries"):
        extract_features(media, decoder="real").collect()
    # frame sampling plan: rows = ceil(duration/step) per video
    plan = frame_sample_plan(media, every_ms=10_000)
    vids = media.filter("kind = 'video'").count()
    assert plan.select("media_id").distinct().count() == vids
