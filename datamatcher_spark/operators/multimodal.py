"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container ships no image/audio libraries, so the decode kernels are
STUBS — the actual PIL/ffmpeg call sites raise ``NotImplementedError``
unless the deterministic fake decoder is selected. Everything around the
kernel is real and tested: schema, Arrow batch shape, ``mapInPandas``
partition flow, and metadata projection — swapping in a real decoder
changes only the marked inner function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha1 string, "
    "feature array<float>, decode_ok boolean"
)


def _media_row(i: int, seed: int) -> dict:
    """One deterministic fake media row — pure Python, shared by the
    distributed generator AND the driver-side oracle so both see
    byte-identical payloads (same RNG call order, per row)."""
    kinds = ["image", "audio", "video"]
    rng = np.random.RandomState(seed * 100_003 + int(i))
    kind = kinds[int(i) % 3]
    payload = rng.bytes(128 + int(rng.randint(0, 256)))
    return dict(
        media_id=int(i), kind=kind, payload=payload,
        mime={"image": "image/png", "audio": "audio/wav",
              "video": "video/mp4"}[kind],
        width=int(rng.randint(16, 512)) if kind != "audio" else None,
        height=int(rng.randint(16, 512)) if kind != "audio" else None,
        duration_ms=int(rng.randint(1000, 60000)) if kind != "image" else None,
    )


def synthesize_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic fake media table (binary payloads with real bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([_media_row(i, seed) for i in pdf["id"].tolist()])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def expected_feature_rows(n: int, seed: int, dim: int = 8) -> list[dict]:
    """Driver-side oracle for ``extract_features(synthesize_media(n, seed))``
    with scalar-only columns: recomputes every payload and fake feature in
    plain Python (no Spark) so a DuckDB VALUES oracle can assert the whole
    Arrow pipeline end-to-end. feature_norm folds float32 components in
    float64 in array order — the exact arithmetic of the Spark-side
    ``aggregate(feature, 0.0D, (a, x) -> a + double(x) * double(x))``."""
    out = []
    for i in range(n):
        r = _media_row(i, seed)
        vec = _decode_fake(r["payload"], r["kind"], dim)
        s = 0.0
        for x in vec:
            s += float(x) * float(x)
        out.append(
            dict(
                media_id=i, kind=r["kind"], n_bytes=len(r["payload"]),
                sha1=hashlib.sha1(r["payload"]).hexdigest(),
                feature_dim=dim,
                feature_norm=round(s ** 0.5, 3),
                decode_ok=True,
            )
        )
    return out


def _decode_real(payload: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    """REAL DECODER STUB — requires PIL / soundfile / av, not present in
    this container. Plug the real kernel here."""
    raise NotImplementedError(
        f"real {kind} decoding needs media libraries not present in this env"
    )


def _decode_fake(payload: bytes, kind: str, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'feature extractor': sha1-seeded unit vector.
    Same payload → same feature, across runs and partitionings."""
    h = hashlib.sha1(payload).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / max(float(np.linalg.norm(v)), 1e-9)


def extract_features(media: DataFrame, *, decoder: str = "fake",
                     dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoder='fake'`` → deterministic sha1-seeded vectors (CI-safe).
    ``decoder='real'`` → raises NotImplementedError at the kernel, by
    design, until media libs exist in the image.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if payload is None:
                    feats.append(None)
                    oks.append(False)
                    continue
                if decoder == "real":
                    vec = _decode_real(bytes(payload), kind)
                else:
                    vec = _decode_fake(bytes(payload), kind, dim)
                feats.append([float(x) for x in vec])
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "sha1": pdf["payload"].map(
                        lambda b: None if b is None else hashlib.sha1(bytes(b)).hexdigest()
                    ),
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    the distributed explode that a real frame decoder would consume.
    Pure Catalyst (sequence + explode), no Python."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
