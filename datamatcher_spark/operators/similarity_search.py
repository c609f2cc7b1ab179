"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — the exact baseline; one scan, JVM-side
    dot products, top-k via window or global sort-limit.
  * IVF (inverted-file) ANN — k-means-ish coarse centroids chosen
    deterministically, vectors assigned to nearest centroid at write
    time, queries probe only the ``nprobe`` nearest cells. The scale
    path: the probe join touches 1/nlist of the data per query.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datamatcher_spark.operators.dedup import cosine_sim_expr


def _vec_lit(vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(df: DataFrame, vec_col: str, query: Sequence[float], k: int = 10,
                id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine similarity to one query vector."""
    return (
        df.select(
            F.col(id_col),
            F.round(
                cosine_sim_expr(F.col(vec_col).cast("array<double>"), _vec_lit(query)),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_per_label(df: DataFrame, vec_col: str, query: Sequence[float],
                          label_col: str, k: int = 3,
                          id_col: str = "vec_id") -> DataFrame:
    """Top-k per group (window rank) — the grouped-retrieval shape."""
    w = Window.partitionBy(label_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        df.select(
            F.col(id_col), F.col(label_col),
            F.round(
                cosine_sim_expr(F.col(vec_col).cast("array<double>"), _vec_lit(query)),
                6,
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


class IVFIndex:
    """Minimal IVF: deterministic centroids via seeded sampling + a few
    Lloyd iterations on the driver (centroid count is tiny), assignments
    and probing fully distributed."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids

    @classmethod
    def fit(cls, df: DataFrame, vec_col: str, nlist: int = 16, seed: int = 5,
            iters: int = 3, sample_cap: int = 4096) -> "IVFIndex":
        vecs = df.select(F.col(vec_col).cast("array<double>").alias("v"))
        # uniform seeded sample — ``limit()`` would take the FIRST partitions
        # only, so on sorted/clustered data the centroids would be fit on a
        # biased, ordering-dependent slice (round-1 advisory). One count()
        # job at fit time is the price of an unbiased fraction.
        n_total = vecs.count()
        if n_total == 0:
            raise ValueError("IVFIndex.fit: empty input")
        if n_total > sample_cap:
            frac = min(1.0, (sample_cap * 1.5) / n_total)
            vecs = vecs.sample(fraction=frac, seed=seed)
        sample = np.array([r.v for r in vecs.collect()][:sample_cap])
        if len(sample) == 0:  # pathological tiny-fraction draw
            sample = np.array([r.v for r in df.select(
                F.col(vec_col).cast("array<double>").alias("v")
            ).limit(min(n_total, sample_cap)).collect()])
        rng = np.random.RandomState(seed)
        idx = rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)
        cents = sample[idx]
        for _ in range(iters):
            # normalized cosine assignment
            sn = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-9)
            cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-9)
            assign = (sn @ cn.T).argmax(axis=1)
            for c in range(len(cents)):
                members = sample[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        return cls(cents)

    def _cell_expr(self, vec_col: str):
        sims = [
            cosine_sim_expr(
                F.col(vec_col).cast("array<double>"),
                F.array(*[F.lit(float(x)) for x in c]),
            )
            for c in self.centroids
        ]
        arr = F.array(*sims)
        return F.array_position(arr, F.array_max(arr)).cast("int") - 1

    def assign(self, df: DataFrame, vec_col: str) -> DataFrame:
        """Add the ``ivf_cell`` column (done once, at index-build time)."""
        return df.withColumn("ivf_cell", self._cell_expr(vec_col))

    def search(self, indexed: DataFrame, vec_col: str, query: Sequence[float],
               k: int = 10, nprobe: int = 4, id_col: str = "vec_id") -> DataFrame:
        """Probe the nprobe nearest cells only — partition-pruned scan when
        the table is written partitioned/bucketed by ivf_cell."""
        q = np.asarray(query, dtype=float)
        cn = self.centroids / np.maximum(
            np.linalg.norm(self.centroids, axis=1, keepdims=True), 1e-9
        )
        qn = q / max(np.linalg.norm(q), 1e-9)
        probe_cells = [int(c) for c in (cn @ qn).argsort()[::-1][:nprobe]]
        return (
            indexed.filter(F.col("ivf_cell").isin(probe_cells))
            .select(
                F.col(id_col),
                F.round(
                    cosine_sim_expr(F.col(vec_col).cast("array<double>"), _vec_lit(q)),
                    6,
                ).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )
