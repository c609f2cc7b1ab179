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


def _lloyd_centroids(sample: np.ndarray, nlist: int, seed: int,
                     iters: int) -> np.ndarray:
    """Seeded init + Lloyd iterations with cosine assignment — the
    driver-side numpy kernel shared by ``IVFIndex.fit`` and the
    ``simsearch_ivf`` VALUES oracle (same input → bit-identical
    centroids, the multimodal shared-generator pattern)."""
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
    return cents


def _probe_cells(centroids: np.ndarray, query: np.ndarray, nprobe: int) -> list[int]:
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-9
    )
    qn = query / max(np.linalg.norm(query), 1e-9)
    return [int(c) for c in (cn @ qn).argsort()[::-1][:nprobe]]


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
        return cls(_lloyd_centroids(sample, nlist, seed, iters))

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

    def assign(self, df: DataFrame, vec_col: str,
               method: str = "auto") -> DataFrame:
        """Add the ``ivf_cell`` column (done once, at index-build time).

        Two physical forms behind the same API, identical results
        (parity-tested at nlist=16):

        * ``expr`` — inline one cosine expression per centroid
          (``_cell_expr``). Zero row amplification and whole-stage
          codegen, but the expression tree grows with nlist: fine at
          nlist ≤ 64, and past a few hundred the generated code bloats
          (compile time, JIT limits) — the wrong plan at realistic
          nlist (1k-4k).
        * ``join`` — broadcast the centroid table, score nlist rows per
          vector, per-row argmax via a lexicographic struct max (highest
          sim, then LOWEST cell id — the same first-max tie-break as
          ``array_position``). Row amplification nlist×, but it is plain
          broadcast-join + hash-agg: distributed, no codegen blowup, and
          the shape that keeps working at nlist=4096.

        ``auto`` picks expr at nlist ≤ 64 (the measured comfortable zone
        for the inline tree), join above.

        Measured crossover (r7, 20k vectors × 16 dims, local[32]): both
        forms scale linearly in nlist and expr stays slightly ahead
        through nlist=512 (expr 5.6/8.3/18.9/33.8 s vs join
        8.3/10.4/20.7/41.0 s at 64/128/256/512) — the join form's value
        at realistic nlist (1k-4k) is bounded codegen/driver cost and
        distributed argmax, not raw speed at moderate nlist. Parity is
        pytest-asserted at nlist=16 AND nlist=512
        (tests/test_round7.py::test_ivf_join_expr_parity_nlist_512).
        """
        if method == "auto":
            method = "expr" if len(self.centroids) <= 64 else "join"
        if method == "expr":
            return df.withColumn("ivf_cell", self._cell_expr(vec_col))
        spark = df.sparkSession
        cents = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(self.centroids)],
            "ivf_cell int, __centroid array<double>",
        )
        # transient per-row key: the CASTED VECTOR ITSELF — deterministic
        # under recomputation (unlike monotonically_increasing_id, whose
        # two sides of the self-join below could disagree after a retry),
        # and collision-free by construction (r7, closed the r6 ADVICE
        # item: the previous xxhash64(vector) key silently gave one
        # vector the other's cell on a 64-bit collision). Duplicate
        # vectors collapsing to one argmax row is correct because equal
        # vectors get equal cells. Null vectors are excluded from the
        # argmax and rejoin as NULL ivf_cell via the left join — the
        # exact expr-path semantics (null sims → null array_max → null).
        base = df.withColumn("__v", F.col(vec_col).cast("array<double>"))
        sims = (
            base.select("__v")
            .where(F.col("__v").isNotNull())
            .dropDuplicates(["__v"])
            .join(F.broadcast(cents))
            .select(
                "__v",
                F.col("ivf_cell"),
                cosine_sim_expr(F.col("__v"), F.col("__centroid")).alias("__sim"),
            )
        )
        best = (
            sims.groupBy("__v")
            .agg(
                F.max(
                    F.struct(
                        F.col("__sim"),
                        (-F.col("ivf_cell")).alias("__neg"),
                        F.col("ivf_cell"),
                    )
                ).alias("__best")
            )
            .select("__v", F.col("__best.ivf_cell").alias("ivf_cell"))
        )
        return base.join(best, "__v", "left").drop("__v")

    def assign_cell_py(self, vec: Sequence[float]) -> int:
        """Driver-side twin of ``_cell_expr`` for one vector: JVM-fold
        cosine to every centroid, first-max argmax (array_position)."""
        sims = [_fold_cosine(vec, c) for c in self.centroids]
        return sims.index(max(sims))

    def search(self, indexed: DataFrame, vec_col: str, query: Sequence[float],
               k: int = 10, nprobe: int = 4, id_col: str = "vec_id") -> DataFrame:
        """Probe the nprobe nearest cells only — partition-pruned scan when
        the table is written partitioned/bucketed by ivf_cell."""
        q = np.asarray(query, dtype=float)
        probe_cells = _probe_cells(self.centroids, q, nprobe)
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


def _fold_cosine(a: Sequence[float], b: Sequence[float]) -> float:
    """Twin of ``cosine_sim_expr``'s JVM evaluation: strict left-to-right
    double folds (Spark's ``aggregate`` over ``zip_with`` products), NOT
    numpy pairwise summation — the last-ulp difference matters because the
    cell assignment takes an argmax over these values and the output is
    compared hash-exact at 6 decimals."""
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    na, nb = math.sqrt(na), math.sqrt(nb)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


def expected_ivf_topk_rows(
    sf_dir: str,
    *,
    nlist: int = 8,
    seed: int = 5,
    iters: int = 3,
    k: int = 10,
    nprobe: int = 4,
    query_vec_id: int = 0,
) -> list[tuple[int, float]]:
    """Pure-Python recompute of the ``simsearch_ivf`` catalog entry over
    the same parquet: centroids via the SHARED seeded numpy kernel
    (``_lloyd_centroids`` — identical input order: one parquet file, so
    pyarrow row order == Spark scan/collect order), then an independent
    Python reimplementation of the distributed parts — per-vector cell
    assignment, probe-set filter, query cosine (all with JVM fold
    semantics, ``_fold_cosine``), HALF_UP rounding, (cosine DESC, vec_id
    ASC) top-k."""
    import pyarrow.parquet as pq

    from datamatcher_spark.functions.pyhash import round_half_up

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [[float(x) for x in v] for v in t.column("embedding").to_pylist()]
    if len(vecs) > 4096:
        # IVFIndex.fit switches to a partition-seeded df.sample() above its
        # sample_cap (4096) — a draw this all-rows recompute cannot replay.
        # Fail loudly instead of silently fitting divergent centroids.
        raise ValueError(
            f"expected_ivf_topk_rows: {len(vecs)} embeddings exceed "
            "IVFIndex.fit's sample_cap=4096 — the fit would sample and this "
            "oracle fits on all rows; point the oracle at a smaller corpus"
        )
    cents = _lloyd_centroids(np.array(vecs, dtype=float), nlist, seed, iters)
    q = vecs[ids.index(query_vec_id)]
    probe = set(_probe_cells(cents, np.asarray(q, dtype=float), nprobe))
    cent_lists = [[float(x) for x in c] for c in cents]
    rows = []
    for vid, v in zip(ids, vecs):
        sims = [_fold_cosine(v, c) for c in cent_lists]
        if sims.index(max(sims)) in probe:
            rows.append((vid, round_half_up(_fold_cosine(v, q), 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]
