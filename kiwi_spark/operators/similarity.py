"""Approximate-nearest-neighbor search over an embedding column.

* ``cosine_topk``   — brute-force exact baseline: one JVM-side dot-product
  column + TakeOrderedAndProject top-k (no full sort, no Python).
* ``ivf_build`` / ``ivf_topk`` — IVF-style scale path: k-means-lite
  (deterministic seeded centroid sample + one Lloyd refinement in Spark),
  vectors partitioned by nearest centroid; queries probe ``nprobe``
  centroids, scanning only those partitions. At 100 TB the centroid table
  is broadcast and each probe is a partition-pruned scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(col: str, vec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(F.col(col).cast("array<double>"), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(col: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(col).cast("array<double>"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    qnorm = float(np.linalg.norm(query_vec)) or 1.0
    score = _dot(vec_col, query_vec) / (_norm(vec_col) * qnorm)
    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"), F.round(score, 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_build(embeddings: DataFrame, n_cells: int = 16, seed: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Returns (assigned_df, centroids) — vectors tagged with their cell.

    Centroids: deterministic sample of n_cells vectors, refined by one
    Lloyd iteration computed distributively (groupBy(cell) mean).
    """
    sample = (
        embeddings.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.pmod(F.xxhash64(F.col("i").cast("string"), F.lit(seed)), F.lit(997)))
        .limit(n_cells)
        .collect()
    )
    centroids = [list(map(float, r["v"])) for r in sample]

    def assign(df: DataFrame, cents: list[list[float]]) -> DataFrame:
        best_cell = F.lit(0)
        best_score = _dot(vec_col, cents[0]) / (
            _norm(vec_col) * (float(np.linalg.norm(cents[0])) or 1.0)
        )
        for idx in range(1, len(cents)):
            score = _dot(vec_col, cents[idx]) / (
                _norm(vec_col) * (float(np.linalg.norm(cents[idx])) or 1.0)
            )
            best_cell = F.when(score > best_score, F.lit(idx)).otherwise(best_cell)
            best_score = F.when(score > best_score, score).otherwise(best_score)
        return df.withColumn("cell", best_cell)

    assigned = assign(embeddings, centroids)
    # one Lloyd refinement: per-cell elementwise mean via posexplode + groupBy
    dim = len(centroids[0])
    means = (
        assigned.select("cell", F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy("cell", "pos")
        .agg(F.avg("col").alias("m"))
        .groupBy("cell")
        .agg(F.map_from_arrays(F.collect_list("pos"), F.collect_list("m")).alias("mm"))
        .collect()
    )
    refined = list(centroids)
    for row in means:
        mm = row["mm"]
        refined[row["cell"]] = [float(mm.get(i, 0.0)) for i in range(dim)]
    assigned = assign(embeddings, refined).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"), "cell"
    )
    return assigned, refined


def ivf_topk(assigned: DataFrame, centroids: list[list[float]],
             query_vec: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
    """Probe the nprobe nearest cells only — the partition-pruned scan."""
    q = np.asarray(query_vec, dtype=float)
    qn = np.linalg.norm(q) or 1.0
    sims = [
        float(np.dot(q, np.asarray(c)) / (qn * (np.linalg.norm(c) or 1.0)))
        for c in centroids
    ]
    probe = sorted(range(len(centroids)), key=lambda i: -sims[i])[:nprobe]
    subset = assigned.where(F.col("cell").isin(probe))
    return cosine_topk(subset, query_vec, k)
