r"""Deterministic distributed k-means + SemDeDup semantic dedup.

Embedding clustering for training-data curation (SURVEY §2.5): k-means
partitions the corpus into semantic neighborhoods, then SemDeDup
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — public paper) prunes near-identical
embeddings *within* each cluster, so the pair search is bounded by the
cluster partition instead of all-pairs.

Why not pyspark.ml.KMeans: MLlib's initialization is randomized
(k-means||) and its convergence is float-order dependent, so results
are not replayable in an external oracle. This implementation is fully
deterministic: seeds are the k smallest-id vectors, every distance is
a left-associated double fold (bit-identical to the DuckDB oracle's
unrolled arithmetic — see similarity.dot), and recomputed centroids
are rounded to 1e-6 so partial-aggregation summation order can't leak
into assignments.

Scale (100 TB): assignment is map-only (k × dim fused expressions per
row, whole-stage friendly, zero shuffle); the centroid update is one
partial-aggregated shuffle of k·dim cells and an O(k·dim) driver
collect (k=50k, dim=1k → 50M cells ≈ 400 MB — cap k accordingly or
tree-aggregate); iterations are a small constant. SemDeDup's pair scan
shuffles once on the cluster id; oversized clusters should be salted
into tile-pair subgroups exactly like similarity.embedding_near_dup's
sign-sketch buckets (same triangular-pairing pattern) — at the paper's
operating point clusters are sized ~n/k ≈ 10⁴, which one task absorbs.

Reference parity: the reference engine (a 1-record-in-flight text
pipeline, /root/reference/src/lib.rs:84-93) has no vector layer; this
is the §2.5 LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dist2(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a centroid literal: left-associated
    double fold, the engine-parity accumulation order."""
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_cluster(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid; ties break to the smallest index
    (walk reversed so earlier clusters win), matching the oracle's
    row_number() ORDER BY d, cluster."""
    dists = [_dist2(vec, c) for c in centroids]
    best = F.least(*dists) if len(dists) > 1 else dists[0]
    assign = F.lit(len(centroids) - 1)
    for j in reversed(range(len(centroids) - 1)):
        assign = F.when(dists[j] == best, F.lit(j)).otherwise(assign)
    return assign.cast("int")


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Deterministic k-means: seeds = the k smallest-id vectors (cluster
    j = rank of its seed id), ``iters`` assignment passes with
    ``iters - 1`` centroid recomputes in between. Returns
    (id_col, cluster).

    Centroid recompute is posexplode → partial-agg avg per
    (cluster, dim) → O(k·dim) driver collect, rounded to 1e-6 for
    engine-stable replay. Empty clusters keep their previous centroid.
    """
    pts = df.select(
        F.col(id_col).alias("_kid"),
        F.col(vec_col).cast("array<double>").alias("_kv"),
    )
    seed_rows = pts.orderBy("_kid").limit(k).collect()  # O(k·dim), bounded
    centroids = [list(r._kv) for r in seed_rows]
    dim = len(centroids[0])
    for _ in range(max(0, iters - 1)):
        assigned = pts.withColumn("cluster", _argmin_cluster(F.col("_kv"), centroids))
        cells = (
            assigned.select("cluster", F.posexplode("_kv").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("v"))
            .collect()  # O(k·dim), bounded
        )
        new: dict[int, dict[int, float]] = {}
        for r in cells:
            new.setdefault(r.cluster, {})[r.pos] = r.v
        for c in range(len(centroids)):
            if c in new:
                centroids[c] = [new[c][p] for p in range(dim)]
    return pts.select(
        F.col("_kid").alias(id_col),
        _argmin_cluster(F.col("_kv"), centroids).alias("cluster"),
    )


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    tau: float = 0.9,
    assignment: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup: within each k-means cluster, mark a vector as a
    duplicate when some LOWER-id vector in the same cluster has
    cosine ≥ tau (the kept representative is the smallest id, the
    same keeper rule as the dedup family). Returns
    (id_col, cluster, is_dup ∈ {0,1}).

    One shuffle on the cluster id; the within-cluster pair scan is the
    algorithm's point — bounded by the partition, never all-pairs.
    Cosines compare at round(·, 6) so the verdict is engine-stable.
    """
    from .similarity import cosine

    assign = assignment if assignment is not None else kmeans(df, vec_col, id_col, k, iters)
    pts = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .join(assign.withColumnRenamed(id_col, "id"), "id")
    )
    a = pts.alias("a")
    b = pts.alias("b")
    dups = (
        a.join(b, on="cluster")
        .where(F.col("a.id") < F.col("b.id"))
        .where(F.round(cosine(F.col("a.v"), F.col("b.v")), 6) >= F.lit(tau))
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return (
        pts.join(dups.withColumn("is_dup", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce("is_dup", F.lit(0)).alias("is_dup"),
        )
    )
