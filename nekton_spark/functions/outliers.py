"""Embedding-space outlier detection for corpus curation.

The standard first-pass quality filter over an embedding column:
score every vector by its squared euclidean distance to the corpus
centroid and surface the top-k farthest (mislabeled junk, encoding
failures, off-distribution content — the rows a curation pipeline
routes to inspection or drops before training).

The reference engine (`src/processors.rs` — byte-stream pipeline, no
vectors) has nothing in this family; this extends the
embedding-curation layer of SURVEY §2.5 (near-dup, quantized dedup,
SemDeDup, PCA) with its complement: instead of pruning what is too
CLOSE to everything else, flag what is too FAR from everything.

Exactness contract (the repo's standard for float pipelines,
SURVEY §6): the centroid is the per-dimension float average rounded
to the 1e-6 grid (sub-ulp engine differences in the raw average are
absorbed by the grid, the `embedding_pca` precedent), and the
distance sum is an exact left-fold in index order (numpy cumsum ==
DuckDB's left-associated unrolled sum, the `ann_topk_bruteforce`
precedent), terminally rounded to 6.

Scale shape: ONE aggregation pass computes the centroid (posexplode →
per-dimension avg — shuffle bounded at O(d) cells by map-side partial
aggregation at any corpus size; the collect is O(d) doubles, the
centroid-collect policy every clustering op here follows). Scoring is
ONE map-only Arrow pass with the centroid as a broadcast-free closure
constant. The global top-k is TakeOrderedAndProject (per-partition
partial top-k, never a full sort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_centroid(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> list[float]:
    """Per-dimension mean on the 1e-6 grid, collected driver-side
    (O(dim) — bounded at any corpus size)."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("j", "x"))
        .groupBy("j")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("mu"))
        .collect()
    )
    if rows and max(r.j for r in rows) >= dim:
        raise ValueError(
            f"embedding_outliers: found embedding of length "
            f"{max(r.j for r in rows) + 1} but dim={dim}; pass the "
            f"correct dim (lengths must be uniform and equal to dim)"
        )
    mu = [0.0] * dim
    for r in rows:
        mu[r.j] = r.mu
    return mu


def _dist2_udf(mu: list[float]):
    @F.pandas_udf("double")
    def _d2(v: pd.Series) -> pd.Series:
        M = np.asarray(mu, dtype=np.float64)
        dim = len(mu)
        out = np.full(len(v), np.nan)
        dense, idx = [], []
        for i, x in enumerate(v):
            if x is None:
                continue  # NULL embedding -> NULL dist2 (oracle parity)
            if len(x) != dim:
                raise ValueError(
                    f"embedding_outliers: embedding of length {len(x)} "
                    f"!= dim {dim}; lengths must be uniform"
                )
            dense.append(np.asarray(x, dtype=np.float64))
            idx.append(i)
        if dense:
            D = (np.asarray(dense) - M) ** 2
            # exact left-fold in index order == the oracle's unrolled sum
            out[idx] = np.cumsum(D, axis=1)[:, -1]
        return pd.Series(out)

    return _d2


def embedding_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 25,
    dim: int = 64,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k centroid-distance outliers: (vec_id, *carry, dist2,
    rank), rank 1..k by dist2 desc, ties to the smaller id. ``dist2``
    is the squared euclidean distance to the grid centroid, rounded
    to 6. ``carry_cols`` ride through unchanged; the default carries
    ``label`` when the frame has it (and nothing otherwise — the
    function must not assume the fixture table's schema). The rank
    window runs AFTER the TakeOrderedAndProject limit — a single
    partition of k rows, not a corpus sort."""
    if carry_cols is None:
        carry_cols = ["label"] if "label" in df.columns else []
    mu = corpus_centroid(df, vec_col, dim)
    d2 = _dist2_udf(mu)
    scored = df.select(
        F.col(id_col).alias("vec_id"),
        *[F.col(c) for c in carry_cols],
        F.round(d2(F.col(vec_col)), 6).alias("dist2"),
    )
    top = scored.orderBy(F.desc("dist2"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("dist2"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w))
