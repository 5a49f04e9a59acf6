r"""Similarity search over embedding columns (SURVEY §2.5).

Two paths:

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus, score with codegen'd array expressions
  (``aggregate``/``zip_with`` — JVM-side, no Python), take top-k per
  query with a window. The *oracle* and the right answer whenever the
  query set is small: one broadcast, zero shuffles of the corpus, a
  partial top-k per partition then a tiny final top-k (Catalyst plans
  rank-filter windows with partial sort).
- :func:`lsh_topk` — the scale path: random-hyperplane LSH (sign-bit
  sketch) bucketing; candidates = corpus rows sharing a band with the
  query sketch; exact cosine re-rank inside candidates only. At 100 TB
  the corpus is hashed once (map-only), bucketed (one shuffle on
  uniform sketch bands), and each query probes its buckets instead of
  scanning the corpus.

Hyperplanes are generated deterministically from :func:`~.hashing.hash60`
(seeded), so results are reproducible across engines/runs without
shipping a random matrix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import hash60_py


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, score) — score = cosine,
    ties broken by neighbor id; self-matches excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def hyperplane_values(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j ∈ {-1,+1}
    from bit parity of hash60(j, seed). Rademacher hyperplanes are a
    standard SimHash choice and need no stored matrix. Computed once
    driver-side and embedded as literals — recomputing the md5-derived
    components per row would dominate the sketch cost."""
    return [1.0 if hash60_py(str(j), seed) & 1 else -1.0 for j in range(dim)]


def hyperplane(seed: int, dim: int) -> Column:
    return F.array(*[F.lit(v) for v in hyperplane_values(seed, dim)])


def sketch_bits(vec: Column, dim: int, n_bits: int = 16) -> Column:
    """n_bits sign bits of <v, h_i> packed into a long."""
    bits = []
    for i in range(n_bits):
        h = hyperplane(7000 + i, dim)
        bits.append(
            F.when(dot(vec, h) >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate top-k: band the sign sketch into ``bands`` sub-keys;
    candidates share ≥1 band with the query; exact cosine re-rank.

    Recall is tuned by bands/n_bits (more bands = higher recall, more
    candidates). Returns the same schema as brute_force_topk.
    """
    r = n_bits // bands
    mask = (1 << r) - 1

    def banded(df: DataFrame, idc: str, vc: str):
        v = as_double(F.col(vc))
        sk = sketch_bits(v, dim, n_bits)
        return df.select(F.col(idc).alias("id"), v.alias("v"), sk.alias("sk")).select(
            "id",
            "v",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("sk"), b * r).bitwiseAND(F.lit(mask))
                        for b in range(bands)
                    ]
                )
            ).alias("band", "key"),
        )

    cb = banded(corpus, id_col, vec_col)
    qb = banded(queries, id_col, vec_col)
    cand = (
        cb.join(
            F.broadcast(qb.withColumnRenamed("id", "query_id").withColumnRenamed("v", "qv")),
            ["band", "key"],
        )
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), "qv", F.col("v").alias("cv"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Cosine-threshold near-duplicate pairs via the banded sketch:
    pairs must share a band, then exact cosine ≥ threshold.
    Returns (id_a, id_b, score), id_a < id_b."""
    r = n_bits // bands
    mask = (1 << r) - 1
    v = as_double(F.col(vec_col))
    sk = sketch_bits(v, dim, n_bits)
    base = df.select(F.col(id_col).alias("id"), v.alias("v"), sk.alias("sk")).select(
        "id",
        "v",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sk"), b * r).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("score"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("score") >= threshold)
    )
    return pairs
