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

Scale (100 TB): assignment is map-only (zero shuffle — codegen argmin
for k ≤ 32, Arrow matrix path beyond); the centroid update is one
partial-aggregated shuffle of k·dim cells and an O(k·dim) driver
collect (k=50k, dim=1k → 50M cells ≈ 400 MB — cap k accordingly or
tree-aggregate); iterations are a small constant. SemDeDup's pair scan
shuffles once on the cluster id and stays O(n · cluster_size) under
the auto-k policy (cluster size pinned at ~TARGET_CLUSTER).

The honest cost bound: EXACT flat k-means assignment is O(n·k·d), and
with k ∝ n (fixed cluster size) that is O(n²·d / TARGET) — measured
31×/decade at the sf1→sf10 rehearsal (1.7 s @ 20k × k=40 → 51 s @
200k × k=400, local[32]). That is the algorithm, not the plan: the
paper's own implementation carries the same product on GPUs. At scales
where n·k compute is the wall, route the SemDeDup partition to the
O(n) lattice quantizer (similarity.quantized_dedup cells) or
sign-sketch buckets (embedding_near_dup) — both shipped and oracled —
or interpose a two-level tree (coarse √k then per-cell fine) to cut
per-point candidates to O(√k).

Reference parity: the reference engine (a 1-record-in-flight text
pipeline, /root/reference/src/lib.rs:84-93) has no vector layer; this
is the §2.5 LLM-pipeline extension surface.
"""

from __future__ import annotations

import pandas as pd  # annotation target for Arrow-batched UDFs
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# auto-k policy: clusters sized ~TARGET_CLUSTER rows, floor 8 — the
# SemDeDup operating point (cluster size constant as the corpus grows,
# so the within-cluster pair scan stays O(n · cluster) not O(n²/k)).
# Same engine-default-with-SQL-replay posture as the LSH auto width
# (similarity._resolve_band_width): the oracle recomputes k from
# count(*), so the driver-checked plan IS the scale-safe one.
TARGET_CLUSTER = 500


def _resolve_k(df: DataFrame, k: int | None) -> int:
    if k is not None:
        return k
    from .similarity import _estimate_rows

    n = _estimate_rows(df)
    return max(8, -(-n // TARGET_CLUSTER))


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


# above this k the chained-when argmin expression tree stops fitting
# whole-stage codegen; the Arrow matrix path takes over
_EXPR_K_MAX = 32


def _matrix_assigner(centroids: list[list[float]]):
    """Arrow-batched nearest-centroid UDF for large k: numpy matrix
    distances chunked to bound memory (rows × cids × dim ≤ ~64 MB per
    block), with EXACT left-fold accumulation (cumsum) and first-index
    tie-breaks — the same semantics as the expression path, asserted
    equal by tests/test_functions.py::test_kmeans_paths_agree."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        import numpy as np

        k, dim = C.shape
        row_chunk = 1024
        # bound the (rows, cids) accumulator to ~32 MB. The distance is
        # accumulated dimension by dimension (acc += dcol²) — the exact
        # left-fold order (identical to cumsum(..., axis=-1)[..., -1],
        # the engine-parity contract) — with per-step temporaries of
        # rows × cids × 8 B instead of a rows × cids × dim 'diff' cube:
        # the 64-128 MB cube allocations per block measured as
        # minute-scale memory-compaction stalls on a loaded host.
        cid_chunk = max(1, (32 << 20) // (8 * row_chunk))
        out = np.empty(len(vs), dtype=np.int32)
        P = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        for r0 in range(0, len(P), row_chunk):
            p = P[r0 : r0 + row_chunk]
            best_d = np.full(len(p), np.inf)
            best_c = np.zeros(len(p), dtype=np.int32)
            for c0 in range(0, k, cid_chunk):
                c = C[c0 : c0 + cid_chunk]
                d = np.zeros((len(p), len(c)))
                for j in range(dim):  # exact left fold over dimensions
                    dcol = p[:, j, None] - c[None, :, j]
                    d += dcol * dcol
                cand = d.argmin(axis=1)  # first index on ties
                cand_d = d[np.arange(len(p)), cand]
                upd = cand_d < best_d  # strict: earlier cid chunk keeps ties
                best_d[upd] = cand_d[upd]
                best_c[upd] = cand[upd] + c0
            out[r0 : r0 + len(p)] = best_c
        return pd.Series(out)

    return _assign


def _assign_col(vec: Column, centroids: list[list[float]], mode: str | None = None) -> Column:
    use_expr = len(centroids) <= _EXPR_K_MAX if mode is None else mode == "expr"
    if use_expr:
        return _argmin_cluster(vec, centroids)
    return _matrix_assigner(centroids)(vec)


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int | None = None,
    iters: int = 2,
    assign_mode: str | None = None,
    keep_vec: bool = False,
) -> DataFrame:
    """Deterministic k-means: seeds = the k smallest-id vectors (cluster
    j = rank of its seed id), ``iters`` assignment passes with
    ``iters - 1`` centroid recomputes in between. Returns
    (id_col, cluster).

    ``k=None`` (the engine default) resolves to the auto policy —
    ceil(n / TARGET_CLUSTER) clusters, floor 8, from parquet-footer
    metadata — so cluster SIZE stays constant as the corpus grows.
    Assignment is the codegen expression argmin for k ≤ 32 and the
    Arrow matrix path beyond (identical semantics, tested equal).
    Centroid recompute is posexplode → partial-agg avg per
    (cluster, dim) → O(k·dim) driver collect, rounded to 1e-6 for
    engine-stable replay. Empty clusters keep their previous centroid.
    """
    k = _resolve_k(df, k)
    from .similarity import ensure_parallelism

    # small corpora read as 1-2 parquet splits would run every n·k
    # assignment pass on 1-2 tasks; no-op at real scale
    pts = ensure_parallelism(df).select(
        F.col(id_col).alias("_kid"),
        F.col(vec_col).cast("array<double>").alias("_kv"),
    )
    seed_rows = pts.orderBy("_kid").limit(k).collect()  # O(k·dim), bounded
    centroids = [list(r._kv) for r in seed_rows]
    dim = len(centroids[0])
    for _ in range(max(0, iters - 1)):
        assigned = pts.withColumn("cluster", _assign_col(F.col("_kv"), centroids, assign_mode))
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
    cols = [F.col("_kid").alias(id_col)]
    if keep_vec:
        # consumers that need (id, vec, cluster) together — SemDeDup's
        # pair scan — get the vector for free from the same projection
        # instead of re-joining the corpus on id (two shuffles + sort
        # of every vector at 100 TB)
        cols.append(F.col("_kv").alias(vec_col))
    return pts.select(
        *cols,
        _assign_col(F.col("_kv"), centroids, assign_mode).alias("cluster"),
    )


def _cluster_dup_fn(tau: float, tile: int = 2048):
    """Per-subgroup duplicate-evidence scorer: for every row, the MAX
    exact-fold cosine over LOWER-id partners in the subgroup (rows with
    no qualifying partner above the ``tau - 1e-6`` margin emit
    nothing). round(·, 6) is monotone, so ``round(max) >= tau`` iff
    some partner's rounded cosine clears tau — the JVM-side rounded
    filter still decides the boundary bit-identically, but the UDF
    output is O(rows), not O(pairs): a c-member identical-vector clique
    emits c rows instead of C(c, 2) ≈ c²/2 (2×10⁸ at the 20k skew
    rehearsal). Subgroups are the salted (cluster, ti, tj) tile pairs
    of :func:`semdedup`: a diagonal subgroup scores its id-sorted upper
    triangle; an off-diagonal one crosses its two tiles both ways."""

    def dup_evidence(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from .similarity import _fold_dots

        empty = pd.DataFrame({"id": [], "score": []})
        if len(pdf) < 2:
            return empty
        ti, tj = int(pdf["ti"].iat[0]), int(pdf["tj"].iat[0])
        out_i, out_s = [], []

        def emit(ids_side, S, mask):
            # per-column max over qualifying lower-id partners
            masked = np.where(mask, S, -np.inf)
            best = masked.max(axis=0)
            ok = best >= tau - 1e-6
            if ok.any():
                out_i.append(ids_side[ok])
                out_s.append(best[ok])

        def safe_norm(M):
            # a zero-norm vector would make its cosine 0/0 = NaN, and the
            # per-COLUMN max below propagates NaN over every partner the
            # zero row masks — suppressing genuine dup evidence in the
            # whole tile block (the per-pair JVM predicate this kernel
            # replaced was immune: NaN >= tau is just False). Substitute
            # norm 1.0: the dots with a zero vector are already 0, so its
            # cosines become 0 (never >= tau) and other rows are exact.
            n = np.sqrt(np.cumsum(M * M, axis=1)[:, -1])
            return np.where(n == 0, 1.0, n)

        if ti == tj:
            V = np.asarray([np.asarray(x) for x in pdf["v"]])
            ids = pdf["id"].to_numpy()
            order = np.argsort(ids, kind="stable")
            V, ids = V[order], ids[order]
            nv = safe_norm(V)
            m = len(ids)
            for i0 in range(0, m, tile):
                i1 = min(i0 + tile, m)
                for j0 in range(i0, m, tile):
                    j1 = min(j0 + tile, m)
                    S = _fold_dots(V[i0:i1], V[j0:j1]) / (
                        nv[i0:i1, None] * nv[None, j0:j1]
                    )
                    emit(ids[j0:j1], S, ids[i0:i1, None] < ids[None, j0:j1])
        else:
            a = pdf[pdf["t"] == ti]
            b = pdf[pdf["t"] == tj]
            if len(a) == 0 or len(b) == 0:
                return empty
            A = np.asarray([np.asarray(x) for x in a["v"]])
            B = np.asarray([np.asarray(x) for x in b["v"]])
            aids = a["id"].to_numpy()
            bids = b["id"].to_numpy()
            na = safe_norm(A)
            nb = safe_norm(B)
            for i0 in range(0, len(aids), tile):  # hash imbalance guard
                i1 = min(i0 + tile, len(aids))
                for j0 in range(0, len(bids), tile):
                    j1 = min(j0 + tile, len(bids))
                    S = _fold_dots(A[i0:i1], B[j0:j1]) / (
                        na[i0:i1, None] * nb[None, j0:j1]
                    )
                    # b-side rows with a lower-id a partner…
                    emit(bids[j0:j1], S, aids[i0:i1, None] < bids[None, j0:j1])
                    # …and a-side rows with a lower-id b partner
                    emit(aids[i0:i1], S.T, bids[j0:j1, None] < aids[None, i0:i1])
        if not out_i:
            return empty
        return pd.DataFrame(
            {"id": np.concatenate(out_i), "score": np.concatenate(out_s)}
        )

    return dup_evidence


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int | None = None,
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

    The pair scan runs as ONE tiled exact-fold "matmul" per cluster
    (applyInPandas — the same kernel contract as embedding_near_dup:
    cumsum left-fold dots, O(tile²) memory, an in-UDF margin pre-filter
    wider than the rounding boundary with the JVM-side rounded filter
    deciding membership bit-identically) instead of a pair-row
    self-join evaluating an interpreted HOF cosine per pair — each
    vector crosses the wire once per cluster, not once per candidate
    pair. Cluster size is pinned ~TARGET_CLUSTER by the auto-k policy;
    the degenerate case (a giant identical-vector cluster) is the
    pathology the docs route to quantized_dedup first.
    """
    from .similarity import ensure_parallelism

    if assignment is None:
        # keep_vec: (id, v, cluster) from one projection — no corpus
        # re-join on id (that join cost two shuffles + a sort of every
        # vector, measured ~20 s of the sf10 wall)
        pts = kmeans(df, vec_col, id_col, k, iters, keep_vec=True).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            "cluster",
        )
    else:
        pts = (
            ensure_parallelism(df)
            .select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
            .join(assignment.withColumnRenamed(id_col, "id"), "id")
        )
    # the assignment DAG (scan + argmin over every centroid) is the
    # expensive stage; without a materialization the pair scan and
    # the final keeper join would each re-execute it — 3× the n·k
    # assignment cost at 100 TB. On a cluster swap for a reliable
    # checkpoint dir.
    pts = pts.localCheckpoint(eager=True)
    # Salt oversized clusters into tile-pair subgroups (the
    # embedding_near_dup pattern): the auto-k policy pins cluster size
    # ~TARGET_CLUSTER, but a degenerate corpus (one tight semantic
    # clique — e.g. a boilerplate asset re-encoded 20k times) collapses
    # into ONE cluster that k-means cannot split, and an unsalted
    # groupBy would run its whole O(c²) pair scan as one task. Each row
    # gets a deterministic tile t = pmod(xxhash64(id), n_tiles) and is
    # replicated once per tile u; the subgroup key (cluster, least(t,u),
    # greatest(t,u)) is a SEPARATE applyInPandas group, so every
    # unordered pair meets in exactly one subgroup and the hot cluster
    # spreads over ~(c/tile)²/2 tasks. Normal clusters (≤ tile rows)
    # take the nt=1 fast path: one subgroup, no replication. Per-pair
    # folds are tile-shape-independent, so the oracle is unchanged.
    tile = 2048
    big = (
        pts.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cluster_n"))
        .filter(F.col("cluster_n") > tile)
    )
    salted = (
        pts.join(big, ["cluster"], "left")
        .withColumn(
            "nt", F.ceil(F.coalesce(F.col("cluster_n"), F.lit(1)) / tile).cast("int")
        )
        .withColumn("t", F.pmod(F.xxhash64("id"), F.col("nt")).cast("int"))
        .select(
            "id",
            "v",
            "cluster",
            "t",
            F.explode(F.sequence(F.lit(0), F.col("nt") - 1)).alias("u"),
        )
        .select(
            "id",
            "v",
            "cluster",
            "t",
            F.least("t", "u").alias("ti"),
            F.greatest("t", "u").alias("tj"),
        )
    )
    evidence = (
        # explicit repartition on the FULL salted key: a (cluster)-
        # partitioned child would satisfy the groupBy's clustering
        # requirement and re-serialize every subgroup of a hot cluster
        # into one task, defeating the salt
        salted.repartition("cluster", "ti", "tj")
        .groupBy("cluster", "ti", "tj")
        .applyInPandas(_cluster_dup_fn(tau), "id long, score double")
    )
    dups = (
        evidence.filter(F.round("score", 6) >= F.lit(tau))
        .select("id")
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
