"""Distributed PCA over embedding columns (deterministic, oracle-replayable).

Principal components for embedding analytics — drift axes, whitening
before quantized dedup, low-rank visualization of a curation corpus.
The 100 TB shape is single-pass co-moment accumulation:

  pass 1  mean + Gramian     — ONE Arrow pass; each batch emits its
                               partial (count, Σx, Σxxᵀ), summed by a
                               fixed-size groupBy (1+d+d² cells, like
                               sketches.py: bounded shuffle at any n);
                               G = E[xxᵀ] − m·mᵀ
  driver  eigenvectors       — fixed-iteration power method on the
                               d×d INTEGER-micro matrix (O(d²·iters))
  pass 3  projection         — codegen'd expression, map-only

MLlib's PCA/SVD is float-order nondeterministic and not replayable in
SQL; this one is engine-exact by the repo's conventions (SURVEY §6) —
with a twist the float conventions alone can't deliver: with the
constant start vector 1/8, matvec sums of 1e-6-grid values land
EXACTLY on .5 rounding boundaries (probability 1/8 per component, not
measure-zero), where float representation noise decides the direction
per engine. So, following the integer-milli precedent of
classifier_score/langid_model, the ENTIRE power method runs in int64
micro-units: Gramian cells and iterates are integers (value·1e6),
matvec sums and norms are exact integer arithmetic, and the only
float steps are one IEEE sqrt of an integer (exactly rounded,
identical in every engine) and the final division — whose half-up
rounding can only tie if sqrt returns a rational, i.e. measure-zero.
Fixed 12 iterations from v=125000µ (convergence is not the contract,
the replayed arithmetic is); sign fixed by the first
largest-|component| entry; PC2 by one integer deflation. The DuckDB
oracle replays all of it from the raw table — no shipped constants.

The reference engine (byte-stream pipeline, src/processors.rs) has no
vector math; this extends the embedding-curation layer of SURVEY §2.5.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_ITERS = 12
MICRO = 1_000_000
PCA_START_SALT = 5300


def pca_start_component(j: int) -> int:
    """Power-method start vector component j: 50000 +
    hash60(j, PCA_START_SALT) % 150001 micro-units ∈ [0.05, 0.2] —
    deterministic, content-addressed, SQL-replayable (the oracle
    embeds the identical md5 fragment), and with no structured null
    space (see _power_iteration_micro)."""
    from nekton_spark.functions.hashing import hash60_py

    return 50000 + hash60_py(str(j), PCA_START_SALT) % 150001


def _round6(x: float) -> float:
    """HALF_UP at 1e-6 on the exact binary value — agrees with DuckDB
    round(DOUBLE, 6) (verified over 200k random doubles) and with the
    F.round the engine applies to its own aggregates."""
    return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _micro(x: float) -> int:
    """HALF_UP integer of x·1e6, with the scaling done in DOUBLE first
    (x * 1e6) so it is the same arithmetic DuckDB's
    round(expr * 1000000, 0)::BIGINT performs."""
    return int(Decimal(x * 1e6).quantize(Decimal("1"), ROUND_HALF_UP))


def _div_half_up(s: int, q: int) -> int:
    """Exact integer division with HALF_UP (away-from-zero) ties —
    the SQL twin is the sign-split (|s| + q/2) // q CASE."""
    if s >= 0:
        return (s + q // 2) // q
    return -((-s + q // 2) // q)


def _moments_micro(
    df: DataFrame, vec_col: str, dim: int
) -> tuple[list[float], list[list[int]]]:
    """ONE Arrow pass over the corpus → (grid-rounded mean, Gramian in
    int64 micro-units) via the co-moment identity
    G = E[xxᵀ] − m·mᵀ. Each batch contributes ONE partial
    (count, Σx, ΣxxᵀT) — 1+d+d² rows — so the shuffle is
    O(batches · d²) regardless of n and the final collect is d²+d+1
    rows. Pre-round partials differ from a serial sum by ~1e-13, and
    the co-moment cancellation adds ~1e-14 on O(1)-scaled data — both
    absorbed by the terminal micro/1e-6 rounding (raw float averages
    sit on a .5 boundary with probability 0), the same tolerance
    contract as the k-means rounded means."""
    import numpy as np
    import pandas as pd

    from nekton_spark.functions.similarity import (
        VEC_BYTES_PER_SLICE,
        ensure_parallelism,
    )

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            s = np.concatenate(
                ([float(len(pdf))], X.sum(axis=0), (X.T @ X).ravel())
            )
            yield pd.DataFrame(
                {"idx": np.arange(-1, dim + dim * dim, dtype=np.int64), "s": s}
            )

    cells = (
        ensure_parallelism(
            df.select(F.col(vec_col).alias("v")), VEC_BYTES_PER_SLICE
        )
        .mapInPandas(partials, "idx long, s double")
        .groupBy("idx")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    acc = {r.idx: r.s for r in cells}
    if -1 not in acc:
        raise ValueError(
            "pca: input has no rows (the co-moment pass saw no batches)"
        )
    n = acc.pop(-1)
    m_raw = [acc.get(j, 0.0) / n for j in range(dim)]
    mu = [_round6(m) for m in m_raw]
    G = [
        [
            _micro(
                acc.get(dim + j * dim + k, 0.0) / n - m_raw[j] * m_raw[k]
            )
            for k in range(dim)
        ]
        for j in range(dim)
    ]
    return mu, G


def _matvec_micro(G: list[list[int]], v: list[int]) -> list[int]:
    """w = HALF_UP(G·v / 1e6), all int64-exact (|G|≤~1e6, |v|≤~2e6,
    d=64 → sums < 2^48)."""
    return [
        _div_half_up(sum(gk * vk for gk, vk in zip(row, v)), MICRO)
        for row in G
    ]


def _power_iteration_micro(
    G: list[list[int]], iters: int = PCA_ITERS
) -> tuple[list[int], int]:
    """Fixed-iteration power method in micro-units. Start vector =
    50000 + hash60(j, PCA_START_SALT) % 150001 per component — a
    deterministic pseudo-random direction that the oracle replays with
    the same md5 fragment. NOT the constant vector the first cut used:
    a constant start lies exactly in the Gramian's null space whenever
    per-row component sums are constant (softmax/probability
    embeddings, exactly anti-correlated dims — HALF_UP is
    sign-symmetric, so those null rows stay EXACTLY zero in micro
    units), which silently returned the start vector with eigenvalue 0
    instead of the true PC. A hash-random direction has no structured
    null space to fall into (and the all-zero-Gramian corpus keeps the
    documented keep-previous-iterate contract). Normalization:
    v = HALF_UP(w·1e6 / sqrt(Σw²)) — Σw² is an exact integer, its
    IEEE sqrt is exactly rounded (bit-identical in every engine), and
    w·1e6 < 2^53 stays exact in the double division. Zero norm (the
    all-identical-vector corpus) keeps the previous iterate — stable,
    replayed by the oracle's CASE. Sign: the FIRST
    largest-|component| entry is made positive. Returns
    (eigenvector µ, Rayleigh eigenvalue µ)."""
    d = len(G)
    v = [pca_start_component(j) for j in range(d)]
    for _ in range(iters):
        w = _matvec_micro(G, v)
        q = sum(wj * wj for wj in w)
        if q != 0:
            s = math.sqrt(q)
            v = [
                int(
                    Decimal(wj * 1e6 / s).quantize(
                        Decimal("1"), ROUND_HALF_UP
                    )
                )
                for wj in w
            ]
    jbest = 0
    for j in range(1, d):
        if abs(v[j]) > abs(v[jbest]):
            jbest = j
    if v[jbest] < 0:
        v = [-x for x in v]
    u = _matvec_micro(G, v)
    lam = _div_half_up(sum(vj * uj for vj, uj in zip(v, u)), MICRO)
    return v, lam


def _deflate_micro(
    G: list[list[int]], lam: int, v: list[int]
) -> list[list[int]]:
    """G' = G − HALF_UP(λ v vᵀ / 1e12), exact int64 (|λ·v_j·v_k| ≤
    ~1e6·2e6·2e6 = 4e18 < 2^63)."""
    d = len(G)
    return [
        [
            G[j][k] - _div_half_up(lam * v[j] * v[k], MICRO * MICRO)
            for k in range(d)
        ]
        for j in range(d)
    ]


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 2,
    iters: int = PCA_ITERS,
) -> tuple[list[float], list[list[float]], list[float]]:
    """(mean, [component vectors], [eigenvalues]) — the trained model,
    micro-integers divided back to floats (v_µ/1e6: the identical
    IEEE division the oracle performs). Driver math is
    O(d²·(iters+n_components)); nothing data-sized ever reaches the
    driver."""
    mu, G = _moments_micro(df, vec_col, dim)
    comps, lams = [], []
    for _ in range(n_components):
        v, lam = _power_iteration_micro(G, iters)
        comps.append([x / MICRO for x in v])
        lams.append(lam / MICRO)
        G = _deflate_micro(G, lam, v)
    return mu, comps, lams


def embedding_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_components: int = 2,
    iters: int = PCA_ITERS,
) -> DataFrame:
    """Project every embedding onto the top principal components:
    (id, pc1, pc2, ...). The projection is a single map-only codegen'd
    expression — mean and components enter as literals (O(d) each),
    left-chained additions; the terminal round(…, 6) absorbs the
    engines' accumulation-order difference (raw-float sums, no grid
    boundary)."""
    from nekton_spark.functions.similarity import _sql_double

    mu, comps, _ = pca_components(df, vec_col, dim, n_components, iters)
    cols = [F.col(id_col)]
    # each component renders as ONE SQL fragment parsed in ONE py4j
    # call (r15 opt — the per-literal Column build cost ~4 gateway
    # round-trips per term, ~1.6 s of driver time per projection at
    # d=64). `a + b + c` parses left-associative, so the parsed tree
    # is the identical left-chained Add over
    # (CAST(v[j] AS DOUBLE) - mu_j) * c_j terms, and _sql_double
    # literals round-trip bit-exactly.
    for p, v in enumerate(comps, start=1):
        chain = " + ".join(
            f"((CAST({vec_col}[{j}] AS DOUBLE) - {_sql_double(mu[j])})"
            f" * {_sql_double(v[j])})"
            for j in range(dim)
        )
        cols.append(F.expr(f"round({chain}, 6)").alias(f"pc{p}"))
    return df.select(*cols)
