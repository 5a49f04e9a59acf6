"""Distributed PCA (functions/pca.py).

The driver oracle (embedding_pca) pins cross-engine exactness; these
pin the MATH: recovery of a planted dominant direction, eigenvalue
ordering, deflation orthogonality, the zero-Gramian degenerate path,
and agreement with numpy's dense eigensolver on the same integer
matrix."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.pca import (
    MICRO,
    _div_half_up,
    embedding_pca,
    pca_components,
)

DIM = 16


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def planted(spark):
    """300 vectors = a·u + 0.3·b·w + small isotropic noise: PC1 must
    recover u, PC2 must recover w (deterministic numpy corpus)."""
    rng = np.random.default_rng(11)
    u = np.zeros(DIM)
    u[0], u[3] = 0.8, 0.6  # unit
    w = np.zeros(DIM)
    w[5], w[9] = 0.6, -0.8  # unit, orthogonal to u
    a = rng.normal(0, 2.0, 300)
    b = rng.normal(0, 1.0, 300)
    X = (
        np.outer(a, u)
        + 0.3 * np.outer(b, w)
        + rng.normal(0, 0.01, (300, DIM))
    )
    return X, u, w


class TestPCA:
    def test_recovers_planted_directions(self, spark, planted):
        X, u, w = planted
        mu, comps, lams = pca_components(
            _emb_df(spark, X), dim=DIM, n_components=2
        )
        v1, v2 = np.array(comps[0]), np.array(comps[1])
        assert abs(v1 @ u) / np.linalg.norm(v1) > 0.999
        assert abs(v2 @ w) / np.linalg.norm(v2) > 0.999
        assert lams[0] > lams[1] > 0
        assert abs(v1 @ v2) < 1e-3  # deflation orthogonality

    def test_matches_numpy_eigh(self, spark, planted):
        X, _, _ = planted
        df = _emb_df(spark, X)
        mu, comps, lams = pca_components(df, dim=DIM, n_components=2)
        Xc = X - X.mean(axis=0)
        evals = np.linalg.eigvalsh(Xc.T @ Xc / len(X))
        assert lams[0] == pytest.approx(evals[-1], rel=1e-3)
        assert lams[1] == pytest.approx(evals[-2], rel=1e-2)

    def test_projection_variance_and_shape(self, spark, planted):
        X, _, _ = planted
        out = embedding_pca(_emb_df(spark, X), dim=DIM).collect()
        assert len(out) == len(X)
        pc1 = np.array([r.pc1 for r in out])
        pc2 = np.array([r.pc2 for r in out])
        # projections are centered and PC1 carries more variance
        assert abs(pc1.mean()) < 1e-3
        assert pc1.var() > pc2.var() > 0

    def test_identical_vectors_degenerate(self, spark):
        """All-identical corpus: zero Gramian, the zero-norm branch
        keeps the start iterate, every projection is exactly 0."""
        from nekton_spark.functions.pca import pca_start_component

        X = np.tile(np.arange(DIM, dtype=float) / DIM, (20, 1))
        df = _emb_df(spark, X)
        _, comps, lams = pca_components(df, dim=DIM, n_components=2)
        assert lams == [0.0, 0.0]
        start = [pca_start_component(j) / 1e6 for j in range(DIM)]
        # sign convention may flip the kept start iterate wholesale
        assert comps[0] == start or comps[0] == [-x for x in start]
        out = embedding_pca(df, dim=DIM).collect()
        assert all(r.pc1 == 0.0 and r.pc2 == 0.0 for r in out)

    def test_constant_row_sum_not_null_space_stalled(self, spark):
        """Regression for the constant-start null-space stall: with
        x2 = c - x1 (exactly anti-correlated dims, per-row component
        sums constant — softmax-like data), the Gramian's rows sum to
        0 and the OLD constant start vector was its exact null vector,
        silently returning eigenvalue 0. The hash-random start must
        recover the true PC direction (±[1,-1]/√2 on the first two
        dims) with the true eigenvalue."""
        rng = np.random.RandomState(7)
        x1 = rng.normal(0, 1.0, 200)
        X = np.zeros((200, DIM))
        X[:, 0] = x1
        X[:, 1] = 0.5 - x1
        _, comps, lams = pca_components(_emb_df(spark, X), dim=DIM, n_components=1)
        v = np.array(comps[0])
        v = v / np.linalg.norm(v)
        expect = np.zeros(DIM)
        expect[0], expect[1] = 1 / np.sqrt(2), -1 / np.sqrt(2)
        assert abs(v @ expect) > 0.999
        assert lams[0] == pytest.approx(2 * x1.var(), rel=1e-2)

    def test_deterministic_across_runs(self, spark, planted):
        X, _, _ = planted
        df = _emb_df(spark, X)
        a = pca_components(df, dim=DIM)
        b = pca_components(df, dim=DIM)
        assert a == b

    def test_sign_convention(self, spark, planted):
        """The first largest-|component| entry is positive."""
        X, _, _ = planted
        _, comps, _ = pca_components(_emb_df(spark, X), dim=DIM)
        for v in comps:
            jbest = max(range(DIM), key=lambda j: (abs(v[j]), -j))
            assert v[jbest] > 0

    def test_div_half_up(self):
        assert _div_half_up(1_500_000, MICRO) == 2
        assert _div_half_up(1_499_999, MICRO) == 1
        assert _div_half_up(-1_500_000, MICRO) == -2
        assert _div_half_up(-1_499_999, MICRO) == -1

    def test_projection_plan_map_only(self, spark, planted):
        from nekton_spark import plans

        X, _, _ = planted
        df = embedding_pca(_emb_df(spark, X), dim=DIM)
        p = plans.simple_plan(df)
        assert "Exchange" not in p and "Join" not in p
        assert "pythonudf" not in p.lower()
