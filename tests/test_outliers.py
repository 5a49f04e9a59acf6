"""Embedding outlier detection tests (functions/outliers.py):
centroid math, planted-outlier detection, tie ordering, and the
top-k plan shape."""

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.outliers import corpus_centroid, embedding_outliers


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


class TestCentroid:
    def test_grid_centroid(self, spark):
        df = _emb(
            spark,
            [(1, [1.0, 0.0], 0), (2, [3.0, 2.0], 0), (3, [2.0, 4.0], 0)],
        )
        assert corpus_centroid(df, dim=2) == [2.0, 2.0]


class TestOutliers:
    def test_planted_outlier_ranks_first(self, spark):
        rows = [(i, [0.1 * (i % 3), 0.2], 0) for i in range(10)]
        rows.append((99, [50.0, -50.0], 1))
        out = embedding_outliers(_emb(spark, rows), k=3, dim=2).collect()
        assert out[0].vec_id == 99 and out[0].rank == 1
        assert [r.rank for r in out] == [1, 2, 3]

    def test_dist2_hand_computed(self, spark):
        # centroid of [0,0] and [2,2] is [1,1]; both vectors sit at
        # dist2 = 2.0; ties order by vec_id
        df = _emb(spark, [(7, [0.0, 0.0], 0), (3, [2.0, 2.0], 0)])
        out = embedding_outliers(df, k=2, dim=2).collect()
        assert [(r.vec_id, r.dist2, r.rank) for r in out] == [
            (3, 2.0, 1),
            (7, 2.0, 2),
        ]

    def test_k_caps_output(self, spark):
        rows = [(i, [float(i), 0.0], 0) for i in range(30)]
        out = embedding_outliers(_emb(spark, rows), k=5, dim=2).collect()
        assert len(out) == 5
        # ids 0 and 29 tie at (14.5)^2 from the centroid (mean of
        # 0..29 = 14.5); the tie resolves to the smaller id
        assert [r.vec_id for r in out[:2]] == [0, 29]

    def test_topk_plan_no_global_sort(self, spark):
        from nekton_spark import plans

        sf = "/root/testdata/sf0.001"
        e = spark.read.parquet(f"{sf}/embeddings.parquet")
        df = embedding_outliers(e, k=25)
        p = plans.simple_plan(df)
        assert "TakeOrderedAndProject" in p
        assert "CartesianProduct" not in p
        # the only exchange is the 25-row single partition the rank
        # window runs on, never a corpus-wide sort exchange
        assert plans.count_exchanges(df) <= 1


class TestValidationEnvelope:
    """r10 ADVICE hardening: NULL embeddings propagate NULL dist2
    (oracle parity), ragged / over-length embeddings refuse with a
    clear error instead of an opaque numpy TypeError."""

    def test_null_embedding_scores_null(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0], 0), (2, None, 0), (3, [3.0, 0.0], 0)],
            "vec_id long, embedding array<float>, label int",
        )
        out = embedding_outliers(df, k=3, dim=2).collect()
        by_id = {r.vec_id: r.dist2 for r in out}
        assert by_id[2] is None
        # NULL does not perturb the centroid: mean of 1 and 3 is 2
        assert by_id[1] == 1.0 and by_id[3] == 1.0
        # desc nulls-last: the NULL row ranks after every scored row
        assert [r.vec_id for r in sorted(out, key=lambda r: r.rank)][-1] == 2

    def test_overlong_embedding_refused_at_centroid(self, spark):
        df = _emb(spark, [(1, [1.0, 2.0, 3.0], 0)])
        with pytest.raises(ValueError, match="dim=2"):
            corpus_centroid(df, dim=2)

    def test_ragged_embedding_refused_in_scoring(self, spark):
        df = _emb(spark, [(1, [1.0, 0.0], 0), (2, [1.0], 0)])
        with pytest.raises(Exception, match="lengths must be uniform"):
            embedding_outliers(df, k=2, dim=2).collect()
