"""MMR diverse top-k tests (functions/similarity.py:mmr_topk —
Carbonell & Goldstein 1998): redundancy penalization, negative-
similarity bonus, lambda extremes, edge sizes, and plan shape."""

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.similarity import brute_force_topk, mmr_topk


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _corpus(spark):
    # query [1,0,0,0]; two near-identical highly-relevant docs (1, 2),
    # one moderately-relevant diverse doc (3), one irrelevant (4)
    return _emb(
        spark,
        [
            (0, [1.0, 0.0, 0.0, 0.0], 0),   # query
            (1, [0.99, 0.14, 0.0, 0.0], 0),
            (2, [0.99, 0.141, 0.0, 0.0], 0),
            (3, [0.7, 0.0, 0.71, 0.0], 0),
            (4, [0.0, 0.0, 0.0, 1.0], 0),
        ],
    )


class TestSelection:
    def test_rank1_is_pure_relevance_and_mmr_equals_score(self, spark):
        c = _corpus(spark)
        out = mmr_topk(
            c, c.filter("vec_id = 0"), k=3, c=4, lam=0.7, dim=4
        ).collect()
        r1 = [r for r in out if r.rank == 1][0]
        assert r1.neighbor_id in (1, 2) and r1.mmr == r1.score

    def test_redundant_twin_demoted(self, spark):
        """Docs 1 and 2 are near-identical: at lam=0.5 the ~1.0
        redundancy penalty pushes the twin to LAST despite its
        near-top relevance — hand-computed order 1, 3, 4, 2
        (at lam=0.7 relevance dominates and the twin stays second,
        which is MMR's dial working, not a bug)."""
        c = _corpus(spark)
        out = sorted(
            mmr_topk(
                c, c.filter("vec_id = 0"), k=4, c=4, lam=0.5, dim=4
            ).collect(),
            key=lambda r: r.rank,
        )
        assert [r.neighbor_id for r in out] == [1, 3, 4, 2]

    def test_lambda_one_is_pure_relevance_order(self, spark):
        c = _corpus(spark)
        q = c.filter("vec_id = 0")
        mmr = sorted(
            mmr_topk(c, q, k=4, c=4, lam=1.0, dim=4).collect(),
            key=lambda r: r.rank,
        )
        brute = sorted(
            brute_force_topk(c, q, k=4, dim=4).collect(),
            key=lambda r: r.rank,
        )
        assert [r.neighbor_id for r in mmr] == [r.neighbor_id for r in brute]

    def test_k_exceeding_candidates_truncates(self, spark):
        c = _corpus(spark)
        out = mmr_topk(
            c, c.filter("vec_id = 0"), k=10, c=3, lam=0.7, dim=4
        ).collect()
        assert sorted(r.rank for r in out) == [1, 2, 3]

    def test_negative_similarity_is_a_bonus(self, spark):
        """A candidate anti-similar to the selected set must score
        ABOVE its lam-scaled relevance (the -inf maxpen fix: a zero
        floor would clamp the bonus away)."""
        c = _emb(
            spark,
            [
                (0, [1.0, 0.0], 0),     # query
                (1, [1.0, 0.1], 0),     # picked first
                (2, [-0.5, 1.0], 0),    # anti-similar to 1
            ],
        )
        out = sorted(
            mmr_topk(c, c.filter("vec_id = 0"), k=2, c=2, lam=0.7, dim=2).collect(),
            key=lambda r: r.rank,
        )
        r2 = out[1]
        assert r2.neighbor_id == 2
        assert r2.mmr > 0.7 * r2.score  # negative penalty term added value


class TestPlan:
    def test_bounded_joins_no_cartesian(self, spark):
        from nekton_spark import plans

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        df = mmr_topk(e, e.filter(F.col("vec_id") < 10), k=5, c=20)
        p = plans.simple_plan(df)
        assert "CartesianProduct" not in p
        assert plans.has_broadcast_join(df)
        assert p.count("FlatMapCoGroupsInPandas") == 1


class TestIdTypes:
    def test_string_ids(self, spark):
        # r10 ADVICE fix: the applyInPandas schema derives id types
        # from the input frames, so string ids work end-to-end
        c = spark.createDataFrame(
            [
                ("q", [1.0, 0.0]),
                ("a", [1.0, 0.1]),
                ("b", [-0.5, 1.0]),
            ],
            "vec_id string, embedding array<float>",
        )
        out = sorted(
            mmr_topk(
                c, c.filter(F.col("vec_id") == "q"), k=2, c=2, lam=0.7, dim=2
            ).collect(),
            key=lambda r: r.rank,
        )
        assert [r.neighbor_id for r in out] == ["a", "b"]
        assert out[0].query_id == "q"
