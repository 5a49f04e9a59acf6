"""Connected-components unit tests on hand-built graphs."""

from pyspark.sql import functions as F

from nekton_spark.functions.graph import (
    connected_components,
    connected_components_star,
    dedup_components,
)


def cc(spark, n_vertices, edge_list, impl=connected_components):
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], "id long")
    e = spark.createDataFrame(edge_list or [(0, 0)], "id_a long, id_b long")
    if not edge_list:
        e = e.filter("false")
    out = impl(v, e)
    return {r.id: r.component for r in out.collect()}


class TestConnectedComponents:
    def test_chain_collapses_to_min(self, spark):
        # 0-1, 1-2, 2-3 → all component 0; 4 singleton
        got = cc(spark, 5, [(0, 1), (1, 2), (2, 3)])
        assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4}

    def test_two_clusters(self, spark):
        got = cc(spark, 6, [(1, 2), (3, 4), (4, 5)])
        assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 3, 5: 3}

    def test_no_edges_all_singletons(self, spark):
        got = cc(spark, 4, [])
        assert got == {i: i for i in range(4)}

    def test_long_path_needs_multiple_rounds(self, spark):
        n = 12  # diameter 11 → exercises the iteration loop
        got = cc(spark, n, [(i, i + 1) for i in range(n - 1)])
        assert got == {i: 0 for i in range(n)}

    def test_star_equivalent_to_label_propagation(self, spark):
        """large/small-star must produce the identical labeling on
        chains, cliques, merged clusters, singletons, and a
        pseudo-random graph."""
        cases = [
            (5, [(0, 1), (1, 2), (2, 3)]),
            (6, [(1, 2), (3, 4), (4, 5)]),
            (4, []),
            (12, [(i, i + 1) for i in range(11)]),  # diameter 11
            (8, [(0, 1), (1, 2), (0, 2), (5, 6), (6, 7), (3, 7)]),
            # deterministic pseudo-random: edges from a hash recurrence
            (30, [((i * 7) % 30, (i * 13 + 5) % 30) for i in range(25) if (i * 7) % 30 != (i * 13 + 5) % 30]),
        ]
        for n, edges in cases:
            assert cc(spark, n, edges, impl=connected_components_star) == cc(
                spark, n, edges
            ), f"divergence on n={n}, edges={edges}"

    def test_star_long_chain_few_rounds(self, spark):
        """O(log d) convergence: a 40-node path must resolve within
        the default 15-round cap (min-label would need ~39)."""
        n = 40
        got = cc(spark, n, [(i, i + 1) for i in range(n - 1)], impl=connected_components_star)
        assert got == {i: 0 for i in range(n)}

    def test_dedup_components_star_default_matches_label(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        pairs = spark.createDataFrame([(0, 2), (2, 3), (4, 5)], "id_a long, id_b long")
        star = {(r.doc_id, r.component, r.is_representative) for r in dedup_components(docs, pairs).collect()}
        label = {(r.doc_id, r.component, r.is_representative) for r in dedup_components(docs, pairs, algorithm="label").collect()}
        assert star == label

    def test_dedup_components_representatives(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
        pairs = spark.createDataFrame([(0, 2), (2, 3)], "id_a long, id_b long")
        out = {r.doc_id: (r.component, r.is_representative) for r in dedup_components(docs, pairs).collect()}
        assert out == {0: (0, True), 1: (1, True), 2: (0, False), 3: (0, False)}


class TestKeepBestPerComponent:
    def _run(self, spark, rows, pairs):
        from pyspark.sql import functions as F

        from nekton_spark.functions.graph import keep_best_per_component

        docs = spark.createDataFrame(rows, "doc_id long, score double")
        p = spark.createDataFrame(pairs, "id_a long, id_b long")
        return {
            r.doc_id: (r.component, r.quality, r.keep)
            for r in keep_best_per_component(
                docs, p, F.col("score")
            ).collect()
        }

    def test_highest_quality_wins(self, spark):
        out = self._run(
            spark,
            [(0, 0.2), (1, 0.9), (2, 0.5), (3, 0.7)],
            [(0, 1), (1, 2)],
        )
        # cluster {0,1,2}: doc 1 (0.9) survives despite not being min id
        assert out[1] == (0, 0.9, True)
        assert out[0][2] is False and out[2][2] is False
        # singleton keeps itself
        assert out[3] == (3, 0.7, True)

    def test_tie_breaks_to_smaller_id(self, spark):
        out = self._run(spark, [(0, 0.5), (1, 0.5)], [(0, 1)])
        assert out[0][2] is True and out[1][2] is False

    def test_exactly_one_keeper_per_component(self, spark):
        rows = [(i, float((i * 7) % 10) / 10) for i in range(30)]
        pairs = [(i, i + 1) for i in range(0, 28, 2)]  # 14 clusters of 2+
        out = self._run(spark, rows, pairs)
        by_comp: dict = {}
        for doc, (comp, _, keep) in out.items():
            by_comp.setdefault(comp, 0)
            by_comp[comp] += int(keep)
        assert all(v == 1 for v in by_comp.values())
