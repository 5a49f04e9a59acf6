"""Count-Min Sketch heavy hitters (functions/sketches.py).

The driver oracle (heavy_hitters_cms) checks the full-width sketch
exactly; these tests force the regime the small synthetic vocabulary
cannot reach — hash collisions at tiny widths — and pin the sketch
contracts: never-undercount, exactness when collision-free, cell-wise
mergeability, and the NULL-text convention."""

import pytest
from pyspark.sql import functions as F

from nekton_spark.functions.sketches import (
    CMS_DEPTH,
    cms_estimate,
    cms_heavy_hitters,
    cms_sketch,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    # 60 distinct tokens with distinct frequencies 1..60 — wide enough
    # that width=8 must collide (60 tokens into 8 buckets per row).
    rows = [
        (i, " ".join(f"tok{j:02d}" for j in range(i, 60)))
        for i in range(60)
    ]
    return _docs(spark, rows)


class TestCountMinSketch:
    def test_never_undercounts_and_exact_when_wide(self, spark, corpus):
        # width=8: collisions guaranteed -> est >= true, some strictly.
        narrow = cms_heavy_hitters(corpus, k=60, width=8).collect()
        assert all(r.est_n >= r.true_n for r in narrow)
        assert any(r.est_n > r.true_n for r in narrow)
        # width=4096 over 60 tokens: collision-free w.h.p. for this
        # fixed vocabulary -> est == true everywhere and ranks equal
        # the exact frequency ranks (tok00 seen 1..60 times).
        wide = cms_heavy_hitters(corpus, k=60, width=4096).collect()
        assert all(r.est_n == r.true_n for r in wide)
        truth = {f"tok{j:02d}": j + 1 for j in range(60)}
        assert {r.token: r.true_n for r in wide} == truth

    def test_rank_contract(self, spark, corpus):
        out = cms_heavy_hitters(corpus, k=10, width=4096).collect()
        assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(
            range(1, 11)
        )
        ordered = sorted(out, key=lambda r: r.rank)
        for a, b in zip(ordered, ordered[1:]):
            assert (a.est_n, b.token) > (b.est_n, a.token) or (
                a.est_n == b.est_n and a.token < b.token
            ) or a.est_n > b.est_n

    def test_sketch_merges_cellwise(self, spark, corpus):
        """sketch(A union B) == cell-wise sum of sketch(A), sketch(B) —
        the property that lets 1000 executors sketch independently and
        merge O(cells) partials."""
        a = corpus.where("doc_id < 30")
        b = corpus.where("doc_id >= 30")
        whole = {
            (r.r, r.bucket): r.n for r in cms_sketch(corpus, width=64).collect()
        }
        merged: dict = {}
        for part in (a, b):
            for r in cms_sketch(part, width=64).collect():
                merged[(r.r, r.bucket)] = merged.get((r.r, r.bucket), 0) + r.n
        assert whole == merged

    def test_estimate_candidate_not_in_corpus(self, spark, corpus):
        """A candidate token the corpus never contained still gets a
        (possibly >0 under collisions, 0 when wide) estimate — the
        sketch answers any probe."""
        sketch = cms_sketch(corpus, width=4096)
        cand = spark.createDataFrame([("never-seen",)], "token string")
        [row] = cms_estimate(cand, sketch, width=4096).collect()
        assert row.est_n == 0

    def test_null_and_empty_text(self, spark):
        df = _docs(spark, [(0, None), (1, "   "), (2, "x x y")])
        out = cms_heavy_hitters(df, k=10, width=64).collect()
        assert {r.token: r.true_n for r in out} == {"x": 2, "y": 1}
        assert all(r.est_n >= r.true_n for r in out)

    def test_depth_rows_all_present(self, spark, corpus):
        rows = {r.r for r in cms_sketch(corpus, width=64).collect()}
        assert rows == set(range(CMS_DEPTH))


class TestKMVDistinct:
    def test_exact_below_k(self, spark):
        """Fewer distinct values than k: the sketch saw everything and
        the estimate IS the exact count."""
        from nekton_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame(
            [(i % 40,) for i in range(500)], "v long"
        )
        [row] = kmv_distinct(df, "v", k=256).collect()
        assert row.est_distinct == 40 and row.sketch_size == 40

    def test_estimator_accuracy_above_k(self, spark):
        """10k distinct values through a k=256 sketch: the estimate
        must land within the ~3/sqrt(k) ≈ 19% band (deterministic
        corpus, so this is a fixed value, not a flaky bound)."""
        from nekton_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame(
            [(i,) for i in range(10_000)], "v long"
        )
        [row] = kmv_distinct(df, "v", k=256).collect()
        assert row.sketch_size == 256
        assert abs(row.est_distinct - 10_000) < 1900

    def test_groups_and_duplicates_ignored(self, spark):
        """Duplicates don't move the estimate (distinct semantics) and
        groups are independent."""
        from nekton_spark.functions.sketches import kmv_distinct

        base = [("a", i) for i in range(30)] + [("b", i) for i in range(7)]
        df1 = spark.createDataFrame(base, "g string, v long")
        df2 = spark.createDataFrame(base * 5, "g string, v long")
        r1 = {r.g: r.est_distinct for r in kmv_distinct(df1, "v", ["g"]).collect()}
        r2 = {r.g: r.est_distinct for r in kmv_distinct(df2, "v", ["g"]).collect()}
        assert r1 == r2 == {"a": 30, "b": 7}

    def test_partial_pass_bounds_rows(self, spark):
        """The Arrow partial emits at most k rows per (batch, group) —
        with one group and k=16 the post-partial distinct holds ≤
        batches·16 rows, and the final sketch is exactly 16."""
        from nekton_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame([(i,) for i in range(5000)], "v long")
        [row] = kmv_distinct(df, "v", k=16).collect()
        assert row.sketch_size == 16
        # estimator still in a sane band even at tiny k
        assert 2000 < row.est_distinct < 12000
