"""Reliable-checkpoint materialization (nekton_spark/materialize.py).

r9 VERDICT #2: every iterative/multi-consumer operator routes its
lineage cut through ``materialize(df)``, which swaps executor-local
``localCheckpoint`` for a reliable ``checkpoint()`` when a checkpoint
dir is configured (``SPARK_GRAFT_CHECKPOINT_DIR`` env or
``set_checkpoint_dir``). These tests pin (a) the mode switch itself
and (b) bit-identical results in both modes on three representative
operators: MinHash LSH pairs, star-contraction connected components,
and k-means clustering.
"""

import os

import pytest
from pyspark.sql import functions as F

from nekton_spark import materialize as mat

SF = "/root/testdata/sf0.001"


@pytest.fixture
def reliable(tmp_path):
    mat.set_checkpoint_dir(str(tmp_path / "ckpt"))
    yield str(tmp_path / "ckpt")
    mat.set_checkpoint_dir(None)


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


class TestModeSwitch:
    def test_default_is_local(self, spark):
        assert mat.checkpoint_dir() is None
        df = mat.materialize(spark.range(5))
        assert df.count() == 5

    def test_env_var_enables_reliable(self, spark, tmp_path, monkeypatch):
        d = str(tmp_path / "envckpt")
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", d)
        assert mat.checkpoint_dir() == d
        df = mat.materialize(spark.range(7))
        assert df.count() == 7
        # reliable checkpoint actually wrote blocks under the dir
        assert any(os.scandir(d))

    def test_override_beats_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", "/nonexistent/env")
        mat.set_checkpoint_dir(str(tmp_path / "o"))
        try:
            assert mat.checkpoint_dir() == str(tmp_path / "o")
        finally:
            mat.set_checkpoint_dir(None)

    def test_repoint_mid_session(self, spark, tmp_path):
        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        try:
            mat.set_checkpoint_dir(d1)
            mat.materialize(spark.range(3)).count()
            mat.set_checkpoint_dir(d2)
            mat.materialize(spark.range(3)).count()
            assert any(os.scandir(d1)) and any(os.scandir(d2))
        finally:
            mat.set_checkpoint_dir(None)


class TestBitIdenticalResults:
    """Reliable mode changes WHERE blocks live, never their content."""

    def test_minhash_pairs(self, spark, reliable):
        from nekton_spark.functions.dedup import minhash_lsh_pairs

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rel = _collect_sorted(minhash_lsh_pairs(docs, threshold=0.1))
        mat.set_checkpoint_dir(None)
        loc = _collect_sorted(minhash_lsh_pairs(docs, threshold=0.1))
        assert rel == loc and len(rel) > 0

    def test_connected_components(self, spark, reliable):
        from nekton_spark.functions.graph import connected_components_star

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (8, 8), (3, 9), (10, 11)],
            "id_a long, id_b long",
        )
        v = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 5, 6, 8, 9, 10, 11)], "id long"
        )
        rel = _collect_sorted(connected_components_star(v, e))
        mat.set_checkpoint_dir(None)
        loc = _collect_sorted(connected_components_star(v, e))
        assert rel == loc and len(rel) > 0

    def test_kmeans(self, spark, reliable):
        from nekton_spark.functions.clustering import kmeans

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        rel = _collect_sorted(kmeans(emb, k=4, iters=3))
        mat.set_checkpoint_dir(None)
        loc = _collect_sorted(kmeans(emb, k=4, iters=3))
        assert rel == loc and len(rel) > 0
