"""Deterministic sampling/splitting: stability and disjointness."""

from pyspark.sql import functions as F

from nekton_spark.functions.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_val_test_split,
)


class TestHashSample:
    def test_stable_across_repartition(self, spark, tables):
        d = tables["documents"]
        a = sorted(r.doc_id for r in hash_sample(d, "doc_id", 0.2).select("doc_id").collect())
        b = sorted(
            r.doc_id
            for r in hash_sample(d.repartition(7), "doc_id", 0.2).select("doc_id").collect()
        )
        assert a == b and 0 < len(a) < d.count()

    def test_rate_monotone_nesting(self, spark, tables):
        # the 10% sample is a subset of the 20% sample (bucket prefix property)
        d = tables["documents"]
        s10 = {r.doc_id for r in hash_sample(d, "doc_id", 0.1).select("doc_id").collect()}
        s20 = {r.doc_id for r in hash_sample(d, "doc_id", 0.2).select("doc_id").collect()}
        assert s10 <= s20


class TestSplit:
    def test_disjoint_and_exhaustive(self, spark, tables):
        d = tables["documents"]
        out = train_val_test_split(d, "doc_id")
        counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == d.count()
        assert counts["train"] > counts["val"]

    def test_stratified_rates(self, spark, tables):
        d = tables["documents"]
        out = stratified_hash_sample(d, "doc_id", "lang", {"en": 1.0, "de": 0.0})
        langs = {r.lang for r in out.select("lang").distinct().collect()}
        assert langs == {"en"}  # de rate 0, other strata dropped
