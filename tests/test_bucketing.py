"""Bucketed-table co-located join: the shuffle-elimination story for
repeated joins on the same key at 100 TB (SURVEY §7 phase 5).

Writing both sides bucketed by the join key lets Spark plan a
sort-merge join with ZERO exchanges — the bucketing IS the shuffle,
paid once at write time and amortized over every subsequent join.
"""

import pytest

from nekton_spark import plans


class TestBucketedJoin:
    @pytest.fixture(scope="class")
    def bucketed_tables(self, spark, sf_dir, tmp_path_factory):
        wh = tmp_path_factory.mktemp("warehouse")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(wh / "orders_b"))
            .mode("overwrite")
            .saveAsTable("orders_b")
        )
        (
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(wh / "lineitem_b"))
            .mode("overwrite")
            .saveAsTable("lineitem_b")
        )
        yield "orders_b", "lineitem_b"
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")

    def test_bucketed_join_has_no_exchange(self, spark, bucketed_tables):
        o, l = bucketed_tables
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        try:
            joined = spark.table(l).join(spark.table(o), "o_orderkey")
            assert plans.count_exchanges(joined) == 0
            plan = plans.simple_plan(joined)
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_bucketed_join_correct(self, spark, sf_dir, bucketed_tables):
        o, l = bucketed_tables
        joined_n = spark.table(l).join(spark.table(o), "o_orderkey").count()
        plain = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .withColumnRenamed("l_orderkey", "o_orderkey")
            .join(spark.read.parquet(f"{sf_dir}/orders.parquet"), "o_orderkey")
            .count()
        )
        assert joined_n == plain

    def test_bucketed_groupby_has_no_exchange(self, spark, bucketed_tables):
        from pyspark.sql import functions as F

        _, l = bucketed_tables
        agg = spark.table(l).groupBy("o_orderkey").agg(F.sum("l_quantity"))
        assert plans.count_exchanges(agg) == 0
