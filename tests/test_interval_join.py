"""Interval join: batch semantics + real stream-stream join with watermarks."""

from pyspark.sql import functions as F

from nekton_spark.operators.timeseries import interval_join


def _events(spark, sf_dir):
    from nekton_spark.sources.files import table_source

    return table_source(spark, sf_dir, "events")


class TestBatchIntervalJoin:
    def test_purchases_preceded_by_clicks(self, spark, sf_dir):
        e = _events(spark, sf_dir)
        purchases = e.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
        clicks = e.filter("event_type = 'click'").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        out = interval_join(
            purchases, clicks, on="ts", by="user_id", upper="interval 30 minutes"
        )
        # every joined click is within [ts-30min, ts] for the same user
        bad = out.filter(
            (F.col("ts_r") > F.col("ts")) | (F.col("ts_r") < F.expr("ts - interval 30 minutes"))
        ).count()
        assert bad == 0
        assert out.count() > 0

    def test_matches_sql_oracle(self, spark, sf_dir):
        import duckdb

        e = _events(spark, sf_dir)
        purchases = e.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
        clicks = e.filter("event_type = 'click'").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        n_spark = interval_join(purchases, clicks, on="ts", by="user_id").count()
        n_duck = duckdb.sql(
            f"""
            SELECT count(*) FROM
              (SELECT event_id, user_id, ts FROM read_parquet('{sf_dir}/events.parquet')
               WHERE event_type = 'purchase') p
            JOIN
              (SELECT event_id, user_id, ts FROM read_parquet('{sf_dir}/events.parquet')
               WHERE event_type = 'click') c
            ON p.user_id = c.user_id
               AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
            """
        ).fetchone()[0]
        assert n_spark == n_duck


class TestStreamStreamJoin:
    def test_watermarked_stream_stream_join(self, spark, sf_dir, tmp_path):
        d = str(tmp_path / "events_stream")
        _events(spark, sf_dir).write.mode("overwrite").parquet(d)
        schema = spark.read.parquet(d).schema

        def stream():
            return spark.readStream.schema(schema).parquet(d)

        purchases = stream().filter("event_type = 'purchase'").select(
            "event_id", "user_id", "ts"
        )
        clicks = stream().filter("event_type = 'click'").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        out = interval_join(
            purchases, clicks, on="ts", by="user_id",
            upper="interval 30 minutes", watermark="1 hour",
        )
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("ssjoin_out")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n_stream = spark.sql("SELECT count(*) FROM ssjoin_out").first()[0]
        finally:
            q.stop()
        # batch reference on the same data
        bp = spark.read.parquet(d).filter("event_type = 'purchase'").select(
            "event_id", "user_id", "ts"
        )
        bc = spark.read.parquet(d).filter("event_type = 'click'").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        n_batch = interval_join(bp, bc, on="ts", by="user_id").count()
        assert n_stream == n_batch
