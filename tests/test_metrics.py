"""Metrics: streaming listener counters + batch observation.

The reference declares a prometheus dependency it never uses
(reference Cargo.toml:19; SURVEY §2.4) — these tests pin down the
Spark-native realization of that intent.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from nekton_spark import metrics


class TestObserved:
    def test_metrics_ride_the_same_job(self, spark):
        df = spark.range(1000).withColumn("v", F.col("id") * 2)
        df2, obs = metrics.observed(
            df, "ingest", rows=F.count(F.lit(1)), max_v=F.max("v")
        )
        assert df2.count() == 1000
        got = obs.get
        assert got["rows"] == 1000
        assert got["max_v"] == 1998


class TestStreamingListener:
    def test_counters_and_exposition(self, spark, tmp_path):
        listener = metrics.attach(spark)
        try:
            q = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", "500")
                .load()
                .writeStream.format("noop")
                .queryName("metrics_probe")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(processingTime="200 milliseconds")
                .start()
            )
            deadline = time.time() + 30
            while time.time() < deadline:
                snap = listener.snapshot()
                if any(v["rows"] > 0 for v in snap.values()):
                    break
                time.sleep(0.3)
            q.stop()
            snap = listener.snapshot()
            probe = next(v for v in snap.values() if v["name"] == "metrics_probe")
            assert probe["rows"] > 0
            assert probe["batches"] > 0

            text = listener.prometheus_text()
            assert "# TYPE nekton_input_rows_total counter" in text
            assert 'nekton_input_rows_total{query="metrics_probe"}' in text
            assert text.endswith("\n")
        finally:
            spark.streams.removeListener(listener)
