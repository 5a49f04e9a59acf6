"""Kafka source/sink option plumbing (no broker/connector jar in this
image — these tests pin the config translation and the failure mode)."""

import pytest

from pyspark.sql import functions as F

from nekton_spark.sources.kafka import _apply_config


class _FakeReader:
    def __init__(self):
        self.opts = {}

    def option(self, k, v):
        self.opts[k] = v
        return self


class TestConfigTranslation:
    def test_bare_keys_get_kafka_prefix(self):
        r = _apply_config(_FakeReader(), {"bootstrap.servers": "h:9092", "group.id": "g"})
        assert r.opts == {"kafka.bootstrap.servers": "h:9092", "kafka.group.id": "g"}

    def test_prefixed_keys_pass_through(self):
        r = _apply_config(_FakeReader(), {"kafka.security.protocol": "SSL"})
        assert r.opts == {"kafka.security.protocol": "SSL"}


class TestMissingConnector:
    def test_kafka_source_fails_with_clear_error(self, spark):
        from nekton_spark.sources.kafka import kafka_source

        with pytest.raises(Exception, match="[Kk]afka|DATA_SOURCE"):
            kafka_source(
                spark, topics=["t"], config={"bootstrap.servers": "localhost:9092"}
            ).collect()

    def test_kafka_sink_key_selection_logic(self, spark):
        """The key = metadata['partition_key'] else '0' projection
        (reference src/kafka.rs:133) — testable without a broker."""
        df = spark.createDataFrame(
            [(1, 0, "v1", {"partition_key": "k1"}), (2, 0, "v2", None)],
            "batch_id long, msg_idx long, value string, metadata map<string,string>",
        )
        out = df.select(
            F.coalesce(F.col("metadata").getItem("partition_key"), F.lit("0")).alias("key"),
            F.col("value").cast("string").alias("value"),
        )
        rows = {r.value: r.key for r in out.collect()}
        assert rows == {"v1": "k1", "v2": "0"}
