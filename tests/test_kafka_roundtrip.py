"""Kafka round-trip integration tests against the fakekafka provider.

Replicates the reference's real-broker integration suite as closely as
this image allows (no broker binary, no spark-sql-kafka jar):

- produce → pipeline → consume, assert payload + key equality
  (src/kafka.rs:203-215)
- negative: a consumer on a different topic sees nothing
  (src/kafka.rs:217-227)
- bounded read: maxOffsetsPerTrigger caps records per micro-batch —
  the consume_count analog (src/kafka.rs:87-92)

kafka_source/kafka_sink run their REAL projection and option plumbing;
only format("kafka") is swapped for format("fakekafka"), a file-backed
broker double with the connector's wire schema (sources/fakekafka.py).
"""

import pytest

from nekton_spark.sources.fakekafka import FakeBroker, register
from nekton_spark.sources.kafka import kafka_sink, kafka_source


@pytest.fixture()
def broker(spark, tmp_path):
    register(spark)
    return FakeBroker(str(tmp_path / "broker"))


class TestRoundTrip:
    def test_produce_pipeline_consume_preserves_payload_and_key(
        self, spark, broker, tmp_path
    ):
        """src/kafka.rs:203-215: messages produced to the input topic
        come out of the output topic transformed, with keys intact."""
        from nekton_spark.operators.text import replace

        for i in range(4):
            broker.produce("in", f"k{i}".encode(), f"cheese {i}".encode())

        src = kafka_source(
            spark, "in", config={"broker_dir": broker.root}, provider="fakekafka"
        )
        piped = replace(src, from_="cheese", to="bacon")
        q = kafka_sink(
            piped,
            topic="out",
            config={"broker_dir": broker.root},
            checkpoint=str(tmp_path / "ckpt"),
            provider="fakekafka",
        )
        q.processAllAvailable()
        q.stop()

        got = []
        for p in range(broker.n_partitions):
            for _off, key, value, _ts in broker.read("out", p, 0, broker.next_offset("out", p)):
                got.append((key.decode(), value.decode()))
        # the source maps the kafka key to metadata['partition_key'],
        # the sink keys the outgoing record from it (src/kafka.rs:133)
        assert sorted(got) == [(f"k{i}", f"bacon {i}") for i in range(4)]

    def test_other_topic_sees_nothing(self, spark, broker):
        """src/kafka.rs:217-227: a consumer on a topic nobody produced
        to receives no messages."""
        broker.produce("in", b"k", b"v")
        src = kafka_source(
            spark,
            "unrelated",
            config={"broker_dir": broker.root},
            provider="fakekafka",
            stream=False,
        )
        assert src.count() == 0

    def test_batch_read_sees_all_partitions(self, spark, broker):
        for i in range(10):
            broker.produce("t", f"k{i}".encode(), f"v{i}".encode())
        # keys spread over partitions; batch read must union them all
        src = kafka_source(
            spark, "t", config={"broker_dir": broker.root}, provider="fakekafka", stream=False
        )
        vals = sorted(r.value for r in src.collect())
        assert vals == sorted(f"v{i}" for i in range(10))
        parts = {p for p in range(broker.n_partitions) if broker.next_offset("t", p) > 0}
        assert len(parts) > 1  # the partitioner actually spread the keys

    def test_max_offsets_per_trigger_bounds_micro_batches(self, spark, broker, tmp_path):
        """consume_count analog (src/kafka.rs:87-92): with a cap of 3,
        no micro-batch may read more than 3 records, and the stream
        still drains all 10."""
        for i in range(10):
            broker.produce("t", f"k{i}".encode(), f"v{i}".encode())
        src = kafka_source(
            spark,
            "t",
            config={"broker_dir": broker.root},
            provider="fakekafka",
            max_offsets_per_trigger=3,
        )
        q = (
            src.writeStream.format("memory")
            .queryName("kafka_bounded")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        sizes = [int(p["numInputRows"]) for p in q.recentProgress]
        q.stop()
        got = spark.sql("SELECT value FROM kafka_bounded").collect()
        assert sorted(r.value for r in got) == sorted(f"v{i}" for i in range(10))
        assert sizes and max(sizes) <= 3


class TestMetaCreateRace:
    def test_losing_creator_adopts_stored_count(self, tmp_path, monkeypatch):
        # r10 ADVICE fix: the meta file is created with O_EXCL; a
        # racing first-creator that loses the create re-reads the
        # stored count and goes through the reopen conflict check.
        import os as _os

        from nekton_spark.sources.fakekafka import FakeBroker

        root = str(tmp_path / "race")
        real_exists = _os.path.exists

        def exists_lies_about_meta(p):
            if p.endswith(".n_partitions"):
                return False  # both creators think they are first
            return real_exists(p)

        FakeBroker(root, n_partitions=4)  # winner persisted 4
        monkeypatch.setattr(_os.path, "exists", exists_lies_about_meta)
        # matching count: adopts the stored 4 via the O_EXCL-loser path
        assert FakeBroker(root, n_partitions=4).n_partitions == 4
        # conflicting count: refused, not silently split-brained
        import pytest as _pytest

        with _pytest.raises(ValueError, match="has 4 partitions"):
            FakeBroker(root, n_partitions=2)
