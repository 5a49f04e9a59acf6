"""Kafka source/sink (reference ``src/kafka.rs``).

Reference semantics reproduced:

- KafkaIn subscribes to topics, each record → one single-message batch
  (``src/kafka.rs:78-84``), offset sync-committed only after the full
  pipeline + sink completes (``:84-86``) ⇒ at-least-once. Spark's
  Structured Streaming checkpoint protocol is *exactly* this contract:
  offsets are written to the offset log before processing and to the
  commit log after the sink epoch succeeds, so a crash replays the
  uncommitted epoch — at-least-once, upgradeable to exactly-once with
  idempotent/transactional sinks, strictly stronger than the reference.
- KafkaOut keys each record by message metadata ``partition_key``
  defaulting to ``"0"`` (``src/kafka.rs:133``).

- ``consume_count`` (the reference's bounded-read test hook,
  ``src/kafka.rs:87-92``) maps to ``max_offsets_per_trigger``: the
  Structured-Streaming-native bound (records per micro-batch rather
  than per run).

The kafka connector jar (spark-sql-kafka) is not bundled in this
image, so the ``"kafka"`` provider surfaces a classpath error if
constructed here; the full source→pipeline→sink round trip (and the
negative test) run against the ``"fakekafka"`` provider — a
file-backed broker double with the connector's exact wire schema and
option surface (see sources/fakekafka.py). Both providers exercise
the SAME projection/option plumbing below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register_sink, register_source


def _apply_config(reader, config: dict[str, str] | None, prefix: bool = True):
    # reference passes librdkafka config verbatim (src/kafka.rs:44-46);
    # we pass kafka.* options verbatim to the Spark connector. The fake
    # provider takes its options unprefixed (broker_dir etc.).
    for k, v in (config or {}).items():
        key = k if (not prefix or k.startswith("kafka.")) else f"kafka.{k}"
        reader = reader.option(key, v)
    return reader


@register_source("kafka")
def kafka_source(
    spark: SparkSession,
    topics: list[str] | str,
    config: dict[str, str] | None = None,
    stream: bool = True,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    provider: str = "kafka",
) -> DataFrame:
    subscribe = ",".join(topics) if isinstance(topics, list) else topics
    reader = (spark.readStream if stream else spark.read).format(provider)
    reader = reader.option("subscribe", subscribe).option("startingOffsets", starting_offsets)
    if max_offsets_per_trigger is not None:
        # consume_count analog (src/kafka.rs:87-92): bound the read
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    reader = _apply_config(reader, config, prefix=provider == "kafka")
    df = reader.load()
    # record payload → message value; batch id packs a 23-bit hash of
    # (topic, partition) above the 40-bit offset. The hash term keeps
    # multi-topic subscriptions collision-free (a bare partition*2^40
    # made (topicA, p0, o7) and (topicB, p0, o7) the SAME batch — a
    # downstream `process` would pipe both payloads as one frame) while
    # preserving offset order WITHIN each topic-partition — the only
    # order Kafka defines anyway. Caps, documented: offsets ≥ 2^40
    # (~1.1e12/partition) wrap into the hash bits; cross-(topic,
    # partition) id collisions are ~2^-23 per pair.
    tp_hash = F.pmod(
        F.xxhash64(
            F.concat_ws(":", F.col("topic"), F.col("partition").cast("string"))
        ),
        F.lit(1 << 23),
    ).cast("long")
    return df.select(
        (tp_hash * F.lit(2**40) + F.pmod(F.col("offset"), F.lit(2**40))).alias("batch_id"),
        F.lit(0).cast("long").alias("msg_idx"),
        F.col("value").cast("string").alias("value"),
        F.create_map(F.lit("partition_key"), F.col("key").cast("string")).alias("metadata"),
    )


@register_sink("kafka")
def kafka_sink(
    df: DataFrame,
    topic: str,
    config: dict[str, str] | None = None,
    checkpoint: str | None = None,
    provider: str = "kafka",
):
    """Key from metadata['partition_key'] else "0" (src/kafka.rs:133)."""
    out = df.select(
        F.coalesce(F.col("metadata").getItem("partition_key"), F.lit("0")).alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    prefix = provider == "kafka"
    if out.isStreaming:
        writer = out.writeStream.format(provider).option("topic", topic)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        writer = _apply_config(writer, config, prefix=prefix)
        return writer.start()
    writer = _apply_config(
        out.write.format(provider).option("topic", topic), config, prefix=prefix
    )
    writer.save()
    return None
