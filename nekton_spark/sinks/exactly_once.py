"""Exactly-once file sink via foreachBatch + epoch-keyed idempotent writes.

The reference's strongest guarantee is at-least-once (Kafka offset
committed after the sink, ``src/kafka.rs:84-86``). Structured
Streaming upgrades this to exactly-once when the sink is idempotent
per epoch: on replay after a crash, the same ``batch_id`` is
delivered again and the write must overwrite, not append.

This sink writes each micro-batch to ``<path>/epoch=<batch_id>/`` with
dynamic partition overwrite — a replayed epoch replaces its own
directory and nothing else. Readers see ``spark.read.parquet(path)``
with ``epoch`` as a normal partition column (prunable).

Scale note: one directory per epoch keeps the commit unit aligned with
the checkpoint; compaction (coalescing old epochs) is an offline
maintenance job, as in any log-structured sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..registry import register_sink


@register_sink("file_exactly_once")
def exactly_once_file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    format: str = "parquet",
    trigger: dict | None = None,
):
    def write_epoch(batch_df: DataFrame, batch_id: int):
        (
            batch_df.write.mode("overwrite")
            .format(format)
            .save(f"{path}/epoch={batch_id}")
        )

    writer = (
        df.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
