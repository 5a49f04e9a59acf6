"""Message-pipeline data model.

The reference's unit of data is a ``Message`` (opaque bytes + string
metadata) inside a ``MessageBatch`` (reference ``src/lib.rs:30-40``).
The Spark-native model is one DataFrame row per message:

    batch_id  BIGINT              -- MessageBatch membership
    msg_idx   BIGINT              -- order within the batch (see below)
    value     STRING              -- Message.data (UTF-8, as the reference
                                     assumes everywhere, src/processors.rs:39)
    metadata  MAP<STRING,STRING>  -- Message.metadata

Ordering contract
-----------------
The reference preserves arrival order through every processor via its
synchronous push loop (``src/lib.rs:84-93``). A distributed engine must
carry order as data, so the contract is: *message order is the
lexicographic order of (batch_id, msg_idx)*. ``msg_idx`` need not be
dense. 1:N operators (splits, selects, subprocess fan-out) refine order
**without a shuffle** by striding: ``child_idx = parent_idx * STRIDE +
position``. This keeps per-operator cost at zero extra exchanges at
100 TB; a dense renumbering (windowed row_number per batch) is applied
only at a sink that needs it, via :func:`renumber`.

STRIDE = 2**20 allows ~1M-way fan-out per operator and ~4 nested 1:N
operators before overflowing int64 — far beyond the reference's
observed pipelines (its deepest example is a single split,
``config_examples/std.yml``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

STRIDE = 2**20

MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("msg_idx", T.LongType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def messages_df(spark: SparkSession, batches: list[list[str]]) -> DataFrame:
    """Build a message DataFrame from a list of batches of string payloads.

    Mirrors the reference test fixture builders (``no_metdata_batches!``,
    reference ``src/lib.rs:185-213``).
    """
    rows = [
        (bi, mi, v, {})
        for bi, batch in enumerate(batches)
        for mi, v in enumerate(batch)
    ]
    return spark.createDataFrame(rows, MESSAGE_SCHEMA)


def from_column(df: DataFrame, value_col: str, batch_col: str | None = None) -> DataFrame:
    """Adapt an arbitrary DataFrame into the message model.

    Each row becomes a one-message batch (exactly how every reference
    source batches: one message per batch, ``src/sources.rs:20-26``).
    ``batch_col`` supplies batch ids; otherwise a monotonic id is used
    (unique per row, assigned partition-locally — no shuffle, no
    driver coordination, safe at any scale). Streaming frames can't use
    monotonically_increasing_id, so they get a 64-bit hash of a uuid —
    unique w.p. 1 - 2^-64 per pair, also coordination-free.
    """
    if batch_col:
        bid = F.col(batch_col).cast("long")
    elif df.isStreaming:
        bid = F.xxhash64(F.expr("uuid()"))
    else:
        bid = F.monotonically_increasing_id()
    return df.select(
        bid.alias("batch_id"),
        F.lit(0).cast("long").alias("msg_idx"),
        # NULL payloads become the empty message: the reference's
        # Message.data is Vec<u8> (src/lib.rs:38) with no NULL notion,
        # and downstream processors (subprocess framing, regex ops)
        # assume a concrete string
        F.coalesce(F.col(value_col).cast("string"), F.lit("")).alias("value"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )


def refine_idx(parent_idx, position):
    """Order-preserving child index for 1:N fan-out (no shuffle)."""
    return parent_idx * F.lit(STRIDE) + position


def renumber(df: DataFrame) -> DataFrame:
    """Dense 0-based msg_idx per batch (windowed; use only at sinks/tests).

    This is the one place order materialization pays a sort; it is a
    per-batch sort (partitioned by batch_id), so it scales with batch
    size, not table size.
    """
    w = Window.partitionBy("batch_id").orderBy("msg_idx")
    return df.withColumn("msg_idx", F.row_number().over(w).cast("long") - 1)


BATCH_META_PREFIX = "batch."


def with_batch_metadata(df: DataFrame, meta: dict[str, str]) -> DataFrame:
    """Attach batch-level metadata (reference ``MessageBatch.metadata``,
    ``src/lib.rs:33``).

    The reference carries a per-batch map alongside the message vector
    but never writes to it (SURVEY §1.1). The Spark-native encoding
    keeps one schema for the whole pipeline: batch-scoped keys live in
    the per-message ``metadata`` map under the reserved ``batch.``
    prefix. Because every operator preserves ``metadata`` (1:1 ops via
    withColumn, 1:N ops copy it to each child), batch metadata
    survives any operator chain with no schema or operator changes —
    and Parquet/Tungsten dictionary-encode the repeated values, so the
    duplication is ~free at rest and cheap in flight."""
    pairs = [p for k, v in meta.items() for p in (F.lit(BATCH_META_PREFIX + k), F.lit(v))]
    merged = F.map_concat(F.coalesce(F.col("metadata"), F.create_map()), F.create_map(*pairs))
    return df.withColumn("metadata", merged)


def batch_metadata(df: DataFrame) -> DataFrame:
    """Recover the batch-level map: one row per batch_id, with the
    reserved prefix stripped — the read side of
    :func:`with_batch_metadata`. ``first`` per batch is well-defined
    because batch metadata is written batch-wide."""
    batch_keys = F.map_filter(
        F.coalesce(F.col("metadata"), F.create_map()),
        lambda k, _: k.startswith(BATCH_META_PREFIX),
    )
    stripped = F.transform_keys(
        batch_keys, lambda k, _: F.substring(k, len(BATCH_META_PREFIX) + 1, 2**30)
    )
    return (
        df.select("batch_id", stripped.alias("batch_meta"))
        .groupBy("batch_id")
        .agg(F.first("batch_meta").alias("batch_meta"))
    )


def collect_batches(df: DataFrame) -> list[list[str]]:
    """Golden-test helper: materialize as list-of-batches of payloads."""
    rows = df.orderBy("batch_id", "msg_idx").select("batch_id", "value").collect()
    out: dict[int, list[str]] = {}
    for r in rows:
        out.setdefault(r.batch_id, []).append(r.value)
    return [out[k] for k in sorted(out)]
