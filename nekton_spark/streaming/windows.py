"""Streaming windowed operators (SURVEY §2.4 — absent in the reference).

The reference is stateless record-at-a-time with no watermarks, event
time, or windows; these are the Structured Streaming operators a
complete engine needs. Each helper works on BOTH streaming and batch
DataFrames (Spark's unified model), so the duckdb-oracle checks run
the same code path in batch mode while streaming tests drive them
through readStream → memory sink.

Scale notes: watermark state is per-key-and-window in the state
store; the delay bounds state size. ``dropDuplicatesWithinWatermark``
keeps one entry per key within the delay — the streaming analog of
exact_dedup for 100 TB/day ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from ..registry import register_processor


def ensure_event_time(df: DataFrame, column: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local tz); parquet written with
    naive ``timestamp[us]`` reads back as TIMESTAMP_NTZ under Spark 4's
    default ``inferTimestampNTZ``, which ``withWatermark`` rejects.
    Cast transparently — wall-clock values are unchanged for fixed-offset
    session timezones (the cast reinterprets in the session tz, and every
    consumer of these operators compares within one session). Under a
    DST-observing session tz, nonexistent/ambiguous local times near a
    transition shift, which can perturb window boundaries and interval-join
    matches — pin ``spark.sql.session.timeZone`` to UTC (the engine's
    session factory does) for exact wall-clock preservation."""
    try:
        field = df.schema[column]
    except KeyError:
        return df
    if isinstance(field.dataType, TimestampNTZType):
        return df.withColumn(column, F.col(column).cast("timestamp"))
    return df


@register_processor("watermark")
def with_watermark(df: DataFrame, column: str = "ts", delay: str = "10 minutes") -> DataFrame:
    return ensure_event_time(df, column).withWatermark(column, delay)


@register_processor("tumbling_window")
def tumbling_window(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "5 minutes",
    group_by: list[str] | None = None,
    aggs: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = ensure_event_time(df, ts_col).withWatermark(ts_col, watermark)
    keys = [F.window(ts_col, duration).alias("window"), *(group_by or [])]
    exprs = [F.expr(a) for a in (aggs or ["count(*) as n"])]
    return df.groupBy(*keys).agg(*exprs)


@register_processor("sliding_window")
def sliding_window(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    group_by: list[str] | None = None,
    aggs: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = ensure_event_time(df, ts_col).withWatermark(ts_col, watermark)
    keys = [F.window(ts_col, duration, slide).alias("window"), *(group_by or [])]
    exprs = [F.expr(a) for a in (aggs or ["count(*) as n"])]
    return df.groupBy(*keys).agg(*exprs)


@register_processor("session_window")
def session_window(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    group_by: list[str] | None = None,
    aggs: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Native session windows (dynamic gap-based). In batch mode this
    matches the lag+cumsum sessionization oracle."""
    if watermark:
        df = ensure_event_time(df, ts_col).withWatermark(ts_col, watermark)
    keys = [F.session_window(ts_col, gap).alias("session"), *(group_by or [])]
    exprs = [F.expr(a) for a in (aggs or ["count(*) as n"])]
    return df.groupBy(*keys).agg(*exprs)


@register_processor("dedup_within_watermark")
def dedup_within_watermark(
    df: DataFrame, columns: list[str], ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup with bounded state."""
    if df.isStreaming:
        return (
            ensure_event_time(df, ts_col)
            .withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(columns)
        )
    # batch twin: same NTZ→TIMESTAMP normalization so both modes emit
    # identical schemas (a sink or union downstream sees one type)
    return ensure_event_time(df, ts_col).dropDuplicates(columns)
