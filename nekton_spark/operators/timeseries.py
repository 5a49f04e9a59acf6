"""Time-series operators Spark lacks natively: as-of join, range join.

As-of join (match each left row to the most recent right row at or
before its timestamp, per key) has no built-in Spark operator. The
scalable composition — rather than a per-group Pandas ``merge_asof``,
which would move every byte through Python — is the union-window
trick:

    1. tag and union both sides (one shuffle on (key, ts) — the same
       shuffle a sort-merge join would pay),
    2. per key ordered by (ts, side-tag), carry the last right-side
       value forward with ``last(..., ignorenulls=True)``,
    3. keep left rows.

This is a single sort-based window over the union — no skew beyond
the data's own key skew, no Python, and it streams (the window frame
is running, so Spark's window exec never buffers more than a key
group; with bounded gap semantics use a range frame).

Cited reference: none — the reference has no joins at all
(SURVEY §2.4); this is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import register_processor


@register_processor("asof_join")
def asof_join_processor(
    df: DataFrame,
    other: dict,
    on: str = "ts",
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    from .relational import _resolve_other

    return asof_join(df, _resolve_other(df, other), on=on, by=by, right_cols=right_cols)


@register_processor("interval_join")
def interval_join_processor(
    df, other: dict, on: str = "ts", by=None, lower: str = "interval 0 seconds",
    upper: str = "interval 30 minutes", watermark: str | None = None,
):
    from .relational import _resolve_other

    return interval_join(
        df, _resolve_other(df, other), on=on, by=by, lower=lower, upper=upper,
        watermark=watermark,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | str | None = None,
    lower: str = "interval 0 seconds",
    upper: str = "interval 30 minutes",
    watermark: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Join rows whose right timestamp falls in
    ``[left.on - upper, left.on - lower]`` per key — works identically
    on batch and on two watermarked streams (Spark's stream-stream
    join requires exactly this equality + time-range shape; the
    watermark bounds each side's buffered state).
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if watermark:
        from ..streaming.windows import ensure_event_time

        left = ensure_event_time(left, on).withWatermark(on, watermark)
        right = ensure_event_time(right, on).withWatermark(on, watermark)
    r = right
    for c in r.columns:
        if c not in by:
            r = r.withColumnRenamed(c, f"{c}{suffix}")
    ron = f"{on}{suffix}"
    cond = None
    for k in by:
        c = left[k] == r[k]
        cond = c if cond is None else cond & c
    time_cond = (F.col(ron) >= F.expr(f"{on} - {upper}")) & (
        F.col(ron) <= F.expr(f"{on} - {lower}")
    )
    cond = time_cond if cond is None else cond & time_cond
    joined = left.join(r, cond, "inner")
    # drop the duplicated key columns from the right side
    return joined.drop(*[r[k] for k in by])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: values of the latest right row with
    ``right.on <= left.on`` (within the same ``by`` keys), else null.

    ``right_cols`` — right columns to carry (default: all non-key,
    non-ts). Matches DuckDB's ``ASOF LEFT JOIN`` semantics (backward
    direction, inclusive).
    """
    by = [by] if isinstance(by, str) else list(by or [])
    right_cols = right_cols or [c for c in right.columns if c not in {on, *by}]
    left_payload = [c for c in left.columns if c not in {on, *by}]

    # The whole right row travels as ONE struct so that `last(...,
    # ignorenulls=True)` keys on right-row PRESENCE, not on each
    # column's nullness — a matched right row with a NULL payload
    # column must yield NULL for that column, never a stale value
    # from an older right row (DuckDB ASOF LEFT JOIN semantics).
    row_struct = F.struct(
        F.col(on).alias("__on"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    struct_type = (
        right.select(row_struct.alias("__r")).schema["__r"].dataType
    )
    lt = left.select(
        *by,
        F.col(on),
        *[F.col(c) for c in left_payload],
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_type).alias("__r"),
    )
    rt = right.select(
        *by,
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.lit(0).alias("__side"),
        row_struct.alias("__r"),
    )
    merged = lt.unionByName(rt)
    # right rows sort before left rows at equal ts (side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row — the
    # inclusive (<=) asof convention
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("__c", F.last("__r", ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).select(
        *by,
        on,
        *left_payload,
        *[
            F.col("__c")[c].alias(f"{c}{suffix}" if c in left.columns else c)
            for c in right_cols
        ],
        F.col("__c")["__on"].alias(f"{on}{suffix}"),
    )
